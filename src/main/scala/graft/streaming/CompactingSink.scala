package graft.streaming

import graft.Graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The north-star composition (BASELINE.json "spark_approach"): a
  * Structured Streaming consumer whose sink maintains a compacted
  * latest-per-key store — each micro-batch merges into the store and
  * re-compacts, so downstream readers always see exactly one row per key.
  *
  * The store is partitioned by key-hash bucket (`bucket=N` subdirs, read
  * back by plain partition discovery), so a micro-batch reads, re-compacts
  * and rewrites ONLY the buckets its keys hash into — at scale the store
  * rewrite cost tracks the batch's key spread, not the store size. All
  * touched buckets are written in one Spark job (partitionBy on the bucket
  * column); the per-bucket directory swap is then pure fs metadata.
  *
  * Bucket GROWTH (extendible hashing): the bucket name encodes its depth —
  * bucket n = 2^d + r (d = floor(log2 n)) holds keys with hash mod 2^d = r.
  * The store starts at `initialDepth` (16 buckets at depth 4) and any
  * bucket whose on-disk size exceeds `maxBucketBytes` after a merge is
  * split into its two depth-(d+1) children (r and r + 2^d). Both children
  * are ALWAYS created, even when one is empty, so the live bucket set
  * remains a prefix-free cover of the key space: every key routes to
  * exactly one live bucket (its unique deepest match), names are never
  * recreated, and a 100 TB store self-scales instead of freezing at the
  * creation-time bucket count. Routing is a pure column expression over
  * the driver-known bucket list (bounded metadata); the cluster-scale
  * landing for that list is a table-format manifest, with this same merge
  * and split logic.
  *
  * Crash safety: merge swaps are tmp-in-place-BEFORE-old-removed
  * (live → `_old_bucket=N`, tmp → live, drop `_old`); splits stage both
  * children under `_split_<n>` before touching the live tree (children in
  * place only after the parent is parked at `_old_bucket=n`). [[recover]]
  * runs at the start of every batch: an interrupted split is rolled back
  * (derived children dropped, parent restored), a leftover `_old` whose
  * live dir vanished is restored, stray staging roots are dropped, and the
  * checkpoint-replayed batch re-merges idempotently (max_by keeps the same
  * survivor). The underscore prefixes also hide in-flight dirs from
  * parquet discovery, so concurrent readers never see a half-written
  * store.
  *
  * Reference analogue: the execution queue's tick-drain consuming frames
  * into current state (scheduler.cpp:81-108), upgraded from at-most-once to
  * checkpoint-replayable merges.
  */
object CompactingSink {

  val DefaultInitialDepth = 4
  /** Local default; a cluster deployment sizes this to its target file
    * size (e.g. 256 MB-1 GB). */
  val DefaultMaxBucketBytes: Long = 64L * 1024 * 1024

  private def depthOf(name: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(name)

  /** Children of bucket n = 2^d + r: depth d+1 names for residues r and
    * r + 2^d. */
  private[streaming] def childrenOf(n: Long): (Long, Long) = {
    val d = depthOf(n)
    val r = n - (1L << d)
    ((2L << d) + r, (2L << d) + r + (1L << d))
  }

  /** Live bucket names (sorted) from the store's directory listing. */
  private[streaming] def liveBuckets(storeDir: String): Seq[Long] = {
    val root = Paths.get(storeDir)
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toLong).toSeq.sorted
    finally s.close()
  }

  /** Routing expression: the key's deepest live bucket match, else its
    * depth-`initialDepth` home. Prefix-free cover => exactly one live
    * match exists for any covered residue; fresh residues land at the
    * initial depth. */
  private[streaming] def bucketOf(keyCols: Seq[String], live: Seq[Long],
                                  initialDepth: Int): Column = {
    val h = xxhash64(keyCols.map(col): _*)
    def candidate(d: Int): Column = pmod(h, lit(1L << d)) + lit(1L << d)
    val deeper = live.map(depthOf).distinct.filter(_ > initialDepth).sorted.reverse
    val d0 = candidate(initialDepth)
    deeper.foldRight(d0) { (d, fallback) =>
      val names = live.filter(depthOf(_) == d)
      when(candidate(d).isin(names: _*), candidate(d)).otherwise(fallback)
    }
  }

  /** True if the directory holds at least one visible data file. Empty
    * child buckets are live for ROUTING but must be excluded from reads
    * (spark.read.parquet cannot infer a schema from an empty dir). */
  private def hasDataFiles(p: Path): Boolean = {
    if (!Files.isDirectory(p)) return false
    val s = Files.walk(p)
    try s.iterator().asScala.exists(f =>
      Files.isRegularFile(f) && {
        val n = f.getFileName.toString
        !n.startsWith(".") && !n.startsWith("_")
      })
    finally s.close()
  }

  private def dirBytes(p: Path): Long = {
    if (!Files.isDirectory(p)) return 0L
    val s = Files.walk(p)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size(_)).sum
    finally s.close()
  }

  /** foreachBatch body: merge `batch` into the compacted store at
    * `storeDir`, keeping the max-`orderCols` row per `keyCols`, then split
    * any touched bucket that outgrew `maxBucketBytes`. `bucket` is a
    * reserved column name in the store. */
  def upsertCompact(storeDir: String, keyCols: Seq[String], orderCols: Seq[String],
                    initialDepth: Int = DefaultInitialDepth,
                    maxBucketBytes: Long = DefaultMaxBucketBytes)
                   (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    recover(storeDir)
    val live = liveBuckets(storeDir)
    val withB = batch.withColumn("bucket", bucketOf(keyCols, live, initialDepth))
    // bounded driver metadata: at most |live buckets| + 2^initialDepth rows
    val touched = withB.select("bucket").distinct().collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val existingDirs = touched.map(b => s"$storeDir/bucket=$b")
      .filter(p => hasDataFiles(Paths.get(p)))
    // stored files carry payload columns only; the bucket is re-derived
    // from the keys (same hash, same live set), keeping reader schema =
    // writer schema
    val existing =
      if (existingDirs.nonEmpty)
        Some(spark.read.parquet(existingDirs.toIndexedSeq: _*)
          .withColumn("bucket", bucketOf(keyCols, live, initialDepth)))
      else None
    val all = existing.map(_.unionByName(withB)).getOrElse(withB)
    val compacted = Graft.compactLatest(all, keyCols, orderCols)
    val tmpRoot = s"$storeDir/_tmp_$batchId"
    compacted.write.mode("overwrite").partitionBy("bucket").parquet(tmpRoot)
    Files.createDirectories(Paths.get(storeDir))
    touched.foreach { b =>
      val liveDir = Paths.get(s"$storeDir/bucket=$b")
      val old = Paths.get(s"$storeDir/_old_bucket=$b")
      val tmp = Paths.get(s"$tmpRoot/bucket=$b")
      if (Files.exists(tmp)) {
        if (Files.exists(liveDir)) Files.move(liveDir, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, liveDir, StandardCopyOption.ATOMIC_MOVE)
        if (Files.exists(old)) deleteRecursively(old)
      }
    }
    deleteRecursively(Paths.get(tmpRoot))
    // growth: only the touched buckets can have grown
    touched.foreach { b =>
      if (dirBytes(Paths.get(s"$storeDir/bucket=$b")) > maxBucketBytes)
        splitBucket(spark, storeDir, keyCols, b)
    }
  }

  /** Split bucket n into its two children. Staged under `_split_<n>` so an
    * interruption at any point either leaves the parent live (staging
    * dropped) or is rolled back by [[recover]] (derived children dropped,
    * parent restored); the split then simply retries after a later batch. */
  private def splitBucket(spark: SparkSession, storeDir: String,
                          keyCols: Seq[String], n: Long): Unit = {
    val d1 = depthOf(n) + 1
    val (c1, c2) = childrenOf(n)
    val splitRoot = Paths.get(s"$storeDir/_split_$n")
    val parent = Paths.get(s"$storeDir/bucket=$n")
    if (!hasDataFiles(parent)) return
    val df = spark.read.parquet(parent.toString)
      .withColumn("bucket", pmod(xxhash64(keyCols.map(col): _*), lit(1L << d1)) + lit(1L << d1))
    df.write.mode("overwrite").partitionBy("bucket").parquet(splitRoot.toString)
    // both children must exist — the live set stays a prefix-free cover
    Seq(c1, c2).foreach(c => Files.createDirectories(splitRoot.resolve(s"bucket=$c")))
    val old = Paths.get(s"$storeDir/_old_bucket=$n")
    Files.move(parent, old, StandardCopyOption.ATOMIC_MOVE)
    Seq(c1, c2).foreach { c =>
      Files.move(splitRoot.resolve(s"bucket=$c"),
        Paths.get(s"$storeDir/bucket=$c"), StandardCopyOption.ATOMIC_MOVE)
    }
    deleteRecursively(old)
    deleteRecursively(splitRoot)
  }

  // ---------- snapshot log: time travel + snapshot-isolated reads ----------

  /** Record the store's current live contents as immutable snapshot
    * `v<version>` under `_snapshots/`. Local stand-in for a table format's
    * manifest: instead of listing file paths in a metadata file, the
    * snapshot HARDLINKS every live data file into a versioned dir — zero
    * data copy, and the links keep the bytes alive after later merges
    * delete the live dirs' own links. Crash-safe the same way as merges:
    * staged under `_snapshots/_staging_v<n>`, atomic-renamed into place,
    * leftovers dropped by [[recover]]. Idempotent per version (a
    * checkpoint-replayed batch re-snapshots the identical compacted state,
    * so the existing snapshot stands). At cluster scale this becomes a
    * manifest JSON naming immutable object-store files — same commit
    * protocol (stage, then one atomic rename), no hardlinks needed because
    * data files there are never deleted in place, only unreferenced. */
  def snapshot(storeDir: String, version: Long): Unit = {
    val root = Paths.get(storeDir)
    val snapRoot = root.resolve("_snapshots")
    Files.createDirectories(snapRoot)
    val target = snapRoot.resolve(s"v$version")
    if (Files.exists(target)) return
    val staging = snapRoot.resolve(s"_staging_v$version")
    deleteRecursively(staging)
    liveBuckets(storeDir).foreach { b =>
      val src = root.resolve(s"bucket=$b")
      if (hasDataFiles(src)) {
        val dst = staging.resolve(s"bucket=$b")
        Files.createDirectories(dst)
        val s = Files.list(src)
        try s.iterator().asScala.foreach { f =>
          val n = f.getFileName.toString
          if (Files.isRegularFile(f) && !n.startsWith(".") && !n.startsWith("_"))
            Files.createLink(dst.resolve(n), f)
        } finally s.close()
      }
    }
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Committed snapshot versions, ascending. */
  def snapshotVersions(storeDir: String): Seq[Long] = {
    val snapRoot = Paths.get(storeDir).resolve("_snapshots")
    if (!Files.isDirectory(snapRoot)) return Seq.empty
    val s = Files.list(snapRoot)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && !n.startsWith("_"))
      .map(_.stripPrefix("v").toLong).toSeq.sorted
    finally s.close()
  }

  /** Time-travel read: the store exactly as of snapshot `version`. The
    * returned frame is stable under any amount of subsequent store
    * mutation (snapshot files are immutable link targets). */
  def readSnapshot(spark: SparkSession, storeDir: String, version: Long): DataFrame =
    spark.read.parquet(s"$storeDir/_snapshots/v$version")

  /** Retention: drop all but the newest `keepLast` snapshots. */
  def expireSnapshots(storeDir: String, keepLast: Int): Unit =
    snapshotVersions(storeDir).dropRight(keepLast).foreach { v =>
      deleteRecursively(Paths.get(storeDir).resolve("_snapshots").resolve(s"v$v"))
    }

  /** Crash recovery, run before every merge (and safe to call at startup):
    * roll back interrupted splits (children derived from a parked parent
    * are dropped, the parent restored), restore any `_old_bucket=N` whose
    * live dir vanished (crash between the two merge moves), drop `_old`
    * leftovers whose live dir exists (crash before cleanup), and drop
    * incomplete `_tmp_*` / `_split_*` staging roots (their batch replays
    * from the checkpoint, the split retries on a later batch). */
  def recover(storeDir: String): Unit = {
    val root = Paths.get(storeDir)
    if (!Files.isDirectory(root)) return
    def children(): List[Path] = {
      val s = Files.list(root)
      try s.iterator().asScala.toList finally s.close()
    }
    // 1. interrupted splits: _split_<n> still present
    children().foreach { p =>
      val nm = p.getFileName.toString
      if (nm.startsWith("_split_")) {
        val n = nm.stripPrefix("_split_").toLong
        val old = root.resolve(s"_old_bucket=$n")
        if (Files.exists(old)) {
          // parent was parked: any live children were derived from it
          // (names are never recreated while the parent exists) — drop
          // them and restore the parent
          val (c1, c2) = childrenOf(n)
          Seq(c1, c2).foreach(c => deleteRecursively(root.resolve(s"bucket=$c")))
          Files.move(old, root.resolve(s"bucket=$n"), StandardCopyOption.ATOMIC_MOVE)
        }
        deleteRecursively(p)
      }
    }
    // 2. merge leftovers
    children().foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("_old_bucket=")) {
        val live = root.resolve(n.stripPrefix("_old_"))
        if (!Files.exists(live)) Files.move(p, live, StandardCopyOption.ATOMIC_MOVE)
        else deleteRecursively(p)
      } else if (n.startsWith("_tmp_")) deleteRecursively(p)
    }
    // 3. interrupted snapshot staging (committed v* dirs are immutable)
    val snapRoot = root.resolve("_snapshots")
    if (Files.isDirectory(snapRoot)) {
      val s = Files.list(snapRoot)
      try s.iterator().asScala.toList.foreach { p =>
        if (p.getFileName.toString.startsWith("_staging_")) deleteRecursively(p)
      } finally s.close()
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toList.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
