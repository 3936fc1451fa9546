package graft.streaming

import graft.Graft
import org.apache.spark.sql.{Column, DataFrame}
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
  * Crash safety: the swap order is tmp-in-place-BEFORE-old-removed
  * (live → `_old_bucket=N`, tmp → live, drop `_old`), and [[recover]] runs
  * at the start of every batch: a leftover `_old` whose live dir vanished
  * is restored, stray `_tmp` roots are dropped, and the checkpoint-replayed
  * batch re-merges idempotently (max_by keeps the same survivor). The
  * underscore prefixes also hide in-flight dirs from parquet discovery, so
  * concurrent readers never see a half-written store. At cluster scale the
  * same foreachBatch body lands on a transactional table format; the merge
  * logic is the part that stays.
  *
  * Reference analogue: the execution queue's tick-drain consuming frames
  * into current state (scheduler.cpp:81-108), upgraded from at-most-once to
  * checkpoint-replayable merges.
  */
object CompactingSink {

  private def bucketOf(keyCols: Seq[String], buckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets))

  /** foreachBatch body: merge `batch` into the compacted store at
    * `storeDir`, keeping the max-`orderCols` row per `keyCols`.
    * `bucket` is a reserved column name in the store. */
  def upsertCompact(storeDir: String, keyCols: Seq[String], orderCols: Seq[String],
                    buckets: Int = 16)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    recover(storeDir)
    val withB = batch.withColumn("bucket", bucketOf(keyCols, buckets))
    // bounded driver metadata: at most `buckets` rows
    val touched = withB.select("bucket").distinct().collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val existingDirs = touched.map(b => s"$storeDir/bucket=$b")
      .filter(p => Files.exists(Paths.get(p)))
    // stored files carry payload columns only; the bucket is re-derived
    // from the keys (same hash), keeping reader schema = writer schema
    val existing =
      if (existingDirs.nonEmpty)
        Some(spark.read.parquet(existingDirs.toIndexedSeq: _*).withColumn("bucket", bucketOf(keyCols, buckets)))
      else None
    val all = existing.map(_.unionByName(withB)).getOrElse(withB)
    val compacted = Graft.compactLatest(all, keyCols, orderCols)
    val tmpRoot = s"$storeDir/_tmp_$batchId"
    compacted.write.mode("overwrite").partitionBy("bucket").parquet(tmpRoot)
    Files.createDirectories(Paths.get(storeDir))
    touched.foreach { b =>
      val live = Paths.get(s"$storeDir/bucket=$b")
      val old = Paths.get(s"$storeDir/_old_bucket=$b")
      val tmp = Paths.get(s"$tmpRoot/bucket=$b")
      if (Files.exists(tmp)) {
        if (Files.exists(live)) Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
        if (Files.exists(old)) deleteRecursively(old)
      }
    }
    deleteRecursively(Paths.get(tmpRoot))
  }

  /** Crash recovery, run before every merge (and safe to call at startup):
    * restore any `_old_bucket=N` whose live dir vanished (crash between the
    * two moves), drop `_old` leftovers whose live dir exists (crash before
    * cleanup), drop incomplete `_tmp_*` write roots (their batch replays
    * from the checkpoint). */
  def recover(storeDir: String): Unit = {
    val root = Paths.get(storeDir)
    if (!Files.isDirectory(root)) return
    val children = {
      val s = Files.list(root)
      try s.iterator().asScala.toList finally s.close()
    }
    children.foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("_old_bucket=")) {
        val live = root.resolve(n.stripPrefix("_old_"))
        if (!Files.exists(live)) Files.move(p, live, StandardCopyOption.ATOMIC_MOVE)
        else deleteRecursively(p)
      } else if (n.startsWith("_tmp_")) deleteRecursively(p)
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
