package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table metadata persisted next to the data: declared schema, the key
  * columns row-level operations identify rows by, the fixed hash-bucket
  * fan-out the copy-on-write rewrite is scoped to, and the tombstoned
  * PHYSICAL column names retired by DROP COLUMN (so a later ADD COLUMN
  * with the same logical name gets a fresh physical name instead of
  * resurrecting dropped data).
  *
  * Column-mapping discipline (Delta/Iceberg-style, by name not id): every
  * field's PHYSICAL name — what parquet files store — is fixed at
  * ADD/CREATE time and never changes; RENAME COLUMN rewrites only the
  * logical name in this meta, recording the physical one in the field's
  * metadata under [[GraftStore.PhysicalKey]]. A 100 TB rename is therefore
  * a metadata write, with every read path mapping physical↔logical. */
final case class GraftTableMeta(schema: StructType, keyCols: Seq[String],
    buckets: Int, tombstones: Seq[String] = Nil, mergeMode: String = "cow",
    checks: Seq[(String, String)] = Nil,
    /** `PARTITIONED BY` transform: (fn ∈ identity|years|months|days|hours,
      * source column's PHYSICAL name). Partition dirs sit ABOVE the bucket
      * fan-out (`gpart=<ordinal>/gbucket=<k>`), composing date-grained
      * retention and coarse pruning with key-hash bucketing. Physical
      * name so RENAME COLUMN stays metadata-only. */
    partition: Option[(String, String)] = None,
    /** `bloom_filter_columns` (PHYSICAL names): every commit writes its
      * parquet files with per-column bloom filters for these, so `=`/IN
      * predicates skip row groups the stock reader proves key-absent —
      * the scan-narrowing lever for HIGH-CARDINALITY NON-KEY columns that
      * zone maps can't help (scattered values make min/max spans useless)
      * and bucket pruning doesn't cover (not the merge key). Applies to
      * files written AFTER the property is set; OPTIMIZE retrofits the
      * rewritten slots. Physical names so RENAME stays metadata-only. */
    bloomCols: Seq[String] = Nil,
    /** `auto_optimize` table property: when > 0, every DML commit that
      * leaves one of ITS OWN slots above this many files triggers the
      * slot-scoped compaction inline (only over-cap slots rewrite — cold
      * slots are never touched). 0 = off. The closed loop for the
      * maintenance_report fragmentation signal: hot append streams stay
      * compacted without an external scheduler. */
    autoOptimize: Int = 0)

/** Versioned, hash-bucketed, copy-on-write parquet store backing the
  * [[GraftCatalog]] SQL DML surface (SURVEY §2.2 S9's `MERGE INTO` /
  * `UPDATE` / `DELETE` as SQL text — the reference's closest analogue is
  * the compacted key-value store its scheduler persists between ticks,
  * /root/reference/module/internal/misc/server/server.cpp:18-111, which
  * only ever sees whole-value upserts; SQL row-level DML is the missing
  * write surface this store adds).
  *
  * Layout (all hidden names start with `_` so file-listing scans and
  * partition discovery never see them):
  * {{{
  *   <dir>/_meta.json            schema + key columns + bucket count
  *   <dir>/_current              atomic pointer: current version number
  *   <dir>/v0000000007/          one immutable directory per version:
  *     _bucketmap                  bucket → owner versions (the manifest)
  *     gbucket=<k>/part-*.parquet  ONLY the files THIS commit wrote
  *   <dir>/_staging/<queryId>/   delta-write staging frames
  * }}}
  *
  * Commit = copy-on-write at BUCKET granularity: a change batch only
  * rewrites the buckets its keys hash into. Untouched buckets carry by
  * MANIFEST REFERENCE — the new version's `_bucketmap` names, per bucket,
  * the versions whose dirs physically hold its live files — so commit
  * metadata costs O(changed files + buckets), never O(table files) (the
  * pre-r12 layout hard-linked every untouched file forward; at ~1M files
  * that driver-side pass was the commit bottleneck). A data file lives
  * forever in the version dir that wrote it, which is also what makes its
  * write-version derivable from its path. The version pointer flips last
  * with an atomic rename, so readers resolve a complete version or the
  * previous one, never a half-written directory.
  *
  * Scale shape: the rewrite job is `base buckets ⟕anti changes ∪ changes`
  * — one shuffle join keyed on the merge key, partitioned output, nothing
  * collected (the only driver-side materialization is the set of touched
  * bucket ids, ≤ `buckets` ints). At 100 TB you raise `buckets` so a
  * bucket is a few GB and a merge touching 1% of keys rewrites ~1% of
  * files — and the commit's metadata write stays a few KB regardless.
  *
  * Multi-writer safety: every version commit first CLAIMS its version
  * number with a create-exclusive `_commit-N` marker and re-verifies the
  * pointer under the claim (see [[claimCommit]]) — concurrent writers
  * serialize per version instead of last-writer-wins clobbering. Losing
  * appends retry on the recomputed version (appends commute); losing
  * row-level deltas fail with a clean ConcurrentModificationException
  * (their read snapshot is stale — serializable behavior, re-run the
  * statement). */
object GraftStore {
  /** Reserved partition-column name for the bucket id. Must NOT start with
    * `_` or `.`: Hadoop's hidden-file filter would skip `_bucket=3`
    * directories during partition discovery and the table would read
    * empty. */
  val BucketCol = "gbucket"
  val OpCol = "_op"
  /** Changelog column names (no leading `_`: they become partition-dir /
    * data columns of the changes table and must survive file listing). */
  val ChangeOpCol = "change_op"
  val ChangeVersionCol = "change_version"
  /** Debezium-shaped pre-image: the replaced/deleted row as a struct
    * (null for inserts). Flat columns are the AFTER image. */
  val ChangeBeforeCol = "change_before"

  /** StructField metadata key holding a column's physical (file) name when
    * it differs from the logical name — set by RENAME COLUMN. */
  val PhysicalKey = "graft.physical"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** logical→physical name map; identity entries included. */
  def logToPhys(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  def hasRenames(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** The schema as stored in parquet files: physical field names. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f))).toSeq)

  /** Rename a logical-named DataFrame's columns to physical for writing.
    * Only columns present in `schema` are renamed; others (op/bucket
    * bookkeeping) pass through. */
  private def toPhysical(df: DataFrame, schema: StructType): DataFrame = {
    val m = logToPhys(schema)
    df.select(df.columns.toIndexedSeq.map(c => col(c).as(m.getOrElse(c, c))): _*)
  }

  /** Rename a physical-named DataFrame back to logical after reading. */
  private def toLogical(df: DataFrame, schema: StructType): DataFrame = {
    val m = logToPhys(schema).map(_.swap)
    df.select(df.columns.toIndexedSeq.map(c => col(c).as(m.getOrElse(c, c))): _*)
  }

  /** Driver-side pool for a commit's two independent write legs (daemon
    * threads; Spark handles concurrent job submission). */
  private lazy val commitPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-commit-leg")
        t.setDaemon(true)
        t
      }))

  private def metaPath(dir: String): Path = Paths.get(dir, "_meta.json")
  private def pointerPath(dir: String): Path = Paths.get(dir, "_current")
  def versionDir(dir: String, v: Long): String = f"$dir/v$v%010d"
  def stagingDir(dir: String, id: String): String = s"$dir/_staging/$id"

  /** Run `f` over a directory listing, CLOSING the stream (java.nio
    * directory streams hold an open FD until closed — a long-lived session
    * committing per micro-batch would otherwise accumulate FDs). */
  private[sources] def listDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }

  def exists(dir: String): Boolean = Files.exists(metaPath(dir))

  /** Serialize read-modify-write cycles on `_meta.json` (ALTER TABLE):
    * without this, two concurrent ALTERs both fold over the same base meta
    * and the last writeMeta silently drops the other's DDL (worst case a
    * lost DROP tombstone lets a later ADD resurrect dropped data). ALTERs
    * are milliseconds, so the stale-break window is short. */
  // re-entrancy: readMeta's backup recovery can run while THIS thread
  // already holds the lock (alterTable reads meta under it) — re-acquiring
  // our own lock would spin against ourselves
  private val metaLockHeld = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  private[sources] def withMetaLock[A](dir: String,
      staleMs: Long = 60000L)(f: => A): A = {
    if (metaLockHeld.get.contains(dir)) return f
    val lock = Paths.get(dir, "_meta_lock")
    // ownership token (same discipline as claimCommit): release only
    // deletes the lock if it still holds OUR token, and a stale lock is
    // broken by ATOMIC RENAME to a tomb — never delete+create, whose
    // non-atomic window lets two racing breakers each think they created a
    // fresh lock (one of them would then delete the NEW holder's lock and
    // two ALTERs could fold over the same base meta, silently losing DDL).
    val token = java.util.UUID.randomUUID().toString
    var attempt = 0
    while (attempt < 600) {
      val acquired =
        try { Files.write(lock, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val age = try System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
            if (age > staleMs && age != Long.MaxValue) {
              // exactly one breaker wins the rename; losers see
              // NoSuchFileException and just retry the create
              val tomb = Paths.get(s"$lock.stale-${System.nanoTime()}")
              try {
                Files.move(lock, tomb, StandardCopyOption.ATOMIC_MOVE)
                Files.deleteIfExists(tomb)
              } catch { case _: java.nio.file.NoSuchFileException => () }
            }
            false
        }
      if (acquired) {
        metaLockHeld.set(metaLockHeld.get + dir)
        try return f
        finally {
          metaLockHeld.set(metaLockHeld.get - dir)
          // token check: after a stale takeover, the ORIGINAL holder's
          // release must not remove the successor's lock
          try {
            if (new String(Files.readAllBytes(lock), "UTF-8") == token)
              Files.deleteIfExists(lock)
          } catch { case _: java.io.IOException => () }
        }
      }
      attempt += 1
      Thread.sleep(10)
    }
    throw new java.util.ConcurrentModificationException(
      s"meta lock busy for $dir")
  }

  // -------------------------------------------------- slot-owner manifest
  //
  // Commit metadata is O(changed files + slots), never O(table files): a
  // version dir physically holds ONLY the files its commit wrote, plus a
  // `_bucketmap` manifest naming, per SLOT, the versions whose dirs hold
  // that slot's live files (its OWNERS, ascending — the version of a
  // file's enclosing dir is by construction the version that wrote it).
  // A slot is one leaf data directory of the layout: `gbucket=<k>` for an
  // unpartitioned table, `gpart=<ordinal>/gbucket=<k>` for a PARTITIONED
  // BY table (partition above bucket — the standard fact-table layout, so
  // date-grained retention and coarse pruning compose with the key-hash
  // fan-out). Untouched slots are carried by rewriting one manifest line,
  // not by re-linking every file the way pre-r12 commits did — at 100 TB /
  // ~1M files the per-commit hard-link pass was the store's last O(table)
  // driver-side cost. Readers resolve a snapshot to (slot → owner dirs)
  // and scan those paths directly; expireVersions keeps an old version
  // dir's referenced slots alive (marked `_expired`, excluded from the
  // version listing) until no retained snapshot references them.

  val BucketMapName = "_bucketmap"

  /** Partition-ordinal directory name (above [[BucketCol]]). Like the
    * bucket column it must NOT start with `_`/`.` (partition discovery
    * would hide it). */
  val PartCol = "gpart"

  /** Bucket id of a slot (`[gpart=<v>/]gbucket=<k>` → k). */
  def slotBucket(slot: String): Int =
    slot.substring(slot.lastIndexOf('=') + 1).toInt

  /** Partition-ordinal STRING of a slot, if partitioned
    * (`gpart=<v>/gbucket=<k>` → v). */
  def slotPart(slot: String): Option[String] = {
    val i = slot.indexOf('/')
    if (i < 0) None else Some(slot.substring(PartCol.length + 1, i))
  }

  /** Write-side partition-ordinal expression (over PHYSICAL column names;
    * evaluate AFTER toPhysical). Ordinals are monotone in the source
    * column so range predicates prune partitions: identity = the value;
    * years = calendar year; months = year*12+month-1; days = days since
    * epoch; hours = hours since epoch. SESSION-TIMEZONE-INDEPENDENT by
    * construction — TIMESTAMP ordinals come from `unix_micros` (UTC
    * instants) with the calendar read via `date_from_unix_date`, and
    * DATE/TIMESTAMP_NTZ ordinals are wall-clock functions that never
    * consult the zone — so the scan-side literal derivation
    * (GraftPartDerivation, fixed UTC/wall math) always agrees with what
    * was written, no matter what zone an embedding session runs under. */
  def partitionExpr(meta: GraftTableMeta): Option[Column] =
    partitionExprFor(meta, meta.partition)

  /** [[partitionExpr]] under an EXPLICIT spec — writers derive the spec
    * from the layout they commit into ([[layoutPartSpec]]), so a
    * `set_partition_spec` change re-grains NEW commits while old owner
    * dirs keep the ordinals they were written with. */
  def partitionExprFor(meta: GraftTableMeta,
      spec: Option[(String, String)]): Option[Column] =
    spec.map { case (fn, physCol) =>
      val c = col(physCol)
      // exact floorDiv in long arithmetic ((x - pmod) is divisible, so the
      // double division is exact at ordinal magnitudes)
      def fdiv(x: Column, n: Long): Column =
        ((x - pmod(x, lit(n))) / lit(n)).cast(IntegerType)
      val isTs = meta.schema.fields
        .find(f => physicalName(f) == physCol)
        .exists(_.dataType == TimestampType)
      // wall-clock date for DATE (identity cast) and TIMESTAMP_NTZ
      // (tz-free cast); UTC date for TIMESTAMP (via unix_micros)
      def utcDays: Column = fdiv(unix_micros(c), 86400000000L)
      def calDate: Column =
        if (isTs) date_from_unix_date(utcDays) else c.cast(DateType)
      def days: Column =
        if (isTs) utcDays
        else datediff(c.cast(DateType), lit("1970-01-01").cast(DateType))
      fn match {
        case "identity" => c
        case "years" => year(calDate)
        case "months" => (year(calDate) * 12 + month(calDate) - 1)
        case "days" => days
        case "hours" =>
          if (isTs) fdiv(unix_micros(c), 3600000000L)
          else (days * 24 + hour(c)).cast(IntegerType)
        case other => throw new IllegalArgumentException(
          s"unknown partition transform: $other")
      }
    }

  /** Stamp the partition-ordinal column onto a PHYSICAL-named frame (no-op
    * for unpartitioned tables), under the LAYOUT's spec. */
  private def withPartCol(df: DataFrame, meta: GraftTableMeta,
      spec: Option[(String, String)]): DataFrame =
    partitionExprFor(meta, spec).map(e => df.withColumn(PartCol, e))
      .getOrElse(df)

  /** The layout's partition directory columns, innermost last. */
  private def layoutCols(meta: GraftTableMeta): Seq[String] =
    if (meta.partition.isDefined) Seq(PartCol, BucketCol) else Seq(BucketCol)

  /** Parquet writer options enabling per-column bloom filters for the
    * table's declared `bloom_filter_columns` — applied by every data-file
    * write (commit legs, OPTIMIZE, rebucket), consumed automatically by
    * the stock vectorized reader's row-group filtering on `=`/IN
    * predicates. Physical column names match what files store. */
  private def bloomOptions(meta: GraftTableMeta): Map[String, String] =
    meta.bloomCols
      .map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap

  private[sources] def writeBucketMap(buildDir: String,
      map: Map[String, Seq[Long]]): Unit = {
    val sb = new StringBuilder
    map.toSeq.sortBy(_._1).foreach { case (slot, vs) =>
      if (vs.nonEmpty)
        sb.append(slot).append('\t').append(vs.mkString(",")).append('\n')
    }
    Files.write(Paths.get(buildDir, BucketMapName),
      sb.toString.getBytes("UTF-8"))
  }

  /** Slots PHYSICALLY present in a version/build dir (its own files only):
    * `gbucket=k` entries plus `gpart=v/gbucket=k` one level down. */
  private[sources] def localSlots(vdir: String): Seq[String] = {
    val p = Paths.get(vdir)
    if (!Files.isDirectory(p)) return Seq.empty
    listDir(p)(_.flatMap { e =>
      val n = e.getFileName.toString
      if (n.startsWith(s"$BucketCol=")) Seq(n)
      else if (n.startsWith(s"$PartCol=") && Files.isDirectory(e))
        listDir(e)(_.map(_.getFileName.toString)
          .filter(_.startsWith(s"$BucketCol=")).map(b => s"$n/$b").toSeq)
      else Seq.empty
    }.toSeq)
  }

  /** Per-slot owner versions of version `v` (ascending). Versions
    * predating the manifest format are self-contained (hard-linked), so
    * the fallback is the physical listing owning itself. */
  def ownersOf(dir: String, v: Long): Map[String, Seq[Long]] = {
    val p = Paths.get(versionDir(dir, v), BucketMapName)
    if (!Files.exists(p))
      return localSlots(versionDir(dir, v)).map(s => s -> Seq(v)).toMap
    Files.readAllLines(p, java.nio.charset.StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).flatMap { line =>
        line.split('\t') match {
          case Array(slot, vs) =>
            try Some(slot -> vs.split(',').map(_.toLong).toSeq)
            catch { case _: Exception => None }
          case _ => None
        }
      }.toMap
  }

  /** Physical slot directories of a snapshot: slot → the owner versions'
    * dirs (existing ones only), optionally restricted to a bucket set —
    * the resolution every read path plans from. */
  def resolvedSlotDirs(dir: String, v: Long,
      buckets: Option[Set[Int]] = None): Seq[(String, Seq[String])] =
    ownersOf(dir, v).toSeq
      .filter { case (s, _) => buckets.forall(_.contains(slotBucket(s))) }
      .sortBy(_._1)
      .map { case (s, os) =>
        s -> os.map(o => s"${versionDir(dir, o)}/$s")
          .filter(d => Files.isDirectory(Paths.get(d)))
      }
      .filter(_._2.nonEmpty)

  /** Data files of one physical slot dir (no recursion — slot dirs hold
    * only files). */
  private[sources] def listBucketFiles(slotDir: String): Seq[Path] =
    listDir(Paths.get(slotDir))(_.filter { f =>
      val n = f.getFileName.toString
      Files.isRegularFile(f) && !n.startsWith(".") && !n.startsWith("_")
    }.toSeq)

  /** ABSOLUTE paths of every live data file of a snapshot, resolved
    * through the slot manifest (spanning owner version dirs). */
  def snapshotFiles(dir: String, v: Long): Seq[String] =
    resolvedSlotDirs(dir, v).flatMap { case (_, ds) =>
      ds.flatMap(d => listBucketFiles(d).map(_.toString))
    }

  /** Per-bucket live data-file count of a snapshot (summed over a
    * partitioned bucket's slots). */
  def bucketFileCounts(dir: String, v: Long): Map[Int, Int] =
    resolvedSlotDirs(dir, v)
      .groupBy { case (s, _) => slotBucket(s) }
      .map { case (b, entries) =>
        b -> entries.flatMap(_._2).map(d => listBucketFiles(d).size).sum
      }

  /** Per-SLOT live data-file count of a snapshot — the fragmentation
    * signal [[optimize]] acts on. Slot-scoped on purpose: on a partitioned
    * table a per-BUCKET count sums across every partition, so a long
    * date-partitioned table with one healthy file per day-slot would read
    * as permanently fragmented and compaction would rewrite whole buckets
    * across all history instead of just the hot slots. */
  def slotFileCounts(dir: String, v: Long): Map[String, Int] =
    resolvedSlotDirs(dir, v).map { case (s, ds) =>
      s -> ds.map(d => listBucketFiles(d).size).sum
    }.toMap

  /** Merged per-file write-version map of a snapshot: each owner dir's
    * local `_fileseq` (rel → version), rel paths being identical relative
    * to whichever version dir physically holds the file — exactly how the
    * scan extracts them from file paths. */
  def resolvedFileSeq(dir: String, v: Long): Map[String, Long] = {
    val owners = ownersOf(dir, v).values.flatten.toSet + v
    owners.toSeq.sorted.foldLeft(Map.empty[String, Long])(
      (acc, o) => acc ++ readFileSeq(versionDir(dir, o)))
  }

  /** One live file of a snapshot, with its zone-map manifest entry (from
    * the owning version dir) when one exists. `size` is -1 when the owner
    * manifest predates the size column AND the physical stat failed. */
  final case class SnapshotFile(slot: String, rel: String, path: String,
      size: Long, stats: Option[GraftStats.FileStats]) {
    def rowCount: Option[Long] =
      stats.flatMap(_.values.map(_.rowCount).filter(_ >= 0).headOption)
  }

  // published version dirs are immutable, so the resolved (file, stats)
  // view of a snapshot caches per version dir — the planner may ask for
  // statistics several times per query and must not pay the O(live files)
  // metadata walk each time (same discipline as dvProbeCache)
  private val snapshotFilesCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[SnapshotFile]]()

  /** Every live data file of snapshot (`dir`, `v`) with its stats entry —
    * ONE resolution walk, cached per immutable version dir; the shared
    * backbone of row counting, match estimation and manifest merging. */
  def snapshotFileEntries(dir: String, v: Long): Seq[SnapshotFile] = {
    val key = versionDir(dir, v)
    val cached = snapshotFilesCache.get(key)
    if (cached != null) return cached
    val epoch0 = cacheEpoch.get()
    val manifests = scala.collection.mutable.Map
      .empty[String, Map[String, GraftStats.FileStats]]
    // per-owner fileseq entries grouped by slot: the manifest, not a
    // filesystem listing, is the source of the snapshot's file set — at
    // ~1M files / thousands of slots the per-slot dir listings were the
    // dominant PLAN-time cost, and a manifest row already carries the
    // size the scan needs for split planning
    val bySlot = scala.collection.mutable.Map
      .empty[String, Map[String, Seq[(String, Long)]]]
    def ownerSlots(od: String): Map[String, Seq[(String, Long)]] =
      bySlot.getOrElseUpdate(od,
        readFileSeqFull(od).toSeq.collect {
          case (rel, (_, bytes)) if rel.lastIndexOf('/') > 0 =>
            (rel.substring(0, rel.lastIndexOf('/')), rel, bytes)
        }.groupBy(_._1).map { case (s, es) =>
          s -> es.map(e => (e._2, e._3))
        })
    val computed: Seq[SnapshotFile] = for {
      (slot, ds) <- resolvedSlotDirs(dir, v)
      d <- ds
      od = ownerDirOf(d, slot)
      man = manifests.getOrElseUpdate(od, GraftStats.readManifest(od))
      fromSeq = ownerSlots(od).getOrElse(slot, Seq.empty)
      entry <- if (fromSeq.nonEmpty && fromSeq.forall(_._2 >= 0))
        fromSeq.map { case (rel, bytes) =>
          SnapshotFile(slot, rel, s"$od/$rel", bytes, man.get(rel))
        }
      else
        // fallback for owners predating the size column: one listing
        listBucketFiles(d).map { f =>
          val rel = s"$slot/${f.getFileName}"
          val sz = try Files.size(f) catch { case _: Exception => -1L }
          SnapshotFile(slot, rel, f.toString, sz, man.get(rel))
        }
    } yield entry
    if (snapshotFilesCache.size > 64) snapshotFilesCache.clear()
    if (cacheEpoch.get() == epoch0) snapshotFilesCache.put(key, computed)
    computed
  }

  /** Upper bound on the rows of a snapshot that can match `conjuncts`
    * (physical-named pushed filters): the sum of rowCounts over files the
    * zone maps cannot prove empty — the planner-facing twin of the scan's
    * file skipping, exact when pruning is decisive. None when any
    * surviving file lacks stats. */
  def estimatedMatchingRows(dir: String, v: Long,
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Long] = {
    val perFile = snapshotFileEntries(dir, v)
      .filter(e => e.stats.forall(GraftStats.mayContain(conjuncts, _)))
      .map(_.rowCount)
    if (perFile.exists(_.isEmpty)) None else Some(perFile.flatten.sum)
  }

  /** Exact live-row count of a snapshot from the owner dirs' zone-map
    * manifests — None when any resolved file lacks a footer rowCount. The
    * caller gates on live delete slices separately. */
  def snapshotRowCount(dir: String, v: Long): Option[Long] = {
    val perFile = snapshotFileEntries(dir, v).map(_.rowCount)
    if (perFile.exists(_.isEmpty)) None else Some(perFile.flatten.sum)
  }

  /** The version dir that owns slot dir `d` (strips the slot's one or two
    * path segments). */
  private def ownerDirOf(d: String, slot: String): String =
    d.stripSuffix(s"/$slot")

  /** Owner VERSION NUMBER of a slot dir. */
  private def ownerVersionOf(d: String, slot: String): Long =
    Paths.get(ownerDirOf(d, slot)).getFileName.toString.drop(1).toLong

  /** Hard-link EVERY live file of snapshot (`srcDir`, `srcV`) into
    * `buildDir`, flattening multi-owner slots into self-contained slot
    * dirs — the cross-table materialization clone/RTAS need (their source
    * dirs get dropped or evolve independently, so manifest references
    * would dangle). Returns rel → write version for the linked files so
    * the caller can persist seqs that keep delete ordering meaningful. */
  private def materializeInto(srcDir: String, srcV: Long,
      buildDir: String): Map[String, Long] = {
    val seq = resolvedFileSeq(srcDir, srcV)
    val out = Map.newBuilder[String, Long]
    resolvedSlotDirs(srcDir, srcV).foreach { case (slot, ds) =>
      val dst = Paths.get(buildDir, slot)
      Files.createDirectories(dst)
      ds.foreach { d =>
        val ownerV = ownerVersionOf(d, slot)
        listBucketFiles(d).foreach { f =>
          Files.createLink(dst.resolve(f.getFileName), f)
          val rel = s"$slot/${f.getFileName}"
          out += rel -> seq.getOrElse(rel, ownerV)
        }
      }
    }
    out.result()
  }

  def writeMeta(dir: String, meta: GraftTableMeta): Unit = {
    Files.createDirectories(Paths.get(dir))
    // schema via StructType.json (public, round-trips NOT NULL); keys and
    // bucket count as adjacent lines — no JSON library needed to parse.
    // Staged + atomic rename (same discipline as the version pointer): a
    // crash mid-ALTER must not truncate the meta of a live table.
    // CHECK constraints: one URL-encoded name=sql pair per comma slot —
    // predicate SQL may contain commas/newlines, encoding keeps the
    // line-oriented meta format intact
    val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
    val body = meta.schema.json + "\n" + meta.keyCols.mkString(",") + "\n" +
      meta.buckets + "\n" + meta.tombstones.mkString(",") + "\n" +
      meta.mergeMode + "\n" +
      meta.checks.map { case (n, s) => s"${enc(n)}=${enc(s)}" }.mkString(",") +
      "\n" + meta.partition.map { case (fn, c) => s"$fn:${enc(c)}" }.getOrElse("") +
      "\n" + meta.bloomCols.map(enc).mkString(",") +
      "\n" + (if (meta.autoOptimize > 0) meta.autoOptimize.toString else "")
    val tmp = Paths.get(dir, "_meta.json.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, metaPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Roll back the meta of an ABANDONED atomic-REPLACE: the swap writes
    * the old meta to `_meta_backup` (stamped with the target version)
    * before installing the staged meta, and deletes it after the pointer
    * flip. A backup whose target version never published AND whose commit
    * claim has gone stale means the replacer died between the meta swap
    * and the flip — restore the old meta so readers never keep seeing the
    * new schema over the old data. Idempotent and race-safe: a LIVE
    * replace keeps its claim heartbeated (fresh ⇒ untouched), and
    * concurrent restorers write identical bytes. */
  private def recoverMetaBackup(dir: String): Unit = {
    val b = Paths.get(dir, MetaBackupName)
    if (!Files.exists(b)) return
    try {
      val bytes = Files.readAllBytes(b)
      val nl = bytes.indexOf('\n'.toByte)
      if (nl <= 0) { Files.deleteIfExists(b); return }
      val target = new String(bytes, 0, nl, "UTF-8").trim.toLong
      if (currentVersion(dir) >= target) { Files.deleteIfExists(b); return }
      val claim = Paths.get(dir, f"_commit-$target%010d")
      val fresh = Files.exists(claim) && (System.currentTimeMillis() -
        Files.getLastModifiedTime(claim).toMillis) <= defaultStaleClaimMillis
      if (fresh) return // in-flight replace: leave it alone
      // under the meta lock so a concurrent ALTER can't be clobbered by
      // the rollback; re-check the backup inside (another reader may have
      // already restored it)
      withMetaLock(dir) {
        if (Files.exists(b) && currentVersion(dir) < target) {
          val tmp = Paths.get(dir, "_meta.json.rollback")
          Files.write(tmp,
            java.util.Arrays.copyOfRange(bytes, nl + 1, bytes.length))
          Files.move(tmp, metaPath(dir), StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          Files.deleteIfExists(b)
        }
      }
    } catch { case _: java.nio.file.NoSuchFileException => () }
  }

  private[sources] val MetaBackupName = "_meta_backup"

  def readMeta(dir: String): GraftTableMeta = {
    recoverMetaBackup(dir)
    val lines = new String(Files.readAllBytes(metaPath(dir)), "UTF-8").split("\n")
    GraftTableMeta(DataType.fromJson(lines(0)).asInstanceOf[StructType],
      lines(1).split(",").toSeq.filter(_.nonEmpty), lines(2).trim.toInt,
      // 4th line absent in pre-evolution metas
      if (lines.length > 3) lines(3).split(",").toSeq.filter(_.nonEmpty) else Nil,
      // 5th line absent in pre-MoR metas (copy-on-write deltas)
      if (lines.length > 4 && lines(4).trim.nonEmpty) lines(4).trim else "cow",
      // 6th line absent in pre-constraint metas
      if (lines.length > 5) lines(5).split(",").toSeq.filter(_.nonEmpty).map {
        pair =>
          val Array(n, s) = pair.split("=", 2)
          val dec = (v: String) => java.net.URLDecoder.decode(v, "UTF-8")
          (dec(n), dec(s))
      } else Nil,
      // 7th line absent in pre-partitioning metas
      if (lines.length > 6 && lines(6).trim.nonEmpty) {
        val Array(fn, c) = lines(6).trim.split(":", 2)
        Some((fn, java.net.URLDecoder.decode(c, "UTF-8")))
      } else None,
      // 8th line absent in pre-bloom metas
      if (lines.length > 7) lines(7).split(",").toSeq.filter(_.nonEmpty)
        .map(java.net.URLDecoder.decode(_, "UTF-8")) else Nil,
      // 9th line absent in pre-auto-optimize metas
      if (lines.length > 8 && lines(8).trim.nonEmpty) lines(8).trim.toInt
      else 0)
  }

  def currentVersion(dir: String): Long =
    new String(Files.readAllBytes(pointerPath(dir)), "UTF-8").trim.toLong

  def listVersions(dir: String): Seq[Long] = {
    // POINTER-CAPPED: a final-named version dir above the pointer is an
    // in-flight fast_forward adoption (or its crash debris) — not
    // committed history. Without the cap, a concurrent expireVersions
    // would count the adopted dirs as the newest keepers and retire the
    // CURRENT version, and time travel could read uncommitted branch
    // data. The cap restores the invariant that readable == committed.
    // A table mid-CREATE has no pointer yet (it lands last) — fall back
    // to uncapped there, matching the pre-cap tolerance.
    val cur =
      try currentVersion(dir)
      catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
    listDir(Paths.get(dir))(_.map(_.getFileName.toString)
      .filter(_.matches("v\\d{10}")).map(_.drop(1).toLong).toSeq.sorted)
      .filter(_ <= cur)
      // retired-but-still-referenced file hosts (see expireVersions) are
      // not readable versions
      .filterNot(v => Files.exists(
        Paths.get(versionDir(dir, v), "_expired")))
  }

  /** Multi-writer commit coordination: version `next` is CLAIMED by
    * create-exclusive marker file before any commit work begins, so two
    * concurrent writers can never both build (and one silently lose) the
    * same version — the create that loses throws and the loser either
    * retries on a recomputed version (appends, which commute) or surfaces
    * a clean conflict error (row-level deltas, whose read snapshot is
    * stale once another commit lands — serializable behavior). The marker
    * is released after the pointer flip; a crashed writer's marker goes
    * stale and is broken by age (`staleClaimMillis`, default 1 h — claims
    * are held for the duration of the rewrite job, so the threshold errs
    * long; an operator can delete `_commit-*` after a known crash). */
  /** Default stale-claim threshold: 1 h, overridable via the
    * `graft.store.staleClaimMillis` system property (deployments with
    * fast commits — or crash-injection harnesses — can shorten the
    * blocked window after a writer dies mid-commit; the heartbeat period
    * scales with the setting — [[heartbeatPeriodMs]] — so LIVE commits
    * stay safe at ANY threshold). */
  private[sources] def defaultStaleClaimMillis: Long =
    sys.props.get("graft.store.staleClaimMillis").map(_.toLong)
      .getOrElse(3600000L)

  private[sources] def claimCommit(dir: String, next: Long): (Path, String) =
    claimCommit(dir, next, defaultStaleClaimMillis)

  private[sources] def claimCommit(dir: String, next: Long,
      staleClaimMillis: Long): (Path, String) = {
    val marker = Paths.get(dir, f"_commit-$next%010d")
    // ownership token: release only deletes the marker if it still holds
    // OUR token — after a stale takeover the original writer's release
    // must NOT remove the new owner's claim (that would re-open the
    // version to a third writer mid-commit)
    val token = java.util.UUID.randomUUID().toString
    try Files.write(marker, token.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val age = try System.currentTimeMillis() -
          Files.getLastModifiedTime(marker).toMillis
        catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
        if (age > staleClaimMillis) {
          // Break the stale claim by ATOMIC RENAME, not delete+create: two
          // breakers deleting concurrently could each create "fresh"
          // markers and both think they won — the rename has exactly one
          // winner (the loser's move throws), who then re-claims.
          val tomb = Paths.get(s"$marker.stale-${System.nanoTime()}")
          try Files.move(marker, tomb, StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.NoSuchFileException =>
              throw new java.util.ConcurrentModificationException(
                s"concurrent commit in flight for version $next of $dir " +
                  "(stale claim broken by another writer)")
          }
          Files.deleteIfExists(tomb)
          try Files.write(marker, token.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new java.util.ConcurrentModificationException(
                s"concurrent commit in flight for version $next of $dir")
          }
        } else throw new java.util.ConcurrentModificationException(
          s"concurrent commit in flight for version $next of $dir " +
            s"(claim age ${age} ms)")
    }
    (marker, token)
  }

  /** Release a claim ONLY if we still own it (token match). */
  private[sources] def releaseClaim(marker: Path, token: String): Unit =
    try {
      if (new String(Files.readAllBytes(marker), "UTF-8") == token)
        Files.deleteIfExists(marker)
    } catch { case _: java.io.IOException => () }

  private lazy val heartbeatPool =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-claim-heartbeat")
      t.setDaemon(true)
      t
    })

  /** Heartbeat period derived from the EFFECTIVE stale threshold: a fixed
    * 60 s period under a `graft.store.staleClaimMillis` set below it (crash
    * harnesses use 3 s) would let a LIVE commit's claim age past stale
    * between ticks — re-opening exactly the mid-commit takeover the
    * heartbeat exists to close. A quarter of the threshold keeps ≥3 fresh
    * ticks inside any stale window; floor 25 ms so a tiny test threshold
    * can't busy-spin the scheduler, cap 60 s for the 1 h default. */
  private[sources] def heartbeatPeriodMs: Long =
    math.max(25L, math.min(60000L, defaultStaleClaimMillis / 4))

  /** Keep a commit's liveness markers fresh while `f` (the rewrite job)
    * runs: the claim marker's mtime is what claimCommit's stale check
    * reads, so a LEGITIMATE commit outlasting `staleClaimMillis` would
    * otherwise get its claim broken mid-rewrite — the new claimant would
    * then delete the live writer's in-progress version dir and both would
    * write the same version. Refreshing every `periodMs` (derived from the
    * stale threshold, see [[heartbeatPeriodMs]]) makes claim age mean "time
    * since the holder last proved it was alive", not "commit duration".
    * Extra `paths` (delta staging dirs, whose .bin files the commit reads
    * lazily for its whole duration) ride the same schedule so vacuum's age
    * check can't reap in-use staging.
    *
    * Residual TOCTOU, documented: [[verifyClaim]] → publishVersion →
    * writePointer is unfenced — a writer stalled past the stale threshold
    * AFTER its verifyClaim passed but BEFORE its pointer flip could still
    * clobber a successor's published version. The heartbeat shrinks the
    * exposure to "stall begins inside the microseconds between verify and
    * flip AND lasts the full stale threshold"; closing it entirely needs a
    * fencing rename (flip = atomic move of a token-named pointer), which
    * local rename-atomic filesystems get for free via the claim marker but
    * a generic object store would need conditional puts for. */
  private[sources] def withClaimHeartbeat[A](paths: Seq[Path],
      periodMs: Long = heartbeatPeriodMs)(f: => A): A = {
    val task = heartbeatPool.scheduleAtFixedRate(() => paths.foreach { p =>
      try Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case _: java.io.IOException => () }
    }, 0L, periodMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    try f finally task.cancel(false)
  }

  /** Last-instant ownership re-check before a pointer flip: if the claim
    * marker no longer holds this writer's token (broken as stale and taken
    * over), flipping would publish a version another writer now owns —
    * abort cleanly instead. */
  private def verifyClaim(marker: Path, token: String): Unit = {
    val held =
      try new String(Files.readAllBytes(marker), "UTF-8") == token
      catch { case _: java.io.IOException => false }
    if (!held) throw new java.util.ConcurrentModificationException(
      s"commit claim $marker was broken and taken over during the rewrite; " +
        "aborting before the pointer flip (another writer owns this version now)")
  }

  /** Per-version bucket fan-out marker (`<versionDir>/_buckets`). The
    * bucket COUNT is a property of a version's physical layout, not of the
    * table: [[rebucket]] changes it, and time travel must prune/SPJ old
    * versions under the count they were WRITTEN with — deriving buckets
    * from the current meta against an older layout would silently prune to
    * the wrong files. Every commit stamps the marker; versions predating
    * this feature fall back to `meta.buckets` (correct for them — they can
    * only exist on tables that never rebucketed). A `_committed_at` stamp
    * (epoch millis, written just before the pointer flip) rides along —
    * the clock behind `TIMESTAMP AS OF`. */
  private[sources] def writeBucketMarker(vdir: String, buckets: Int): Unit = {
    Files.write(Paths.get(vdir, "_buckets"), buckets.toString.getBytes("UTF-8"))
    // `TIMESTAMP AS OF` resolution assumes commit stamps are MONOTONE per
    // table; with multiple Spark drivers on a shared filesystem (the
    // MultiWriterRunner deployment) each writer stamps from its own wall
    // clock, and skew could make a later version carry an earlier instant.
    // Clamp every stamp to strictly after the previous version's so
    // monotonicity holds by construction, not by synchronized clocks.
    val p = Paths.get(vdir)
    val vname = p.getFileName.toString.takeWhile(_ != '.') // strip .build-<token>
    val prevStamp =
      if (vname.matches("v\\d{10}")) {
        val v = vname.drop(1).toLong
        val tableDir = p.getParent.toString
        listVersions(tableDir).filter(_ < v).lastOption
          .map(committedAt(tableDir, _)).getOrElse(Long.MinValue)
      } else Long.MinValue
    val stamp = math.max(System.currentTimeMillis(), prevStamp + 1)
    Files.write(Paths.get(vdir, "_committed_at"),
      stamp.toString.getBytes("UTF-8"))
  }

  /** When version `v` committed (epoch millis); falls back to the version
    * directory's mtime for pre-stamp versions. */
  def committedAt(dir: String, v: Long): Long = {
    val p = Paths.get(versionDir(dir, v), "_committed_at")
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong
    else Files.getLastModifiedTime(Paths.get(versionDir(dir, v))).toMillis
  }

  /** Latest retained version committed at or before `tsMillis` —
    * `TIMESTAMP AS OF` resolution (commit stamps are monotone because
    * commits serialize through the claim protocol). */
  def versionAsOfTimestamp(dir: String, tsMillis: Long): Option[Long] =
    listVersions(dir).filter(v => committedAt(dir, v) <= tsMillis).lastOption

  /** Zero-copy SHALLOW CLONE: `dst` is a new table whose v0 hard-links the
    * CURRENT version of `src` file-for-file (an object store would
    * manifest-reference; local links are free) — same schema, merge keys,
    * tombstones, physical-name mapping and bucket fan-out, fresh history
    * and changelog. The two tables then evolve independently: the shared
    * files are immutable by the store's copy-on-write contract, so writes
    * to either side never touch the other. This is the branch-for-an-
    * experiment operation at 100 TB — cost ∝ file COUNT, not bytes.
    * Crash-safe: `_meta.json` is written LAST ([[exists]] keys on it), so
    * a half-built clone is invisible; the dst directory is claimed
    * create-exclusively so two concurrent clones can't interleave. */
  def cloneTable(srcDir: String, dstDir: String): Unit = {
    require(exists(srcDir), s"no such table: $srcDir")
    require(!Files.exists(Paths.get(dstDir)),
      s"target already exists: $dstDir")
    recoverChangelog(srcDir)
    val meta = readMeta(srcDir)
    val cur = currentVersion(srcDir)
    val srcV = versionDir(srcDir, cur)
    // build the ENTIRE clone in a temp sibling and atomically rename into
    // place: a crash mid-clone leaves only a sweep-able .clonebuild dir,
    // never a meta-less half-table squatting on the target name
    val tmp = s"$dstDir.clonebuild-${java.util.UUID.randomUUID()}"
    Files.createDirectories(Paths.get(tmp))
    // the clone's history STARTS AT the source's current version number
    // (not 0): carried file seqs and merge-on-read delete seqs are version
    // numbers, and a clone restarting at v0 would commit future deletes
    // with seqs BELOW the carried ones — they would silently stop applying
    // to the carried files. Continuing the numbering keeps every sequence
    // comparison meaningful with zero rewrites.
    val base = versionDir(tmp, cur)
    Files.createDirectories(Paths.get(base))
    // materialize (hard-link) the source snapshot's resolved files into a
    // SELF-CONTAINED base: the clone must survive the source's vacuum /
    // expire independently, so manifest references across tables are out.
    // Linked files keep their ORIGINAL write versions in the clone's
    // fileseq so carried delete seqs stay meaningful.
    val linkedSeq = materializeInto(srcDir, cur, base)
    linkDvCarry(srcV, base, Set.empty)
    writeBucketMap(base, localSlots(base).map(s => s -> Seq(cur)).toMap)
    writeFileSeqEntries(base, linkedSeq)
    GraftStats.writeManifestEntries(base, mergedManifest(srcDir, cur))
    writeBucketMarker(base, layoutBuckets(srcDir, cur, meta))
    writePartSpecMarker(base, layoutPartSpec(srcDir, cur, meta))
    Files.createDirectories(Paths.get(changesRoot(tmp)))
    writePointer(tmp, cur)
    writeMeta(tmp, meta)
    try Files.move(Paths.get(tmp), Paths.get(dstDir),
      StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        deleteRecursively(Paths.get(tmp))
        throw new IllegalStateException(
          s"target appeared concurrently: $dstDir", e)
    }
  }

  // ------------------------------------------------ atomic CTAS / RTAS

  /** Publish a staged CTAS table under its final name — one atomic
    * rename, so a crash mid-CTAS leaves only a sweep-able `.stage-` dir
    * and readers can never observe a half-written table. */
  def adoptStaged(stageDir: String, finalDir: String): Unit = {
    invalidateDvCache(finalDir) // an adopted path is a NEW identity
    try Files.move(Paths.get(stageDir), Paths.get(finalDir),
      StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        deleteRecursively(Paths.get(stageDir))
        throw new IllegalStateException(
          s"table appeared concurrently at $finalDir", e)
      // Linux rename(2) onto an existing non-empty dir fails ENOTEMPTY,
      // which maps to a plain FileSystemException — same race, same answer
      case e: java.nio.file.FileSystemException
          if Files.exists(Paths.get(finalDir)) =>
        deleteRecursively(Paths.get(stageDir))
        throw new IllegalStateException(
          s"table appeared concurrently at $finalDir", e)
    }
  }

  def dropStaged(stageDir: String): Unit =
    deleteRecursively(Paths.get(stageDir))

  /** Atomic REPLACE TABLE AS SELECT: swap the table's contents AND schema
    * to the staged table's current version as ONE claimed, changelog-less
    * boundary commit. Readers never see a missing table (unlike
    * drop-then-recreate), concurrent writers serialize through the claim,
    * and the replaced versions stay retained: time travel across the
    * REPLACE reads old files under the new schema the same null-filling
    * way pre-ADD versions do (physical column identities differ by
    * design — a replace IS a new table in the old table's history).
    * The meta swap lands just before the pointer flip; the window where a
    * reader sees the new schema over the old version's data is the same
    * transient every ALTER has. */
  def replaceFromStaged(dir: String, stagedDir: String): Long = {
    recoverChangelog(dir)
    val stagedMeta = readMeta(stagedDir)
    val sv = currentVersion(stagedDir)
    val svDir = versionDir(stagedDir, sv)
    val cur = currentVersion(dir)
    val next = cur + 1
    val (marker, token) = claimCommit(dir, next)
    try withClaimHeartbeat(Seq(marker,
        Paths.get(s"${versionDir(dir, next)}.build-$token"))) {
      if (currentVersion(dir) != cur)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past version $cur during REPLACE; re-run")
      val nextDir = versionDir(dir, next)
      val buildDir = s"$nextDir.build-$token"
      deleteRecursively(Paths.get(buildDir))
      Files.createDirectories(Paths.get(buildDir))
      // materialize the staged table's resolved snapshot — the stage dir
      // is dropped right after the swap, so references into it would
      // dangle; the staged data is this statement's own output, so the
      // link pass is O(new files) by construction
      materializeInto(stagedDir, sv, buildDir)
      linkDvCarry(svDir, buildDir, Set.empty) // staged DVs (none today) carry
      writeBucketMap(buildDir,
        localSlots(buildDir).map(s => s -> Seq(next)).toMap)
      writeFileSeq(buildDir, None, next)
      GraftStats.writeManifestEntries(buildDir,
        mergedManifest(stagedDir, sv)) // reuse staged footers
      writeBucketMarker(buildDir, layoutBuckets(stagedDir, sv, stagedMeta))
      writePartSpecMarker(buildDir, layoutPartSpec(stagedDir, sv, stagedMeta))
      writeBoundaryMarker(buildDir) // snapshot boundary for CDC consumers
      // crash-safe meta swap: stamp the OLD meta + target version into
      // _meta_backup first. If this commit dies between the meta write
      // and the pointer flip (in-process failure handled right here;
      // process death handled by recoverMetaBackup once the claim goes
      // stale), the old meta comes back — the new schema is never left
      // permanently applied to the old data.
      val backup = Paths.get(dir, MetaBackupName)
      val oldMeta = Files.readAllBytes(metaPath(dir))
      val tmpB = Paths.get(dir, MetaBackupName + ".tmp")
      Files.write(tmpB, s"$next\n".getBytes("UTF-8") ++ oldMeta)
      Files.move(tmpB, backup, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      try {
        withMetaLock(dir) { writeMeta(dir, stagedMeta) }
        verifyClaim(marker, token)
        publishVersion(buildDir, nextDir)
        writePointer(dir, next)
      } catch {
        case e: Throwable =>
          val tmpR = Paths.get(dir, "_meta.json.rollback")
          Files.write(tmpR, oldMeta)
          Files.move(tmpR, metaPath(dir), StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          Files.deleteIfExists(backup)
          throw e
      }
      Files.deleteIfExists(backup)
      next
    } finally releaseClaim(marker, token)
  }

  /** Stamp the partition spec a version's OWN dirs were written with —
    * the per-version layout marker partition-spec evolution reads (the
    * `_buckets` pattern, mirrored). Only written for partitioned tables;
    * readers fall back to the CREATE-time meta spec. */
  private[sources] def writePartSpecMarker(vdir: String,
      spec: Option[(String, String)]): Unit =
    spec.foreach { case (fn, c) =>
      Files.write(Paths.get(vdir, "_partspec"),
        s"$fn:${java.net.URLEncoder.encode(c, "UTF-8")}".getBytes("UTF-8"))
    }

  /** Per-version-dir partition-spec marker cache: snapshotPartSpecs runs
    * at every partitioned scan build over every owner version, and the
    * markers are immutable once a version publishes — without the cache
    * a long-history table pays O(retained versions) small-file probes
    * per query at plan time. Epoch-guarded like the DV caches (a
    * drop/recreate mid-compute must not re-insert a stale entry). */
  private val partSpecCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(String, String)]]()

  /** The partition spec version `v` was written with, if stamped. */
  def versionPartSpec(dir: String, v: Long): Option[(String, String)] = {
    val key = versionDir(dir, v)
    val hit = partSpecCache.get(key)
    if (hit != null) return hit
    val e0 = cacheEpoch.get()
    val p = Paths.get(key, "_partspec")
    val computed =
      if (!Files.exists(p)) None
      else {
        val Array(fn, c) =
          new String(Files.readAllBytes(p), "UTF-8").trim.split(":", 2)
        Some((fn, java.net.URLDecoder.decode(c, "UTF-8")))
      }
    if (partSpecCache.size > 65536) partSpecCache.clear() // backstop
    if (cacheEpoch.get() == e0) partSpecCache.put(key, computed)
    computed
  }

  /** The partition spec governing version `v`'s OWN dirs: its marker if
    * stamped, else the CREATE-time meta spec (tables predating markers
    * can only carry the original spec). */
  def layoutPartSpec(dir: String, v: Long,
      meta: GraftTableMeta): Option[(String, String)] =
    versionPartSpec(dir, v).orElse(meta.partition)

  /** Distinct partition specs among the owner versions of snapshot `v` —
    * size 1 means era-uniform (partition pruning is sound under that one
    * spec); size > 1 means mixed grains (pruning derives nothing; the
    * source-column predicates stay in the residue so reads remain exact,
    * and `CALL rebucket` re-grains everything under the current spec). */
  def snapshotPartSpecs(dir: String, v: Long,
      meta: GraftTableMeta): Seq[(String, String)] =
    if (meta.partition.isEmpty) Nil
    else ownersOf(dir, v).values.flatten.toSeq.distinct
      .flatMap(o => layoutPartSpec(dir, o, meta)).distinct

  /** `CALL set_partition_spec(table, 'hours')`: change the partition
    * GRAIN for FUTURE commits as one metadata-only commit — no data file
    * touched, no changelog slice, NOT a boundary (content is unchanged).
    * Old owner dirs keep the ordinals they were written with and the
    * per-version markers keep every reader interpreting each dir under
    * its own era; scans over mixed-era snapshots stay exact (pruning
    * just derives nothing until `CALL rebucket` re-grains the data).
    * Time-grain transforms only (years/months/days/hours over the SAME
    * source column): their ordinals share the int domain, so one
    * partition-column schema serves every era. */
  def setPartitionSpec(dir: String, newFn: String): Long = {
    recoverChangelog(dir)
    val meta = readMeta(dir)
    val (curFn, physCol) = meta.partition.getOrElse(throw
      new IllegalArgumentException(
        s"table $dir has no PARTITIONED BY transform to evolve"))
    val timeGrains = Set("years", "months", "days", "hours")
    require(timeGrains.contains(newFn),
      s"set_partition_spec supports time grains ${timeGrains.toSeq.sorted
        .mkString("/")}, got '$newFn'")
    val cur = currentVersion(dir)
    val curSpec = layoutPartSpec(dir, cur, meta).get
    require(timeGrains.contains(curSpec._1),
      s"cannot evolve an identity-partitioned table's grain " +
        "(ordinal domains differ); use RTAS")
    if (curSpec == ((newFn, physCol))) return cur
    val next = cur + 1
    val (marker, token) = claimCommit(dir, next)
    try withClaimHeartbeat(Seq(marker)) {
      if (currentVersion(dir) != cur)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past version $cur during " +
            "set_partition_spec; re-run")
      val nextDir = versionDir(dir, next)
      val buildDir = s"$nextDir.build-$token"
      deleteRecursively(Paths.get(buildDir))
      Files.createDirectories(Paths.get(buildDir))
      // pure metadata commit: carry the whole snapshot by reference
      writeBucketMap(buildDir, ownersOf(dir, cur))
      linkDvCarry(versionDir(dir, cur), buildDir, Set.empty)
      writeFileSeq(buildDir, None, next)
      GraftStats.writeManifest(buildDir, None)
      writeBucketMarker(buildDir, layoutBuckets(dir, cur, meta))
      writePartSpecMarker(buildDir, Some((newFn, physCol)))
      verifyClaim(marker, token)
      publishVersion(buildDir, nextDir)
      writePointer(dir, next)
      next
    } finally releaseClaim(marker, token)
  }

  /** The bucket count version `v` was written with, if stamped. */
  def versionBuckets(dir: String, v: Long): Option[Int] = {
    val p = Paths.get(versionDir(dir, v), "_buckets")
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toInt)
  }

  /** The fan-out of the CURRENT version's layout — what writers must
    * bucket change batches by (not `meta.buckets`, which can lag the
    * layout across a crashed [[rebucket]]'s meta-update/pointer-flip
    * window). */
  def layoutBuckets(dir: String, v: Long, meta: GraftTableMeta): Int =
    versionBuckets(dir, v).getOrElse(meta.buckets)

  // --------------------------------------------------------- merge-on-read
  //
  // A table with merge_mode = 'mor' commits row-level deltas WITHOUT
  // rewriting the touched buckets: the after-images land as ordinary new
  // files (like an append) and the removed keys land as an EQUALITY-DELETE
  // slice under the hidden `_dv/dseq=<version>/gbucket=<k>/` layout. Reads
  // apply the delete set with a sequence rule — a delete at commit S drops
  // a key's rows only from files written BEFORE S (per-file sequence from
  // the `_fileseq` manifest), so a key deleted and later re-inserted keeps
  // exactly the re-inserted row. Cost shape at 100 TB: a spread MERGE
  // writes O(changed rows), never O(touched buckets); the price is a
  // bounded read-side probe that [[optimize]] (or the write-side cap —
  // [[morMaxLiveDeletes]] escalates an over-cap commit into the
  // copy-on-write rewrite) compacts away.

  /** Hidden per-version directory holding equality-delete slices. */
  val DvDirName = "_dv"
  /** Partition-dir column: the version a delete slice committed at. */
  val DvSeqCol = "dseq"

  def dvRoot(vdir: String): String = s"$vdir/$DvDirName"

  /** Delete-slice versions present in a version dir (slices that actually
    * carry buckets — an empty remnant dir is not a slice). */
  def dvSeqDirs(vdir: String): Seq[Long] = {
    val root = Paths.get(dvRoot(vdir))
    if (!Files.isDirectory(root)) return Seq.empty
    listDir(root)(_.filter { p =>
      p.getFileName.toString.startsWith(s"$DvSeqCol=") &&
        listDir(p)(_.exists(_.getFileName.toString.startsWith(s"$BucketCol=")))
    }.map(_.getFileName.toString.split("=")(1).toLong).toSeq.sorted)
  }

  def hasLiveDv(vdir: String): Boolean = dvSeqDirs(vdir).nonEmpty

  /** Buckets with at least one live delete entry in this version. */
  def dvBuckets(vdir: String): Set[Int] =
    dvSeqDirs(vdir).flatMap { s =>
      listDir(Paths.get(dvRoot(vdir), s"$DvSeqCol=$s"))(
        _.map(_.getFileName.toString).filter(_.startsWith(s"$BucketCol="))
          .map(_.split("=")(1).toInt).toSeq)
    }.toSet

  /** Total live delete rows in a version — parquet FOOTER metadata only
    * (cost ∝ delete files, which the cap keeps small). Unreadable footers
    * count as `Long.MaxValue` so a corrupt slice forces the safe
    * escalation path instead of unbounded growth. */
  def dvLiveRows(vdir: String): Long = {
    val root = Paths.get(dvRoot(vdir))
    if (!Files.isDirectory(root)) return 0L
    val s = Files.walk(root)
    val files =
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith(".") && !n.startsWith("_")
      }.toList
      finally s.close()
    files.map(f => GraftStats.fileRowCount(f).getOrElse(Long.MaxValue))
      .foldLeft(0L)((a, b) => if (a == Long.MaxValue || b == Long.MaxValue)
        Long.MaxValue else a + b)
  }

  /** Write-side cap on the LIVE delete set (rows): a merge-on-read commit
    * that would push past it escalates to the copy-on-write rewrite and
    * clears every delete slice — so the read-side probe (driver load +
    * per-task set) stays bounded by construction, the same way an LSM
    * bounds its level-0 run count. */
  /** Key types merge-on-read can probe by value equality in the scan —
    * the atomic family (same set bucket hashing covers); nested types are
    * out. */
  def morKeyTypeOk(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  private[sources] def morMaxLiveDeletes: Long =
    sys.props.get("graft.store.morMaxLiveDeletes").map(_.toLong)
      .getOrElse(200000L)

  /** Small-change-batch bound for the commit legs' broadcast plans. A
    * keyed commit whose change batch is under BOTH bounds (exact row
    * count from the touched-set job, exact cached bytes from the
    * materialized batch's stats) runs its before-image join and its
    * copy-on-write anti-join as BROADCASTS of the batch side — the
    * touched-bucket base is scanned once and never shuffled (guide-§3
    * shape: point DML over big buckets moves changed keys, not the
    * buckets). Over either bound the legs keep their shuffle plans. The
    * bounds are per-session confs so a cluster can size them to its
    * executor memory; the defaults are deliberately conservative (a
    * broadcast relation also lives on the driver). Note for operators
    * sizing broadcastMaxBytes: the byte bound is checked against the
    * batch's COMPRESSED columnar cache size AND against
    * rows × the base schema's estimated row width (the before-image
    * broadcast's reachable size); the in-memory row-format relation can
    * still occupy a few times the configured bytes on the driver and
    * each executor — derate accordingly (e.g. set it to 1/4 of what the
    * JVMs can really spare). */
  private def commitBroadcastMaxRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.commit.broadcastMaxRows")
      .map(_.toLong).getOrElse(1L << 20)
  private[sources] def commitBroadcastMaxBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.commit.broadcastMaxBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(32L << 20)

  /** Hard-link the previous version's still-applicable delete slices into
    * a build dir, skipping buckets this commit rewrites (their deletes are
    * APPLIED by the rewrite). Dropping a slice for a rewritten bucket is a
    * must for hygiene but not for correctness — rewritten files carry a
    * file-seq >= every existing dseq, so stale entries can never match
    * them. */
  private def linkDvCarry(srcVdir: String, buildDir: String,
      rewritten: Set[Int]): Unit =
    dvSeqDirs(srcVdir).foreach { s =>
      val seqDir = Paths.get(dvRoot(srcVdir), s"$DvSeqCol=$s")
      listDir(seqDir)(_.filter { p =>
        val n = p.getFileName.toString
        n.startsWith(s"$BucketCol=") &&
          !rewritten.contains(n.split("=")(1).toInt)
      }.toList).foreach { bdir =>
        val dst = Paths.get(dvRoot(buildDir), s"$DvSeqCol=$s",
          bdir.getFileName.toString)
        Files.createDirectories(dst)
        listDir(bdir)(_.filter(f => Files.isRegularFile(f) &&
            !f.getFileName.toString.startsWith(".") &&
            !f.getFileName.toString.startsWith("_"))
          .foreach(f => Files.createLink(dst.resolve(f.getFileName), f)))
      }
    }

  /** Build an all-insert commit's changelog slice by hard-linking the
    * data leg's parquet files (which carry the constant `change_op`/
    * `change_before` columns — see the linkChangelog note in
    * commitVersion) into the staging slice dir. Slot subpaths flatten
    * into the file name (slice dirs are flat; names stay unique because
    * part-file names are task-unique within the write job). An empty
    * batch yields an empty slice dir — same zero rows the old empty
    * parquet write produced. */
  private def linkChangelogSlice(buildDir: String, chDir: String): Unit = {
    val root = Paths.get(buildDir)
    Files.createDirectories(Paths.get(chDir))
    localSlots(buildDir).foreach { slot =>
      val slotDir = root.resolve(slot)
      listDir(slotDir)(_.filter { f =>
        val n = f.getFileName.toString
        Files.isRegularFile(f) && !n.startsWith(".") && !n.startsWith("_")
      }.foreach { f =>
        val flat = s"${slot.replace('/', '_')}_${f.getFileName}"
        Files.createLink(Paths.get(chDir, flat), f)
      })
    }
  }

  /** Every live delete slice of a version as one DataFrame: the PHYSICAL
    * key columns + [[BucketCol]] + [[DvSeqCol]] (long). None when the
    * version has no live deletes. */
  def readDv(spark: SparkSession, vdir: String): Option[DataFrame] = {
    val seqs = dvSeqDirs(vdir)
    if (seqs.isEmpty) None
    else {
      val dirs = seqs.map(s => s"${dvRoot(vdir)}/$DvSeqCol=$s")
      Some(spark.read.option("basePath", dvRoot(vdir)).parquet(dirs: _*)
        .withColumn(DvSeqCol, col(DvSeqCol).cast(LongType))
        .withColumn(BucketCol, col(BucketCol).cast(IntegerType)))
    }
  }

  /** Driver-side probe structures for the scan wrapper
    * ([[org.apache.spark.sql.GraftMorScanBuilder]]): the per-file seq map
    * and, per bucket, each deleted key's newest delete seq — key values in
    * CATALYST form so executors compare them against `InternalRow.get`
    * directly. Cost: one small job over the (cap-bounded) delete slices.
    * None when the version has no live deletes. */
  def loadDvProbe(spark: SparkSession, dir: String, v: Long,
      meta: GraftTableMeta)
      : Option[(Map[String, Long], Map[Int, Map[Seq[Any], Long]])] = {
    // version dirs are immutable once published and the physical key
    // names never change (renames are logical-only), so the probe caches
    // per directory — scans against a DV-live version pay the slice-read
    // job ONCE, not once per query
    val vdir = versionDir(dir, v)
    val cached = dvProbeCache.get(vdir)
    if (cached != null) return cached
    val epoch0 = cacheEpoch.get()
    val computed = loadDvProbeUncached(spark, dir, v, meta)
    if (dvProbeCache.size > 64) dvProbeCache.clear()
    if (cacheEpoch.get() == epoch0) dvProbeCache.put(vdir, computed)
    computed
  }

  private val dvProbeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Option[(Map[String, Long], Map[Int, Map[Seq[Any], Long]])]]()

  /** Drop cached probes under a table dir — version-dir paths stop being
    * unique identities the moment a table is dropped/recreated/adopted at
    * the same path. */
  /** Bumped by every invalidation — computing threads racing a concurrent
    * drop/recreate skip their put instead of re-inserting a stale entry
    * after the sweep (the get-miss → compute → put window). */
  private val cacheEpoch = new java.util.concurrent.atomic.AtomicLong()

  private[sources] def invalidateDvCache(tableDir: String): Unit = {
    cacheEpoch.incrementAndGet()
    // path-segment-scoped: dropping 'wh/t' must not evict 'wh/t2'
    val prefix = tableDir + java.io.File.separator
    dvProbeCache.keySet.removeIf(k => k == tableDir || k.startsWith(prefix))
    snapshotFilesCache.keySet.removeIf(k =>
      k == tableDir || k.startsWith(prefix))
    partSpecCache.keySet.removeIf(k => k == tableDir || k.startsWith(prefix))
    org.apache.spark.sql.GraftSnapshotScan.invalidate(tableDir)
  }

  private def loadDvProbeUncached(spark: SparkSession, dir: String, v: Long,
      meta: GraftTableMeta)
      : Option[(Map[String, Long], Map[Int, Map[Seq[Any], Long]])] =
    readDv(spark, versionDir(dir, v)).map { dv =>
      val physKeys = meta.keyCols.map(k => physicalName(meta.schema(k)))
      val keyTypes = meta.keyCols.map(k => meta.schema(k).dataType)
      val rows = dv.groupBy((BucketCol +: physKeys).map(col): _*)
        .agg(max(col(DvSeqCol)).as("__mx")).collect()
      val convs = keyTypes.map(org.apache.spark.sql.catalyst
        .CatalystTypeConverters.createToCatalystConverter)
      val n = physKeys.length
      val m = rows.groupBy(_.getInt(0)).map { case (b, rs) =>
        b -> rs.map { r =>
          val key: Seq[Any] = Seq.tabulate(n)(i => org.apache.spark.sql
            .GraftMorScanSupport.normalizeKey(convs(i)(r.get(i + 1))))
          key -> r.getLong(n + 1)
        }.toMap
      }
      (resolvedFileSeq(dir, v), m)
    }

  // ------------------------------------------------- per-file sequence map

  /** Per-version manifest mapping each data file's relative path to the
    * version that WROTE it (`rel\tseq` lines) — the read side's evidence
    * for "is this file older than that delete". Hard-linked carry-over
    * files keep their original seq; files carried from PRE-manifest
    * versions get 0 (older than every delete slice, which is exactly what
    * legacy files are). */
  val FileSeqName = "_fileseq"

  private[sources] def writeFileSeq(buildDir: String,
      prevVersionDir: Option[String], version: Long): Unit = {
    val prev = prevVersionDir.map(readFileSeq).getOrElse(Map.empty[String, Long])
    val prevExists: String => Boolean = prevVersionDir match {
      case Some(pd) => rel => Files.exists(Paths.get(pd, rel))
      case None => _ => false
    }
    val sb = new StringBuilder
    GraftStats.listDataFiles(buildDir).foreach { rel =>
      val seq = prev.getOrElse(rel,
        // present in the previous version dir but absent from its manifest
        // = carried from a pre-manifest commit: stamp 0, NOT `version` —
        // stamping a carried legacy file as new would stop every same-
        // version delete from applying to it
        if (prevExists(rel)) 0L else version)
      // third column: file SIZE — what lets scans plan from the manifest
      // with zero filesystem listing (see snapshotFileEntries)
      val bytes =
        try Files.size(Paths.get(buildDir, rel))
        catch { case _: Exception => -1L }
      sb.append(rel).append('\t').append(seq).append('\t').append(bytes)
        .append('\n')
    }
    Files.write(Paths.get(buildDir, FileSeqName),
      sb.toString.getBytes("UTF-8"))
  }

  /** Write an EXPLICIT rel → seq map (clone: linked files keep their
    * original write versions). */
  private[sources] def writeFileSeqEntries(buildDir: String,
      entries: Map[String, Long]): Unit = {
    val sb = new StringBuilder
    entries.toSeq.sorted.foreach { case (rel, s) =>
      val bytes =
        try Files.size(Paths.get(buildDir, rel))
        catch { case _: Exception => -1L }
      sb.append(rel).append('\t').append(s).append('\t').append(bytes)
        .append('\n')
    }
    Files.write(Paths.get(buildDir, FileSeqName),
      sb.toString.getBytes("UTF-8"))
  }

  /** Zone-map entries of every live file of a snapshot, merged across its
    * owner versions' manifests — what a MATERIALIZED copy of the snapshot
    * (clone/RTAS) persists as its own manifest, reusing footer reads. */
  private[sources] def mergedManifest(dir: String, v: Long)
      : Map[String, GraftStats.FileStats] =
    snapshotFileEntries(dir, v)
      .flatMap(e => e.stats.map(e.rel -> _)).toMap

  def readFileSeq(vdir: String): Map[String, Long] =
    readFileSeqFull(vdir).map { case (rel, (seq, _)) => rel -> seq }

  /** rel → (write seq, size bytes or -1 when unrecorded — pre-r12 lines
    * had no size column). */
  private[sources] def readFileSeqFull(vdir: String)
      : Map[String, (Long, Long)] = {
    val p = Paths.get(vdir, FileSeqName)
    if (!Files.exists(p)) return Map.empty
    Files.readAllLines(p, java.nio.charset.StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).flatMap { line =>
        line.split('\t') match {
          case Array(rel, seq) =>
            try Some(rel -> (seq.toLong, -1L))
            catch { case _: Exception => None }
          case Array(rel, seq, bytes) =>
            try Some(rel -> (seq.toLong, bytes.toLong))
            catch { case _: Exception => None }
          case _ => None
        }
      }.toMap
  }

  /** Publish a writer-private build directory under its final version
    * name (atomic rename), clearing any crash remnant first. Versions are
    * BUILT under `vN.build-<token>` — never under the final name — so a
    * writer whose claim was broken mid-commit (a stalled process resuming
    * after a stale takeover) keeps writing into ITS OWN build dir and can
    * never contaminate the new claimant's version contents; the final
    * name exists only after [[verifyClaim]] passed. */
  private def publishVersion(buildDir: String, finalDir: String): Unit = {
    deleteRecursively(Paths.get(finalDir))
    Files.move(Paths.get(buildDir), Paths.get(finalDir),
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def writePointer(dir: String, v: Long): Unit = {
    val tmp = Paths.get(dir, "_current.tmp")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create an empty table: meta, empty v0, empty changelog, pointer. */
  def create(dir: String, meta: GraftTableMeta): Unit = {
    invalidateDvCache(dir) // a recreated path is a NEW identity
    writeMeta(dir, meta)
    // a fresh identity stamp per CREATE: version numbers restart at 0
    // here, so version-based watermarks alone cannot distinguish this
    // table from a dropped predecessor at the same path/name — consumers
    // that cache cross-refresh state (materialized views) compare this
    // instead of trusting version arithmetic across a drop+recreate
    Files.write(Paths.get(dir, IncarnationName),
      java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    Files.createDirectories(Paths.get(versionDir(dir, 0L)))
    writeBucketMap(versionDir(dir, 0L), Map.empty)
    writeBucketMarker(versionDir(dir, 0L), meta.buckets)
    Files.createDirectories(Paths.get(changesRoot(dir)))
    writePointer(dir, 0L)
  }

  private[sources] val IncarnationName = "_incarnation"

  /** The table's incarnation identity — a UUID stamped at CREATE. Tables
    * predating the stamp (or built through paths that assemble their dir
    * file-by-file, e.g. clones) adopt one lazily and race-safely: the
    * CREATE_NEW loser reads the winner's. The identity answers exactly
    * one question for cross-refresh consumers: "is this the same table
    * my recorded watermark was measured against?" — version numbers
    * cannot, because a drop+recreate restarts them and a recreated table
    * can CATCH UP to a stale watermark (the r15-advised MV staleness
    * hole). */
  def incarnationOf(dir: String): String = {
    val p = Paths.get(dir, IncarnationName)
    try new String(Files.readAllBytes(p), "UTF-8").trim
    catch {
      case _: java.nio.file.NoSuchFileException =>
        val fresh = java.util.UUID.randomUUID().toString
        try {
          Files.write(p, fresh.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          fresh
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            new String(Files.readAllBytes(p), "UTF-8").trim
        }
    }
  }

  def changesRoot(dir: String): String = s"$dir/_changes"
  private def changesDir(dir: String, v: Long): String =
    s"${changesRoot(dir)}/$ChangeVersionCol=$v"
  private def changesStaging(dir: String, v: Long): String =
    s"${changesRoot(dir)}/.staging-$v"

  /** Changelog publication recovery (WAL discipline). The changelog for a
    * commit is written to a DOT-PREFIXED staging dir (invisible to parquet
    * discovery and file streams) and renamed to its `change_version=N`
    * name only AFTER the pointer flips — so a visible change directory
    * always belongs to a committed version and no reader (SQL `$changes`
    * table, CDC stream, readChanges) can ever observe uncommitted change
    * rows. The two crash windows repair here: staging for a version the
    * pointer never reached is dropped; staging for a committed version
    * (crash between flip and rename) is moved into place. Called at the
    * start of every commit and read path. */
  def recoverChangelog(dir: String): Unit = {
    // piggyback the S44 group-commit recovery on the same every-commit/
    // every-read hook (reentrancy-guarded: completing a group member
    // itself recovers this changelog)
    if (!inGroupRecovery.get()) {
      inGroupRecovery.set(true)
      try recoverGroupCommit(dir)
      finally inGroupRecovery.set(false)
    }
    val root = Paths.get(changesRoot(dir))
    if (!Files.isDirectory(root)) return
    val cur = currentVersion(dir)
    val staged = listDir(root)(_.filter(
      _.getFileName.toString.startsWith(".staging-")).toList)
    staged.foreach { p =>
      val v = p.getFileName.toString.stripPrefix(".staging-").toLong
      if (v <= cur) {
        val dst = Paths.get(changesDir(dir, v))
        if (Files.exists(dst)) deleteRecursively(p)
        else try Files.move(p, dst, StandardCopyOption.ATOMIC_MOVE)
        catch {
          // another reader (or the committing writer) published this
          // staging dir between our listing and the move — done either way
          case _: java.nio.file.NoSuchFileException => ()
          case _: java.nio.file.FileAlreadyExistsException => ()
        }
      } else if (!Files.exists(Paths.get(dir, f"_commit-$v%010d"))) {
        // staging above the pointer with NO commit claim = a crashed
        // writer's remnant. With a claim present the writer is IN FLIGHT
        // (it writes its changelog staging while holding the claim) and a
        // concurrent reader's recovery must not destroy it mid-commit —
        // if that writer is actually dead, its claim goes stale, the next
        // claimant's commitVersion clears the staging, or vacuum does.
        deleteRecursively(p)
      }
    }
  }

  /** New empty version (TRUNCATE). INSERT OVERWRITE does NOT go through
    * here — it is a single atomic [[applyChanges]] commit with
    * `overwrite = true`. */
  def truncate(dir: String): Unit = {
    recoverChangelog(dir)
    val cur = currentVersion(dir)
    val next = cur + 1
    val (marker, token) = claimCommit(dir, next)
    try {
      if (currentVersion(dir) != cur)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past version $cur during TRUNCATE")
      val nd = versionDir(dir, next)
      val bd = s"$nd.build-$token"
      deleteRecursively(Paths.get(bd))
      Files.createDirectories(Paths.get(bd))
      writeBucketMap(bd, Map.empty) // manifest-format marker: no data
      writeBucketMarker(bd, layoutBuckets(dir, cur, readMeta(dir)))
      writePartSpecMarker(bd, layoutPartSpec(dir, cur, readMeta(dir)))
      writeBoundaryMarker(bd) // truncation = snapshot boundary for CDC
      verifyClaim(marker, token)
      publishVersion(bd, nd)
      writePointer(dir, next)
    } finally releaseClaim(marker, token)
  }

  def dropTable(dir: String): Unit = {
    invalidateDvCache(dir)
    GraftStreamLimits.invalidate(dir)
    deleteRecursively(Paths.get(dir))
  }

  // --------------------------------------------------------------------
  // Named refs (tags): a tag is a named pin on one committed version —
  // `VERSION AS OF '<name>'` resolves it, and expireVersions keeps the
  // pinned version readable regardless of keep_last. One file per tag
  // under `_refs/` whose content is the version number; create-exclusive,
  // so two writers can never both own a name. Tags are NOT copied by
  // CALL clone (the clone's history is its own) and die with the table.
  // --------------------------------------------------------------------

  private def refsRoot(dir: String): Path = Paths.get(dir, "_refs")

  /** Tag-name grammar: must start with a letter so a name can never be
    * confused with a numeric `VERSION AS OF` literal. */
  private[sources] val RefNamePattern = "[A-Za-z][A-Za-z0-9_.-]{0,254}"

  /** All tags of a table: name → pinned version. Unreadable entries (a
    * concurrent create_tag mid-write) are skipped — callers re-list. */
  def listTags(dir: String): Map[String, Long] = {
    val root = refsRoot(dir)
    if (!Files.isDirectory(root)) Map.empty
    else listDir(root)(_.flatMap { p =>
      val n = p.getFileName.toString
      if (!n.matches(RefNamePattern)) None
      else try Some(n -> new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
      catch { case _: Exception => None }
    }.toMap)
  }

  def resolveRef(dir: String, name: String): Option[Long] =
    listTags(dir).get(name)

  /** Pin `version` under `name`. Write-then-verify: the ref file is
    * created FIRST (create-exclusive — a concurrent create_tag of the
    * same name loses loudly), then the version is re-checked against the
    * readable listing. If an expireVersions raced us and retired the
    * version (its `_expired` marker is the expiry commit point), the ref
    * is removed and the create fails — combined with expire's post-marker
    * ref re-check (see [[expireVersions]]), a tag can never end up
    * pointing at a version that is gone. */
  def createTag(dir: String, name: String, version: Long): Unit = {
    require(name.matches(RefNamePattern),
      s"invalid tag name '$name': must match $RefNamePattern " +
        "(starts with a letter; letters, digits, '_', '.', '-')")
    require(!branchExists(dir, name),
      s"a branch named '$name' exists on $dir — tags and branches share " +
        "the VERSION AS OF namespace (drop_branch first)")
    require(listVersions(dir).contains(version),
      s"table $dir has no retained version $version to tag " +
        s"(have ${listVersions(dir)})")
    Files.createDirectories(refsRoot(dir))
    val p = refsRoot(dir).resolve(name)
    try Files.write(p, version.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"tag '$name' already exists on $dir (pinned to version " +
            s"${resolveRef(dir, name).getOrElse("?")}) — CALL drop_tag first")
    }
    if (!listVersions(dir).contains(version)) {
      Files.deleteIfExists(p)
      throw new IllegalStateException(
        s"version $version of $dir was expired while tagging — the tag " +
          "was not created")
    }
    // ... and every owner slot the pinned snapshot references must still
    // exist: a concurrent expire that had already swept an older owner
    // dir (before this ref was visible to it) must fail THIS create, not
    // leave a tag pointing at a partially-reclaimed snapshot
    val missing = ownersOf(dir, version).exists { case (s, os) =>
      os.exists(o =>
        !Files.isDirectory(Paths.get(s"${versionDir(dir, o)}/$s")))
    }
    if (missing) {
      Files.deleteIfExists(p)
      throw new IllegalStateException(
        s"version $version of $dir lost owner slots to a concurrent " +
          "expire_versions while tagging — the tag was not created")
    }
  }

  def dropTag(dir: String, name: String): Unit = {
    val p = refsRoot(dir).resolve(name)
    require(name.matches(RefNamePattern) && Files.exists(p),
      s"table $dir has no tag '$name' (have " +
        s"${listTags(dir).keys.toSeq.sorted.mkString("[", ", ", "]")})")
    Files.delete(p)
  }

  // --------------------------------------------------------------------
  // Writable branches (S40). A branch is a SELF-CONTAINED shallow clone
  // under `<table>/_branches/<name>` stamped with its fork version: the
  // clone machinery already gives it hard-linked zero-copy creation, its
  // own linear history continuing the source's numbering (file/delete
  // seqs stay meaningful), and full independence from the source's
  // expire/vacuum — so EVERY table operation (DML, MERGE, optimize,
  // time travel, CDC) works on a branch with zero new write-path code.
  // `fastForward` publishes the branch into main when main hasn't moved
  // off the fork point: each branch-era version dir is hard-link-adopted
  // into main with its slot-owner references at the fork REWRITTEN from
  // the branch's materialized base to main's real owner map (the clone's
  // base is physical, main's is manifest-referenced — same files, same
  // inodes, different owner indirection), changelog slices ride the
  // standard staging discipline under per-version commit claims, and the
  // pointer flip to the branch head is the single atomic publish. Main
  // keeps the branch's COMMIT-BY-COMMIT history — time travel, CDC and
  // incremental MV refresh all see the branch's individual commits, not
  // one squashed adoption. The branch is consumed on publish.
  // --------------------------------------------------------------------

  private[sources] def branchesRoot(dir: String): Path =
    Paths.get(dir, "_branches")
  private[sources] val ForkBaseName = "_forkbase"

  def branchDir(dir: String, name: String): String = {
    require(name.matches(RefNamePattern),
      s"invalid branch name '$name': must match $RefNamePattern")
    s"$dir/_branches/$name"
  }

  /** Branches with a completed create (fork stamp present) — a crashed
    * half-create is invisible here and swept by its temp naming. */
  def listBranches(dir: String): Seq[String] = {
    val root = branchesRoot(dir)
    if (!Files.isDirectory(root)) Nil
    else listDir(root)(_.map(_.getFileName.toString)
      .filter(n => n.matches(RefNamePattern) &&
        Files.exists(root.resolve(n).resolve(ForkBaseName))).toSeq.sorted)
  }

  def branchExists(dir: String, name: String): Boolean =
    name.matches(RefNamePattern) &&
      Files.exists(branchesRoot(dir).resolve(name).resolve(ForkBaseName))

  def branchForkBase(dir: String, name: String): Long =
    new String(Files.readAllBytes(
      branchesRoot(dir).resolve(name).resolve(ForkBaseName)), "UTF-8")
      .trim.toLong

  /** Create branch `name` at the table's current version: one clone into
    * a temp sibling + fork stamp + atomic rename — readers never observe
    * a half-built branch, racing creates of the same name lose loudly.
    * Tags and branches share the `VERSION AS OF '<name>'` namespace, so
    * cross-creation is rejected both ways. */
  def createBranch(dir: String, name: String): Unit = {
    require(name.matches(RefNamePattern),
      s"invalid branch name '$name': must match $RefNamePattern " +
        "(starts with a letter; letters, digits, '_', '.', '-')")
    require(resolveRef(dir, name).isEmpty,
      s"a tag named '$name' exists on $dir — tags and branches share " +
        "the VERSION AS OF namespace (drop_tag first)")
    require(!branchExists(dir, name),
      s"branch '$name' already exists on $dir")
    val bd = Paths.get(branchDir(dir, name))
    require(!Files.exists(bd),
      s"a half-created branch dir blocks '$name' on $dir — remove " +
        s"$bd and retry")
    Files.createDirectories(branchesRoot(dir))
    val tmp = s"${branchesRoot(dir)}/.creating-$name-" +
      java.util.UUID.randomUUID()
    cloneTable(dir, tmp)
    Files.write(Paths.get(tmp, ForkBaseName),
      currentVersion(tmp).toString.getBytes("UTF-8"))
    try Files.move(Paths.get(tmp), bd, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        deleteRecursively(Paths.get(tmp))
        throw new IllegalArgumentException(
          s"branch '$name' was created concurrently on $dir", e)
    }
    // write-then-verify against a concurrent create_tag of the same name
    if (resolveRef(dir, name).isDefined) {
      deleteRecursively(bd)
      throw new IllegalArgumentException(
        s"a tag named '$name' was created concurrently on $dir — the " +
          "branch was not created")
    }
  }

  def dropBranch(dir: String, name: String): Unit = {
    require(branchExists(dir, name),
      s"table $dir has no branch '$name' (have " +
        s"${listBranches(dir).mkString("[", ", ", "]")})")
    invalidateDvCache(branchDir(dir, name))
    deleteRecursively(Paths.get(branchDir(dir, name)))
  }

  /** Hard-link-copy a directory tree (dirs recreated, files linked). */
  private def linkTree(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    val walk = Files.walk(src)
    try walk.iterator().asScala.foreach { p =>
      val rel = src.relativize(p)
      if (rel.toString.nonEmpty) {
        val t = dst.resolve(rel)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else if (Files.isRegularFile(p)) Files.createLink(t, p)
      }
    } finally walk.close()
  }

  /** Re-point a fast-forwarded version dir's slot-owner references from
    * the branch's materialized fork base to MAIN's owner map at the fork:
    * the branch base physically holds every fork-snapshot file (clones
    * are self-contained), main's fork version references most of them
    * through older owners — same files, different indirection. Owners
    * above the fork are branch-era commits adopted alongside and keep
    * their numbers. */
  private def rewriteOwnerRefs(buildDir: String, fork: Long,
      mainOwners: Map[String, Seq[Long]]): Unit = {
    val p = Paths.get(buildDir, BucketMapName)
    if (!Files.exists(p)) return // pre-manifest self-contained dir
    val rewritten = Files.readAllLines(p,
        java.nio.charset.StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).flatMap { line =>
        line.split('	') match {
          case Array(slot, vs) =>
            try Some(slot -> vs.split(',').map(_.toLong).toSeq)
            catch { case _: Exception => None }
          case _ => None
        }
      }.map { case (slot, os) =>
        slot -> os.flatMap { o =>
          if (o > fork) Seq(o)
          else mainOwners.getOrElse(slot, Seq(o))
        }.distinct.sorted
      }.toMap
    writeBucketMap(buildDir, rewritten)
  }

  /** Publish branch `name` into main — a TRUE fast-forward: requires main
    * still at the fork point (loud conflict otherwise), adopts every
    * branch-era version dir (including `_expired` file hosts) and
    * changelog slice commit-by-commit, flips the pointer to the branch
    * head as the single atomic publish, and consumes the branch. All
    * metadata + hard links: O(branch's own files), never a data copy or
    * a byte of main rewritten. Crash-safe: the branch stays intact until
    * the pointer flips (adopted dirs above the pointer are invisible and
    * a retry skips them), changelog slices stage under per-version commit
    * claims and publish only once the pointer covers them. Schema-
    * diverged branches (ALTER on the branch) are rejected — re-create the
    * table via RTAS instead. */
  def fastForward(dir: String, name: String): Long = {
    require(branchExists(dir, name),
      s"table $dir has no branch '$name' (have " +
        s"${listBranches(dir).mkString("[", ", ", "]")})")
    recoverChangelog(dir)
    val bd = branchDir(dir, name)
    recoverChangelog(bd)
    val fork = branchForkBase(dir, name)
    val bHead = currentVersion(bd)
    // A fast-forward CONSUMES the branch, so a branch commit racing the
    // publish window would be silently dropped with it — claim the
    // BRANCH's next version for the whole operation: branch writers
    // conflict loudly instead (and a writer already holding the claim
    // makes THIS call the loud loser). Re-verify the head under the
    // claim: a commit may have landed between the read and the claim.
    val (bMarker, bToken) = claimCommit(bd, bHead + 1)
    try {
    if (currentVersion(bd) != bHead)
      throw new java.util.ConcurrentModificationException(
        s"branch '$name' of $dir advanced past v$bHead while fast_forward " +
          "was starting; re-run to publish the new head")
    if (bHead == fork) { // nothing to publish: consume the branch
      dropBranch(dir, name)
      return currentVersion(dir)
    }
    // fail fast on an already-visible schema/layout divergence before
    // taking any claims (the authoritative re-check runs inside the claim
    // to close the race window)
    if (readMeta(dir) != readMeta(bd))
      throw new IllegalStateException(
        s"branch '$name' of $dir diverged in SCHEMA/layout from main " +
          "(an ALTER landed on the branch or on main since the fork); " +
          "fast_forward aborted — re-branch and replay, or use RTAS")
    val branchVs = listDir(Paths.get(bd))(_.map(_.getFileName.toString)
      .filter(_.matches("v\\d{10}")).map(_.drop(1).toLong).toSeq)
      .filter(_ > fork).sorted
    require(branchVs.nonEmpty, s"branch '$name' advanced its pointer to " +
      s"v$bHead but retains no version dirs above the fork v$fork")
    // claim EVERY version being adopted: the fork+1 claim serializes
    // against normal writers; the higher claims keep a concurrent
    // reader's recoverChangelog from sweeping the staged slices (it
    // preserves stagings whose version holds a live claim). Acquired
    // INSIDE the try: a mid-acquisition loss (a writer holds fork+1)
    // must release the claims already taken, not leak them for the
    // stale-claim window.
    val claims = scala.collection.mutable.ArrayBuffer.empty[(Path, String)]
    try {
      branchVs.foreach(v => claims += claimCommit(dir, v))
      withClaimHeartbeat((bMarker +: claims.map(_._1)).toSeq) {
      if (currentVersion(dir) != fork)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past the fork point v$fork of branch " +
            s"'$name' (now v${currentVersion(dir)}); fast_forward " +
            "aborted — re-branch from the new head and replay")
      // SCHEMA/layout divergence re-check under the claim — an ALTER is
      // meta-only, so the fork-point check above cannot see it. NOT a
      // ConcurrentModificationException: retrying never heals a
      // branch-side ALTER, so conflict-retry loops must not spin on it.
      if (readMeta(dir) != readMeta(bd))
        throw new IllegalStateException(
          s"branch '$name' of $dir diverged in SCHEMA/layout from main " +
            "(an ALTER landed on the branch or on main since the fork); " +
            "fast_forward aborted — re-branch and replay, or use RTAS")
      adoptBranchVersions(dir, bd, fork, branchVs, claims.head._2,
        rebuild = false)
      claims.foreach { case (m, t) => verifyClaim(m, t) }
      writePointer(dir, bHead)
      invalidateDvCache(dir)
      }
    } finally claims.foreach { case (m, t) => releaseClaim(m, t) }
    recoverChangelog(dir) // the pointer now covers the staged slices
    dropBranch(dir, name) // a fast-forward consumes the branch
    bHead
    // the branch claim releases in the outer finally: dropBranch removed
    // the marker with the dir, which releaseClaim tolerates
    } finally releaseClaim(bMarker, bToken)
  }

  /** Adopt a branch's version dirs, changelog slices, and boundary
    * markers above `fork` into main — hard links only, every artifact
    * landing ABOVE main's pointer (invisible until it flips) or under a
    * dot-prefixed staging name. Caller holds the claims for every
    * adopted version. `rebuild = false` skips a dst that already exists
    * (the crashed-same-branch-retry case fast_forward relies on);
    * `rebuild = true` deletes and relinks it (the group-publish case: an
    * ABORTED earlier group may have left an adopted dir from a branch
    * that no longer exists — same version number, different content). */
  private def adoptBranchVersions(dir: String, bd: String, fork: Long,
      branchVs: Seq[Long], token: String, rebuild: Boolean): Unit = {
    val mainOwners = ownersOf(dir, fork)
    branchVs.foreach { v =>
      val dst = Paths.get(versionDir(dir, v))
      if (rebuild && Files.isDirectory(dst)) deleteRecursively(dst)
      if (!Files.isDirectory(dst)) { // a crashed retry already adopted it
        val build = Paths.get(s"${versionDir(dir, v)}.build-$token")
        deleteRecursively(build)
        linkTree(Paths.get(versionDir(bd, v)), build)
        rewriteOwnerRefs(build.toString, fork, mainOwners)
        publishVersion(build.toString, versionDir(dir, v))
      }
      val srcSlice = Paths.get(s"${changesRoot(bd)}/$ChangeVersionCol=$v")
      val dstSlice = Paths.get(s"${changesRoot(dir)}/$ChangeVersionCol=$v")
      val stage = Paths.get(s"${changesRoot(dir)}/.staging-$v")
      if (Files.isDirectory(srcSlice) && !Files.exists(dstSlice)) {
        // a pre-existing staging is a crashed attempt's possibly-TORN
        // link pass — we hold this version's claim, the branch slice is
        // immutable: rebuild it whole rather than publish a partial one
        deleteRecursively(stage)
        Files.createDirectories(Paths.get(changesRoot(dir)))
        linkTree(srcSlice, stage)
      }
      // expiry-promoted boundary markers on the branch follow along
      val bm = Paths.get(changesRoot(bd), f"_boundary-$v%010d")
      if (Files.exists(bm)) {
        Files.createDirectories(Paths.get(changesRoot(dir)))
        val m = Paths.get(changesRoot(dir), f"_boundary-$v%010d")
        if (!Files.exists(m)) Files.write(m, Array.empty[Byte])
      }
    }
  }

  /** Rebase branch `name` onto MAIN's current head — the recourse when
    * `fast_forward` conflicts because main moved off the fork point: the
    * branch re-forks from main's head and its changelog slices REPLAY
    * commit-by-commit through the standard delta path, with KEY-LEVEL
    * conflict detection first — any merge key changed on BOTH sides
    * since the fork is a loud conflict with the branch left intact
    * (disjoint-key divergence is the automatable case; overlapping keys
    * need a human). Cost ∝ both sides' changes plus a zero-copy clone of
    * main (hard links, O(file count)) — never a data rewrite of either
    * history.
    *
    * Race discipline: main is CLONED FIRST and the rebase builds
    * entirely inside the private clone — a main commit racing the rebase
    * lands either before the clone (its keys are checked) or after it
    * (the rebased branch simply forks one version earlier, which is
    * exactly the conflict the next fast_forward reports). The swap keeps
    * the ORIGINAL branch on disk until the rebased one occupies the
    * name; a crash mid-swap leaves a `.prerebase-` sibling vacuum can
    * reclaim (or an operator can rename back). Replay preserves the
    * branch's per-commit history — the rebased branch fast-forwards
    * commit-by-commit like any other. */
  def rebaseBranch(spark: SparkSession, dir: String, name: String): Long = {
    require(branchExists(dir, name),
      s"table $dir has no branch '$name' (have " +
        s"${listBranches(dir).mkString("[", ", ", "]")})")
    val bd = branchDir(dir, name)
    recoverChangelog(dir)
    recoverChangelog(bd)
    val fork = branchForkBase(dir, name)
    val bHead = currentVersion(bd)
    // the swap at the end REPLACES the branch dir, so a branch commit
    // racing the (long) rebase window would be silently destroyed with
    // the displaced original — claim the branch's next version for the
    // whole rebase: racing writers conflict loudly instead, and a writer
    // already holding the claim makes THIS call the loud loser. The
    // marker is heartbeated below (replay can be long) and travels into
    // the .prerebase- dir with the swap, which releaseClaim tolerates.
    val (bMarker, bToken) = claimCommit(bd, bHead + 1)
    try {
    withClaimHeartbeat(Seq(bMarker)) {
    if (currentVersion(bd) != bHead)
      throw new java.util.ConcurrentModificationException(
        s"branch '$name' of $dir advanced past v$bHead while rebase was " +
          "starting; re-run against the new head")
    if (readMeta(dir) != readMeta(bd))
      throw new IllegalStateException(
        s"branch '$name' of $dir diverged in SCHEMA/layout from main " +
          "(an ALTER landed on the branch or on main since the fork); " +
          "rebase aborted — re-branch and replay, or use RTAS")
    if (bHead > fork) {
      require(changesHorizon(bd) <= fork + 1,
        s"branch '$name' of $dir expired changelog slices since its fork " +
          s"v$fork — not replayable; re-branch from main and re-apply")
      require(boundariesIn(bd, fork + 1, bHead).isEmpty,
        s"branch '$name' of $dir carries a snapshot boundary " +
          "(TRUNCATE/INSERT OVERWRITE/RESTORE) since its fork — not " +
          "replayable; re-branch from main and re-apply")
    }
    Files.createDirectories(branchesRoot(dir))
    val tmp = s"${branchesRoot(dir)}/.creating-rebase-$name-" +
      java.util.UUID.randomUUID()
    cloneTable(dir, tmp)
    try {
      val mHead = currentVersion(tmp)
      require(mHead > fork,
        s"main of $dir is still at branch '$name''s fork point v$fork — " +
          "nothing to rebase onto; use fast_forward")
      val meta = readMeta(tmp)
      if (bHead > fork) {
        if (meta.keyCols.nonEmpty) {
          // overlap detection needs MAIN's changelog over the divergence
          // window; slices for committed versions are immutable, so
          // reading them after the clone is exact (the clone's own
          // changelog starts empty — clones have fresh history).
          // Keyless (append-only) tables skip this: appends commute, so
          // two-sided divergence never conflicts.
          require(changesHorizon(dir) <= fork + 1 &&
              boundariesIn(dir, fork + 1, mHead).isEmpty,
            s"main of $dir expired changelog slices or carries a snapshot " +
              s"boundary since branch '$name''s fork v$fork — key-overlap " +
              "detection impossible; re-branch from main and re-apply")
          val keyCols = meta.keyCols
          val bKeys = readChanges(spark, bd, fork + 1, bHead)
            .select(keyCols.map(col): _*).distinct()
          val mKeys = readChanges(spark, dir, fork + 1, mHead)
            .select(keyCols.map(col): _*).distinct()
          val clash = bKeys.join(mKeys, keyCols).limit(5).collect()
          if (clash.nonEmpty)
            throw new IllegalStateException(
              s"rebase conflict on $dir branch '$name': merge keys changed " +
                s"on BOTH main and the branch since fork v$fork (e.g. " +
                clash.map(_.toSeq.mkString("(", ",", ")")).mkString(", ") +
                "); overlapping-key divergence needs a human — re-branch " +
                "and reconcile, or drop one side's change")
        }
        ((fork + 1) to bHead).filter(v => hasChangelog(bd, v)).foreach { v =>
          val slice = readChanges(spark, bd, v, v)
          val batch = slice.select((col(ChangeOpCol).as(OpCol) +:
            meta.schema.fieldNames.toSeq.map(col)): _*)
          // keyless slices are insert-only by construction (the append
          // guard), so their replay rides the append fast path
          applyChanges(spark, tmp, batch,
            allInserts = meta.keyCols.isEmpty)
        }
      }
      Files.write(Paths.get(tmp, ForkBaseName),
        mHead.toString.getBytes("UTF-8"))
      val newHead = currentVersion(tmp)
      // swap: the ORIGINAL branch stays on disk until the rebased one
      // occupies the name (never a window with neither recoverable)
      val pre = s"${branchesRoot(dir)}/.prerebase-$name-" +
        java.util.UUID.randomUUID()
      invalidateDvCache(bd)
      Files.move(Paths.get(bd), Paths.get(pre),
        StandardCopyOption.ATOMIC_MOVE)
      try Files.move(Paths.get(tmp), Paths.get(bd),
        StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: Throwable =>
          // put the original back before surfacing (FileAlreadyExists =
          // a concurrent create took the name — they win; if the restore
          // itself fails the .prerebase- sibling holds the content)
          try Files.move(Paths.get(pre), Paths.get(bd),
            StandardCopyOption.ATOMIC_MOVE)
          catch { case _: Throwable => () }
          throw e
      }
      invalidateDvCache(bd)
      deleteRecursively(Paths.get(pre))
      newHead
    } catch {
      case e: Throwable =>
        if (Files.exists(Paths.get(tmp))) deleteRecursively(Paths.get(tmp))
        throw e
    }
    }
    } finally releaseClaim(bMarker, bToken)
  }

  // --------------------------------------------------------------------
  // Cross-table atomic publish (S44): a table-group commit. Each member
  // table carries a branch with the staged work; `publishGroup` fast-
  // forwards EVERY branch or NONE — two-phase with a single decision
  // point and roll-FORWARD recovery:
  //
  //   PREPARE (per member, under the same claims fast_forward takes):
  //     freeze the branch, verify the fork point and schema, adopt the
  //     branch's version dirs + changelog stagings into main — all
  //     INVISIBLE (above the pointer / dot-prefixed), then drop a
  //     `_groupcommit` marker in the table dir pointing at the group
  //     manifest. Main stays readable at the fork throughout (the fork+1
  //     claim freezes writers, never readers).
  //   DECIDE: one CREATE_NEW of `<group>.decision` = "committed" — the
  //     single atomic action that makes the whole group's outcome. A
  //     concurrent recovery that aborted a stalled group wins the same
  //     CREATE_NEW with "aborted"; exactly one of the two ever exists.
  //   COMPLETE (per member): flip the pointer to the branch head, publish
  //     the staged slices, consume the branch, remove the marker.
  //
  // Crash windows: before DECIDE → no pointer moved, every reader saw
  // (and keeps seeing) the pre-publish contents of every member; the
  // stalled group's claims go stale and any later access aborts it
  // loudly via the decision file. After DECIDE → `recoverGroupCommit`
  // (piggybacked on the scan path's version resolution and every
  // commit's recoverChangelog) rolls the remaining members FORWARD from
  // the manifest — a reader that catches a member mid-window completes
  // the flip itself before resolving the version. The one documented
  // softness: a reader racing the COMPLETE phase exactly between two
  // flips can observe member A new and member B old for the instant
  // before B's read-path recovery fires — the same transient any
  // catalog-external multi-table commit has without a global snapshot
  // authority; crash-durability is all-or-nothing regardless.
  // --------------------------------------------------------------------

  private[sources] val GroupMarkerName = "_groupcommit"

  private val inGroupRecovery = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Crash injection for the S44 gate/fuzz only (`graft.store.failpoint
    * .publish_group` = before-decision | between-flips): throws at the
    * named point WITHOUT releasing claims or markers — simulating a
    * dead coordinator the recovery paths must then resolve. */
  private[sources] final class InjectedGroupCrash(at: String)
    extends RuntimeException(s"injected publish_group crash at $at")
  private def groupFailpoint(at: String): Unit =
    if (sys.props.get("graft.store.failpoint.publish_group").contains(at))
      throw new InjectedGroupCrash(at)

  private def groupDecisionPath(manifest: Path): Path =
    manifest.resolveSibling(
      manifest.getFileName.toString.stripSuffix(".json") + ".decision")

  /** One member's manifest line: dir TAB branch TAB fork TAB head TAB
    * branch-dir incarnation. The incarnation pins WHICH branch the
    * group published: a resolver completing a member (possibly from a
    * STALE marker read) must consume only that incarnation — the same
    * name may already be a freshly re-created branch for the next
    * publish, and dropping it would destroy an unrelated in-flight
    * branch (observed as a create_branch "already exists" failure after
    * the racing publisher crashed on its vanished branch). */
  private def writeGroupManifest(manifest: Path,
      members: Seq[(String, String, Long, Long, String)]): Unit = {
    Files.createDirectories(manifest.getParent)
    val body = members.map { case (d, b, f, h, inc) =>
      s"${java.net.URLEncoder.encode(d, "UTF-8")}\t" +
        s"${java.net.URLEncoder.encode(b, "UTF-8")}\t$f\t$h\t" +
        java.net.URLEncoder.encode(inc, "UTF-8")
    }.mkString("", "\n", "\n")
    Files.write(manifest, body.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
  }

  /** Incarnation is None for manifests written before the field existed
    * (committed manifests are retained indefinitely). */
  private def readGroupManifest(manifest: Path)
      : Seq[(String, String, Long, Long, Option[String])] =
    new String(Files.readAllBytes(manifest), "UTF-8").split("\n").toSeq
      .filter(_.nonEmpty).map { line =>
        val parts = line.split("\t")
        (java.net.URLDecoder.decode(parts(0), "UTF-8"),
          java.net.URLDecoder.decode(parts(1), "UTF-8"),
          parts(2).toLong, parts(3).toLong,
          parts.lift(4).map(java.net.URLDecoder.decode(_, "UTF-8")))
      }

  /** Publish branch `name` on EVERY listed table atomically — all flip
    * or none. `groupsRoot` hosts the group manifest + decision files
    * (one dir per catalog warehouse). Returns the published head per
    * table, in input order. */
  def publishGroup(groupsRoot: Path, members: Seq[(String, String)])
      : Seq[Long] = {
    require(members.nonEmpty, "publish_group needs at least one table")
    require(members.map(_._1).distinct.size == members.size,
      "publish_group lists a table twice")
    // resolve any prior group's leftovers first — a stalled PREPARED
    // group aborts here (its claims gone stale), a decided one completes
    members.foreach { case (d, _) => recoverGroupCommit(d) }
    // retention for the groups directory: ABORTED manifests (and
    // undecided ones a day past any plausible stale window — first
    // decided aborted, winning or losing the CREATE_NEW race either
    // way) are debris; COMMITTED manifests are retained indefinitely —
    // they are the roll-forward authority for members that may not have
    // been touched since the decision
    if (Files.isDirectory(groupsRoot)) {
      val now = System.currentTimeMillis()
      listDir(groupsRoot)(_.filter(
          _.getFileName.toString.endsWith(".json")).toList).foreach { m =>
        val d = groupDecisionPath(m)
        val verdict =
          try Some(new String(Files.readAllBytes(d), "UTF-8").trim)
          catch { case _: java.io.IOException => None }
        val age = try now - Files.getLastModifiedTime(m).toMillis
        catch { case _: java.nio.file.NoSuchFileException => -1L }
        if (verdict.isEmpty && age > 86400000L)
          try Files.write(d, "aborted".getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          catch { case _: java.io.IOException => () }
        val nowAborted =
          try new String(Files.readAllBytes(d), "UTF-8").trim == "aborted"
          catch { case _: java.io.IOException => false }
        if (nowAborted && age > 86400000L) {
          Files.deleteIfExists(m)
          Files.deleteIfExists(d)
        }
      }
    }
    val id = java.util.UUID.randomUUID().toString
    val manifest = groupsRoot.resolve(s"group-$id.json")
    val decision = groupDecisionPath(manifest)
    // (dir, bd, branch, fork, head, marker)
    val preps = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, Long, Long, Path)]
    val claims = scala.collection.mutable.ArrayBuffer.empty[(Path, String)]
    var injected = false
    try {
      try {
        // PREPARE in deterministic (sorted-dir) order: two concurrent
        // groups over overlapping tables deadlock-free — the loser
        // conflicts on the first shared table's claim
        members.sortBy(_._1).foreach { case (dir, name) =>
          require(branchExists(dir, name),
            s"table $dir has no branch '$name' (have " +
              s"${listBranches(dir).mkString("[", ", ", "]")})")
          recoverChangelog(dir)
          val bd = branchDir(dir, name)
          recoverChangelog(bd)
          val fork = branchForkBase(dir, name)
          val bHead = currentVersion(bd)
          val bc = claimCommit(bd, bHead + 1) // freeze the branch
          claims += bc
          if (currentVersion(bd) != bHead)
            throw new java.util.ConcurrentModificationException(
              s"branch '$name' of $dir advanced while publish_group was " +
                "starting; re-run")
          if (readMeta(dir) != readMeta(bd))
            throw new IllegalStateException(
              s"branch '$name' of $dir diverged in SCHEMA/layout from " +
                "main; publish_group aborted — re-branch and replay")
          val branchVs = listDir(Paths.get(bd))(
            _.map(_.getFileName.toString).filter(_.matches("v\\d{10}"))
              .map(_.drop(1).toLong).toSeq).filter(_ > fork).sorted
          branchVs.foreach(v => claims += claimCommit(dir, v))
          if (currentVersion(dir) != fork)
            throw new java.util.ConcurrentModificationException(
              s"table $dir advanced past the fork point v$fork of branch " +
                s"'$name'; publish_group aborted — rebase and re-run")
          if (readMeta(dir) != readMeta(bd)) // re-check under the claims
            throw new IllegalStateException(
              s"branch '$name' of $dir diverged in SCHEMA/layout from " +
                "main; publish_group aborted — re-branch and replay")
          adoptBranchVersions(dir, bd, fork, branchVs, bc._2, rebuild = true)
          val marker = Paths.get(dir, GroupMarkerName)
          preps += ((dir, bd, name, fork, bHead, marker))
        }
        writeGroupManifest(manifest, preps.toSeq.map {
          case (d, bd, b, f, h, _) => (d, b, f, h, incarnationOf(bd)) })
        preps.foreach { case (_, _, _, _, _, marker) =>
          try Files.write(marker,
            manifest.toAbsolutePath.toString.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new java.util.ConcurrentModificationException(
                s"another table group holds ${marker.getParent}; " +
                  "resolve it (any read recovers a decided/stalled group) " +
                  "and re-run")
          }
        }
        groupFailpoint("before-decision")
        withClaimHeartbeat(
            (claims.map(_._1) ++ preps.map(_._6)).toSeq) {
          // last-instant fencing, then the single decision point
          claims.foreach { case (m, t) => verifyClaim(m, t) }
          try Files.write(decision, "committed".getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              // a recovery aborted this group while we stalled
              throw new java.util.ConcurrentModificationException(
                s"publish_group $id was aborted by a concurrent recovery; " +
                  "re-run")
          }
          // COMPLETE every member; a crash from here on rolls forward
          preps.zipWithIndex.foreach { case ((dir, _, _, _, _, _), i) =>
            if (i > 0) groupFailpoint("between-flips")
            completeGroupMember(dir)
          }
        }
      } catch {
        case e: InjectedGroupCrash => injected = true; throw e
        case e: Throwable =>
          // a LIVE coordinator backing out (claim lost, decision lost,
          // member conflict) must not leave its markers pinning the
          // tables for the stale window: decide ABORT if still undecided
          // and sweep the markers it wrote. A marker whose CREATE_NEW we
          // lost belongs to another group and stays. Never runs on the
          // injected-crash lane — that simulates a DEAD coordinator.
          if (Files.exists(manifest) && !Files.exists(decision))
            try Files.write(decision, "aborted".getBytes("UTF-8"),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            catch { case _: java.nio.file.FileAlreadyExistsException => () }
          val decided =
            try new String(Files.readAllBytes(decision), "UTF-8").trim ==
              "committed"
            catch { case _: java.io.IOException => false }
          if (!decided) preps.foreach { case (_, _, _, _, _, marker) =>
            try {
              if (new String(Files.readAllBytes(marker), "UTF-8").trim ==
                  manifest.toAbsolutePath.toString)
                Files.deleteIfExists(marker)
            } catch { case _: java.io.IOException => () }
          }
          throw e
      }
    } finally if (!injected)
      claims.foreach { case (m, t) => releaseClaim(m, t) }
    val heads = members.map { case (d, _) =>
      d -> preps.collectFirst { case (`d`, _, _, _, h, _) => h }.get }
    heads.map(_._2)
  }

  /** Roll a decided group forward on one member: flip the pointer to the
    * recorded head, publish the staged changelog slices, consume the
    * branch, drop the marker. Idempotent and safe to race — every step
    * either tolerates or ignores an already-done state. */
  private def completeGroupMember(dir: String): Unit = {
    val marker = Paths.get(dir, GroupMarkerName)
    val manifest =
      try Paths.get(new String(Files.readAllBytes(marker), "UTF-8").trim)
      catch { case _: java.nio.file.NoSuchFileException => return }
    val mine = readGroupManifest(manifest).find(_._1 == dir).getOrElse(return)
    val (_, branch, _, head, inc) = mine
    if (currentVersion(dir) < head) {
      writePointer(dir, head)
      invalidateDvCache(dir)
    }
    recoverChangelog(dir) // the pointer now covers the staged slices
    // consume ONLY the published incarnation: a resolver acting on a
    // stale marker read can find the same NAME already re-created for
    // the next publish — that branch is not ours to drop. A legacy
    // manifest (no incarnation field) keeps the by-name behavior.
    if (branchExists(dir, branch) &&
        inc.forall(_ == incarnationOf(branchDir(dir, branch))))
      try dropBranch(dir, branch)
      catch { case _: IllegalArgumentException => () } // raced: consumed
    Files.deleteIfExists(marker)
  }

  /** Resolve a `_groupcommit` marker found on `dir`: roll FORWARD when
    * the group decided commit, clean up when it decided abort, ABORT it
    * (winning the decision file) when the coordinator's claims have gone
    * stale, and leave an in-flight young group alone. Cheap when no
    * marker exists — one Files.exists. Called from the scan path's
    * version resolution and from recoverChangelog (every commit/read). */
  def recoverGroupCommit(dir: String): Unit = {
    val marker = Paths.get(dir, GroupMarkerName)
    if (!Files.exists(marker)) return
    val manifest =
      try Paths.get(new String(Files.readAllBytes(marker), "UTF-8").trim)
      catch { case _: java.nio.file.NoSuchFileException => return }
    // only aborted/expired-undecided manifests are ever reclaimed
    // (committed ones are retained indefinitely — they are the
    // roll-forward authority), so a marker referencing a MISSING
    // manifest is an aborted group's straggler
    if (!Files.exists(manifest)) { Files.deleteIfExists(marker); return }
    val decision = groupDecisionPath(manifest)
    val verdict =
      try Some(new String(Files.readAllBytes(decision), "UTF-8").trim)
      catch { case _: java.nio.file.NoSuchFileException => None }
    verdict match {
      case Some("committed") => completeGroupMember(dir)
      case Some(_) => // aborted: the adopted dirs above the pointer are
        // inert (invisible to every reader; vacuum sweeps them)
        Files.deleteIfExists(marker)
      case None =>
        val age =
          try System.currentTimeMillis() -
            Files.getLastModifiedTime(marker).toMillis
          catch { case _: java.nio.file.NoSuchFileException => return }
        if (age > defaultStaleClaimMillis) {
          // the coordinator is presumed dead (markers ride its claim
          // heartbeat while alive): abort by WINNING the decision file —
          // if the zombie wakes it loses its own CREATE_NEW and backs out
          try {
            Files.write(decision, "aborted".getBytes("UTF-8"),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            Files.deleteIfExists(marker)
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              recoverGroupCommit(dir) // decided under us — re-dispatch
          }
        } // else: in-flight; readers keep seeing the pre-publish contents
    }
  }

  /** S46: a CONSISTENT cross-table version snapshot — one version per
    * table such that no table-group publish (S44 `publish_group` /
    * S45 `commit_txn`) is ever observed TORN: the returned cut contains
    * a group's effects on every member or on none. Lock-free
    * double-collect: each pass resolves any decided group first
    * ([[recoverGroupCommit]] — after a group's decision file is durable,
    * EVERY capture of EVERY member reads post-publish), so a member's
    * observed state is a pure function of capture-time vs decision-time;
    * two consecutive EQUAL passes prove each member's two captures
    * landed on the same side of every concurrent group's decision point
    * (pointers only advance — a flip between the passes would change the
    * second read), and the interleaving t1 < t2 < ... < t1' < t2' < ...
    * then places ALL captures on the same side of each decision. Cost:
    * O(members) metadata reads per pass, no claims taken, readers and
    * writers never blocked; bounded retries make continuous publish
    * storms loud instead of unbounded. */
  def snapshotGroup(dirs: Seq[String], maxPasses: Int = 200): Seq[Long] = {
    require(dirs.nonEmpty, "snapshot_group needs at least one table")
    def capture(): Seq[Long] =
      dirs.map { d => recoverGroupCommit(d); currentVersion(d) }
    var prev = capture()
    var pass = 1
    while (pass < maxPasses) {
      val cur = capture()
      if (cur == prev) return cur
      prev = cur
      pass += 1
    }
    throw new IllegalStateException(
      s"snapshot_group could not stabilize after $maxPasses passes over " +
        s"${dirs.size} tables — continuous publishes; retry later")
  }

  // --------------------------------------------------------------------
  // Idempotent writer commits (txnAppId / txnVersion write options): a
  // batch writer stamps each write with an application id and a
  // monotonically increasing version; a write whose (appId, version) is
  // at or below the table's recorded high-water for that app is a NO-OP —
  // so a retried job (Spark task retry frameworks, workflow engines
  // re-running a failed stage, an at-least-once upstream) can never
  // double-append. The record is a `_txn` file INSIDE the version dir —
  // written into the writer-private build dir, so it publishes atomically
  // with the commit itself (no record-vs-data crash window in either
  // order). Expiry promotes records to `_txns/<appId>` so the guarantee
  // survives retention (same pattern as boundary-marker promotion).
  // --------------------------------------------------------------------

  private def txnsRoot(dir: String): Path = Paths.get(dir, "_txns")
  private[sources] val TxnMarker = "_txn"
  private[sources] val TxnAppIdPattern = "[A-Za-z0-9._-]{1,200}"

  /** The recorded high-water txnVersion for `appId`, across retained
    * version dirs (including retired-but-referenced `_expired` hosts —
    * their commits were real; both are at or below the pointer) and
    * expiry-promoted records. POINTER-CAPPED like [[listVersions]]: a
    * final-named dir above the pointer is a crashed commit's (or an
    * in-flight fast_forward adoption's) debris, not committed history —
    * counting its marker would silently no-op the retried idempotent
    * write that heals the crash, and for MV refresh would report a
    * watermark the readable state never folded. */
  def lastTxnVersion(dir: String, appId: String): Option[Long] = {
    val promoted = {
      val p = txnsRoot(dir).resolve(appId)
      if (!Files.exists(p)) None
      else try Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
      catch { case _: Exception => None }
    }
    val cap =
      try currentVersion(dir)
      catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
    val inVersions = listDir(Paths.get(dir))(_.filter { vp =>
        val n = vp.getFileName.toString
        n.matches("v\\d{10}") && n.drop(1).toLong <= cap
      }.toSeq)
      .flatMap { vp =>
        val p = vp.resolve(TxnMarker)
        if (!Files.exists(p)) None
        else try {
          new String(Files.readAllBytes(p), "UTF-8").trim.split('\t') match {
            case Array(app, v) if app == appId => Some(v.toLong)
            case _ => None
          }
        } catch { case _: Exception => None }
      }
    (promoted.toSeq ++ inVersions).maxOption
  }

  private[sources] def writeTxnMarker(buildDir: String, appId: String,
      v: Long): Unit =
    Files.write(Paths.get(buildDir, TxnMarker),
      s"$appId\t$v".getBytes("UTF-8"))

  /** Promote a retiring version dir's `_txn` record to `_txns/<appId>`
    * (keeping the max — re-promotion after a crash is idempotent). The
    * read-modify-write runs under the table's meta lock and publishes by
    * temp + atomic rename: two CONCURRENT expire_versions calls promoting
    * different versions of the same app must never interleave into a
    * regressed high-water (a lost update here silently re-admits a
    * duplicate write — the exact corruption txn records exist to stop),
    * and a torn file must never parse as "no record". IO failures
    * PROPAGATE: the caller must abort this version's retirement (the
    * sweep is crash-resumable), never sweep away the only copy of the
    * high-water record — a swallowed failure here silently re-admits
    * the duplicate write the record exists to block. Only a marker
    * whose CONTENT doesn't parse (torn write of the marker itself, or
    * a foreign file) is treated as carrying no promotable record. */
  private def promoteTxnMarker(vdir: String, dir: String): Unit = {
    val p = Paths.get(vdir, TxnMarker)
    if (!Files.exists(p)) return
    val parsed: Option[(String, Long)] =
      new String(Files.readAllBytes(p), "UTF-8").trim.split('\t') match {
        case Array(app, v) if app.matches(TxnAppIdPattern) =>
          try Some((app, v.toLong))
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    parsed.foreach { case (app, v) =>
      withMetaLock(dir) {
        Files.createDirectories(txnsRoot(dir))
        val dst = txnsRoot(dir).resolve(app)
        val existing =
          if (!Files.exists(dst)) None
          else try Some(new String(Files.readAllBytes(dst), "UTF-8").trim.toLong)
          catch { case _: NumberFormatException => None }
        val hi = math.max(v, existing.getOrElse(Long.MinValue))
        if (!existing.contains(hi)) {
          val tmp = dst.resolveSibling(s".${app}.tmp-${System.nanoTime()}")
          Files.write(tmp, hi.toString.getBytes("UTF-8"))
          Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }
  }

  /** Parse the txnAppId/txnVersion write-option pair, loudly: both or
    * neither, path-safe app id, non-negative version. */
  def parseTxnOptions(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : Option[(String, Long)] = {
    val app = Option(options.get("txnAppId"))
    val ver = Option(options.get("txnVersion"))
    (app, ver) match {
      case (None, None) => None
      case (Some(a), Some(v)) =>
        require(a.matches(TxnAppIdPattern),
          s"txnAppId must match $TxnAppIdPattern, got '$a'")
        val n = try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"txnVersion must be an integer, got '$v'")
        }
        require(n >= 0, s"txnVersion must be non-negative, got $n")
        Some((a, n))
      case _ => throw new IllegalArgumentException(
        "txnAppId and txnVersion must be set together (idempotent writes " +
          "need both the application id and its monotone version)")
    }
  }

  /** Keep the newest `keepLast` versions readable, retire older ones. A
    * retired version whose dir still OWNS files a kept snapshot references
    * (via `_bucketmap`) is marked `_expired` — dropped from the version
    * listing (no time travel to it, no restore) but kept on disk as a file
    * host, with its UNREFERENCED bucket dirs and delete slices reclaimed;
    * its zone-map/fileseq manifests stay (kept snapshots look entries up
    * by owning dir). A retired dir nothing references is deleted outright,
    * and previously-retired hosts are re-swept each call so they shrink to
    * nothing as references age out. */
  def expireVersions(dir: String, keepLast: Int): Unit = {
    val live = listVersions(dir)
    // tagged versions are PINNED: a named ref keeps its version readable
    // (and its referenced slots on disk) regardless of keep_last
    val keep = live.takeRight(math.max(1, keepLast)).toSet ++
      listTags(dir).values.toSet.intersect(live.toSet)
    // (owner version, bucket) pairs some kept snapshot still reads
    val referenced: Set[(Long, String)] = keep.flatMap(v =>
      ownersOf(dir, v).toSeq.flatMap { case (s, os) => os.map(o => (o, s)) })
    // DESCENDING order: a version is marked retired BEFORE any older
    // version that hosts its files is swept. Combined with the per-version
    // tag re-read below, this closes the create_tag window in which a tag
    // on a newer version could verify successfully while this same pass
    // had already deleted the older owner slots its snapshot references —
    // with the marker landing high-to-low, the create's verify either
    // sees the marker (fails loudly, removes its ref) or the tag is
    // visible before any of its owner slots are considered for deletion.
    val retired = (live.filterNot(keep) ++ expiredVersions(dir))
      .distinct.sorted(Ordering[Long].reverse)
    val taggedOwnersCache =
      scala.collection.mutable.Map.empty[Long, Map[String, Seq[Long]]]
    retired.foreach { v =>
      val vdir = versionDir(dir, v)
      // promote the snapshot-boundary marker BEFORE the dir goes away
      // (write-then-delete, so a crash can only leave a true boundary
      // recorded twice, never lose one) — a resuming CDC stream must keep
      // detecting the boundary after the version itself is expired
      if (Files.exists(Paths.get(vdir, "_boundary"))) {
        Files.createDirectories(Paths.get(changesRoot(dir)))
        val m = Paths.get(changesRoot(dir), f"_boundary-$v%010d")
        if (!Files.exists(m)) Files.write(m, Array.empty[Byte])
      }
      // same write-then-delete discipline for idempotent-write records:
      // the (appId, txnVersion) high-water must survive the version dir
      promoteTxnMarker(vdir, dir)
      // slots of THIS version some kept snapshot references — re-reading
      // the tags here (not just in the keep-set upfront) so a tag that
      // landed (or a version that resurrected) mid-pass still protects
      // the owner slots its snapshot reads. listTags is one dir listing;
      // a tagged version's manifest is immutable, so its owner map is
      // read ONCE per pass (the cache below), keeping the sweep linear.
      val tagRef: Set[String] = {
        val tagged = listTags(dir).values.toSet
        if (tagged.isEmpty) Set.empty
        else tagged.intersect(listVersions(dir).toSet).flatMap { tv: Long =>
          taggedOwnersCache.getOrElseUpdate(tv, ownersOf(dir, tv))
            .toSeq.flatMap { case (s, os) =>
              if (os.contains(v)) Some(s) else None }
        }
      }
      val refSlots = referenced.collect { case (`v`, s) => s } ++ tagRef
      // Exclude the version from the readable listing BEFORE anything is
      // deleted: a crash mid-sweep must never leave a still-listed version
      // with some slot dirs gone (`VERSION AS OF` would silently return
      // partial rows). A marked host is re-swept on every later call, so
      // marker-then-sweep is crash-resumable in both branches.
      Files.write(Paths.get(vdir, ExpiredMarker), Array.empty[Byte])
      // a create_tag racing this expiry: the marker is the expiry commit
      // point, so re-check the refs AFTER it and resurrect (unmark, skip)
      // if the version got tagged — create_tag's own write-then-verify
      // (ref first, listing second) makes the two orderings safe: either
      // its verify sees our marker and the create fails, or its ref
      // landed before this re-check and the version survives intact.
      // Only a FRESHLY-retired version may resurrect — a re-swept
      // `_expired` file host is already partial and must stay retired
      // (createTag can never have accepted it: the listing filters marked
      // dirs before anything is deleted) — and only while every owner
      // slot its snapshot references is still intact: a version whose
      // owner slots were already swept earlier IN THIS LOOP (they were
      // unreferenced when the keep-set was computed, pre-tag) would come
      // back partial, so it stays retired and the racing create_tag's
      // verify fails loudly instead.
      def slotsIntact: Boolean = ownersOf(dir, v).forall { case (s, os) =>
        os.forall(o => Files.isDirectory(
          Paths.get(s"${versionDir(dir, o)}/$s")))
      }
      if (live.contains(v) && listTags(dir).values.exists(_ == v) &&
          slotsIntact) {
        Files.deleteIfExists(Paths.get(vdir, ExpiredMarker))
      } else if (refSlots.isEmpty) {
        // rename the whole dir OUT of the version namespace first (the
        // tomb name no longer matches v\d{10}, so it can never be listed
        // again), then sweep the tomb. Deleting in place has a crash
        // window: marker gone, dir still present → the retired version
        // resurrects as a listed, empty, manifest-less version that
        // `VERSION AS OF` silently reads as zero rows and restore accepts.
        val tomb = Paths.get(s"$vdir.expired-${System.nanoTime()}")
        try {
          Files.move(Paths.get(vdir), tomb, StandardCopyOption.ATOMIC_MOVE)
          deleteRecursively(tomb)
        } catch { case _: java.nio.file.NoSuchFileException => () }
      } else {
        localSlots(vdir).filterNot(refSlots).foreach { s =>
          deleteRecursively(Paths.get(vdir, s))
          // clean an emptied gpart parent dir
          val parent = Paths.get(vdir, s).getParent
          if (parent.getFileName.toString.startsWith(s"$PartCol=") &&
              listDir(parent)(_.isEmpty))
            Files.deleteIfExists(parent)
        }
        deleteRecursively(Paths.get(dvRoot(vdir))) // kept snapshots hold links
      }
    }
    // retired version dirs under the table were deleted or mutated — any
    // cached snapshot resolution keyed by their paths is stale now
    invalidateDvCache(dir)
  }

  /** Marker excluding a retired-but-still-referenced version dir from the
    * version listing (see [[expireVersions]]). */
  private[sources] val ExpiredMarker = "_expired"

  private def expiredVersions(dir: String): Seq[Long] =
    listDir(Paths.get(dir))(_.map(_.getFileName.toString)
      .filter(_.matches("v\\d{10}")).map(_.drop(1).toLong).toSeq.sorted)
      .filter(v => Files.exists(Paths.get(versionDir(dir, v), ExpiredMarker)))

  /** Layout stats for one retained version: (buckets, data files, total
    * bytes) over its RESOLVED live file set. Directory metadata only —
    * never reads data. */
  def versionStats(dir: String, v: Long): (Int, Long, Long) = {
    if (!Files.isDirectory(Paths.get(versionDir(dir, v)))) return (0, 0L, 0L)
    val entries = snapshotFileEntries(dir, v)
    val bytes = entries.map { e =>
      if (e.size >= 0) e.size
      else try Files.size(Paths.get(e.path)) catch { case _: Exception => 0L }
    }.sum
    (entries.map(e => slotBucket(e.slot)).distinct.size,
      entries.size.toLong, bytes)
  }

  /** Whether version `v`'s changelog slice is still retained. */
  def hasChangelog(dir: String, v: Long): Boolean =
    Files.isDirectory(Paths.get(changesDir(dir, v)))

  def bucketExpr(keyCols: Seq[String], buckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets.toLong)).cast(IntegerType)

  /** Bucket fan-out columns: the merge key, or — on APPEND-ONLY (keyless)
    * tables — every data column, a deterministic row hash: retried
    * identical batches land in the same slots and the fan-out stays
    * uniform without any key to hash. */
  private[sources] def bucketColsOf(meta: GraftTableMeta): Seq[String] =
    if (meta.keyCols.nonEmpty) meta.keyCols else meta.schema.fieldNames.toSeq

  /** Read one version with PHYSICAL column names + [[BucketCol]] — the
    * exact file layout, for maintenance rewrites that must write the same
    * names back ([[optimize]]). Merge-on-read versions apply their live
    * delete slices here: a key's rows survive only in files at least as
    * new as the key's newest delete entry (broadcast joins — the delete
    * set and the file-seq map are both cap-bounded small). */
  private def readVersionPhysical(spark: SparkSession, dir: String,
      meta: GraftTableMeta, v: Long,
      buckets: Option[Set[Int]] = None,
      slots: Option[Set[String]] = None): DataFrame = {
    val vdir = versionDir(dir, v)
    val withBucket = StructType(physicalSchema(meta.schema).fields :+
      StructField(BucketCol, IntegerType, nullable = true))
    // resolution-based read: the roots are the owner versions' bucket
    // dirs (leaf dirs holding only files — no partition discovery), with
    // the bucket id re-derived from each file's `gbucket=` path segment.
    // A bucket (or finer slot) restriction prunes at FILE-LIST time, the
    // manifest-format equivalent of the old layout's partition pruning.
    val roots = resolvedSlotDirs(dir, v, buckets)
      .filter { case (s, _) => slots.forall(_.contains(s)) }
      .flatMap(_._2)
    if (roots.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), withBucket)
    else {
      val base = spark.read.schema(physicalSchema(meta.schema))
        .parquet(roots: _*)
        .withColumn(BucketCol, regexp_extract(input_file_name(),
          s"$BucketCol=(\\d+)/", 1).cast(IntegerType))
      readDv(spark, vdir) match {
        case None => base
        case Some(dv) =>
          val physKeys = meta.keyCols.map(k => physicalName(meta.schema(k)))
          val seqRows = resolvedFileSeq(dir, v).toSeq.map {
            case (rel, s) => Row(rel, s)
          }
          val seqDf = spark.createDataFrame(seqRows.asJava,
            StructType(Seq(StructField("__rel", StringType, nullable = false),
              StructField("__fseq", LongType, nullable = false))))
          val dvAgg = dv.groupBy(physKeys.map(col): _*)
            .agg(max(col(DvSeqCol)).as("__dvseq"))
          base
            .withColumn("__rel",
              regexp_extract(input_file_name(), "/v\\d{10}/(.+)$", 1))
            .join(broadcast(seqDf), Seq("__rel"), "left_outer")
            .join(broadcast(dvAgg), physKeys, "left_outer")
            // keep unless a delete NEWER than the row's file exists for
            // its key; an unmapped file (legacy carry) counts as seq 0
            .filter(col("__dvseq").isNull ||
              col("__dvseq") <= coalesce(col("__fseq"), lit(0L)))
            .select(withBucket.fieldNames.toIndexedSeq.map(col): _*)
      }
    }
  }

  /** Read one version as a logical-named DataFrame including the
    * [[BucketCol]] partition column (empty-but-typed when the version has
    * no data yet). */
  def readVersion(spark: SparkSession, dir: String, v: Long,
      buckets: Option[Set[Int]] = None): DataFrame = {
    val meta = readMeta(dir)
    toLogical(readVersionPhysical(spark, dir, meta, v, buckets), meta.schema)
  }

  /** Re-base a change batch built against a WRITER-PINNED schema onto the
    * table's current one — the DDL-during-live-writer contract. A long
    * writer (a streaming upsert's epochs, a batch MERGE's rewrite job)
    * captures the table meta when it starts; an ALTER landing mid-flight
    * would otherwise crash the commit on a column-list mismatch (or worse,
    * resurrect a dropped column). Columns map by PHYSICAL identity, which
    * makes every evolution case fall out: RENAME follows (same physical,
    * new logical name), DROP discards the writer's values for the dead
    * column, a tombstoned re-ADD gets nulls (the writer's values belong to
    * the OLD physical column and must not leak into the fresh one), new
    * columns null-fill, widened types up-cast. Identity when the schema
    * hasn't changed — the hot path costs one reference comparison. */
  def alignToCurrentSchema(changes: DataFrame, captured: GraftTableMeta,
      current: GraftTableMeta): DataFrame = {
    if (captured.schema == current.schema) return changes
    val curByPhys = current.schema.fields.map(f => physicalName(f) -> f).toMap
    val mappedCols = captured.schema.fields.toSeq.flatMap { f =>
      curByPhys.get(physicalName(f))
        .map(cf => col(f.name).cast(cf.dataType).as(cf.name))
    }
    val mapped = changes.select(col(OpCol) +: mappedCols: _*)
    current.schema.fields.filterNot(f => mapped.columns.contains(f.name))
      .foldLeft(mapped)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  /** Apply a change batch. `changes` columns: [[OpCol]] (one of I/U/D) plus
    * the full table schema (delete rows carry the key columns, the rest
    * null). Returns the committed version.
    *
    * `allInserts = true` (the INSERT INTO path) takes the append fast
    * path: no base read, no joins — new files land NEXT TO the previous
    * version's hard-linked files inside the same bucket directories, so an
    * append is O(new data) regardless of table size. The general path
    * (MERGE/UPDATE/DELETE deltas) rewrites only the touched buckets and
    * enriches the changelog with before-images.
    *
    * `overwrite = true` (INSERT OVERWRITE) replaces the whole table in ONE
    * version commit: the new data is written, no prior bucket is linked,
    * and the pointer flips once — readers see the old content or the new,
    * never an empty table in between, and a crash leaves the old version
    * current (the two-commit truncate+append shape had both holes, r7
    * ADVICE). Like TRUNCATE, an overwrite writes NO changelog slice — a
    * changelog never spans a truncation, and the MISSING slice is the
    * detectable boundary (`hasChangelog(v) == false`): a CDC consumer
    * folding past it would silently resurrect overwritten rows, so it
    * must re-snapshot instead. */
  /** `smallBatchHint`: the caller asserts (from metadata it holds — e.g.
    * the MV layer's prior-state byte size) that this all-insert batch is
    * small enough for one write task. The data leg then coalesces to a
    * single task instead of paying an AQE rebalance round — the right
    * plan for a small rollup state over an arbitrarily large fact. Purely
    * advisory: ignored for keyed deltas (their own measured smallKeyed
    * bound governs), and a wrong hint costs one oversized file, never
    * correctness. */
  def applyChanges(spark: SparkSession, dir: String, changes0: DataFrame,
      allInserts: Boolean = false, overwrite: Boolean = false,
      commutative: Boolean = false,
      expectedVersion: Option[Long] = None,
      heartbeatPaths: Seq[Path] = Nil,
      capturedMeta: Option[GraftTableMeta] = None,
      txn: Option[(String, Long)] = None,
      smallBatchHint: Boolean = false): Long = {
    require(!overwrite || allInserts, "overwrite implies an all-insert batch")
    // idempotent-write fast path: an (appId, version) at or below the
    // recorded high-water is a retry of an already-applied write — no-op
    // before any job runs. The authoritative re-check happens under the
    // commit claim below (two racing retries serialize there).
    if (txn.exists { case (a, v) => lastTxnVersion(dir, a).exists(_ >= v) })
      return currentVersion(dir)
    val meta = readMeta(dir)
    // keyless tables have NO row identity: nothing to anti-join a delete
    // or upsert against. Appends (and whole-table overwrites) are the
    // only write shapes — reject the rest before any job runs.
    require(allInserts || meta.keyCols.nonEmpty,
      s"$dir is an APPEND-ONLY table (no merge key): UPDATE/DELETE/MERGE " +
        "and keyed upserts are not supported — use INSERT, " +
        "INSERT OVERWRITE, REPLACE WHERE, or expire_partitions")
    // align against the SAME meta snapshot this commit buckets and selects
    // with — callers aligning separately and then racing a fresh ALTER
    // here would reintroduce the column-list mismatch
    val changes = capturedMeta
      .map(cm => alignToCurrentSchema(changes0, cm, meta))
      .getOrElse(changes0)
    recoverChangelog(dir)

    // The change batch is bucketed by the CURRENT VERSION's layout count
    // (the per-version `_buckets` marker), re-derived per attempt: a
    // concurrent `CALL rebucket` landing between attempts changes the
    // fan-out, and rows bucketed under the old count written into the new
    // layout would strand keys in directories their hash no longer maps
    // to. The common case is one attempt and one persist.
    var bucketedFor = -1
    var ch: DataFrame = null
    var touched = Set.empty[Int]
    var smallKeyed = false
    def bucketFor(n: Int): Unit = if (bucketedFor != n) {
      if (ch != null) ch.unpersist()
      // persist serves the batch's MULTIPLE consumers (touched-set job +
      // both commit legs). An overwrite commit has exactly one — the
      // data-leg write (no changelog, no touched set) — so caching it is
      // a pure extra pass over the batch; for MV state overwrites the
      // "batch" is the whole folded view, so the pass is O(|view|).
      val bucketed = changes
        .withColumn(BucketCol, bucketExpr(bucketColsOf(meta), n))
      ch = if (allInserts && overwrite) bucketed else bucketed.persist()
      // ≤ `buckets` (bucket, count) rows — the one driver-side
      // materialization (same single job the old distinct-collect ran,
      // upgraded to also count rows: the count + the materialized cache's
      // byte size decide the small-batch broadcast legs below). The
      // append fast path never reads the base, so it skips this job
      // entirely (its "touched" set would only gate work it doesn't do).
      if (allInserts) touched = Set.empty[Int]
      else {
        val perBucket = ch.groupBy(col(BucketCol)).count().collect()
        touched = perBucket.map(_.getInt(0)).toSet
        val rows = perBucket.map(_.getLong(1)).sum
        // post-materialization the InMemoryRelation's stats carry the
        // exact cached byte size — a zero-job broadcast-safety bound.
        // The cached bytes alone UNDERSTATE the broadcast footprint: the
        // changelog leg broadcasts up to `rows` FULL-WIDTH base
        // before-images, while a delete batch caches only its key
        // columns (nulls compress to ~nothing) — so also bound
        // rows × the base schema's estimated row width, the size the
        // before-image broadcast can actually reach (r16 ADVICE).
        val cachedBytes = ch.queryExecution.optimizedPlan.stats.sizeInBytes
        val rowWidth = meta.schema.fields.map(_.dataType.defaultSize).sum
        val maxBytes = commitBroadcastMaxBytes(spark)
        smallKeyed = rows <= commitBroadcastMaxRows(spark) &&
          cachedBytes <= BigInt(maxBytes) &&
          rows * math.max(1L, rowWidth.toLong) <= maxBytes
      }
      bucketedFor = n
    }
    try {
      // Claim-verify-commit loop. claimCommit serializes writers per
      // version; after winning the claim we re-read the pointer — a claim
      // for `next` can be won AFTER another writer committed `next` and
      // released (stale pre-claim read), and flipping then would regress
      // the store. Appends commute, so a losing append retries on the
      // recomputed version; a row-level delta's read snapshot is stale the
      // moment another commit lands, so it surfaces the conflict instead.
      // a losing append waits out the winner's WHOLE commit job, so the
      // retry budget is wall-clock-sized (~60 s), not a fixed count.
      // `commutative` marks keyed-upsert batches whose outcome doesn't
      // depend on the base snapshot (streaming upsert epochs) — they
      // rebase-and-retry like appends; SQL deltas stay strict.
      val retriable = allInserts || commutative
      val maxAttempts = if (retriable) 120 else 1
      var attempt = 0
      var committed = -1L
      while (committed < 0) {
        val cur = currentVersion(dir)
        val next = cur + 1
        bucketFor(layoutBuckets(dir, cur, meta))
        // a row-level delta pins its READ SNAPSHOT when its target scan is
        // planned; if the table has moved since — anywhere in the long
        // scan-to-commit window, not just inside this loop — the delta is
        // stale and must conflict, never silently rebase over the
        // intervening commit
        expectedVersion.filter(_ != cur).foreach { v =>
          throw new java.util.ConcurrentModificationException(
            s"table $dir advanced from the statement's snapshot v$v to " +
              s"v$cur during the rewrite; re-run the statement")
        }
        val claimed =
          try Some(claimCommit(dir, next))
          catch {
            case e: java.util.ConcurrentModificationException =>
              attempt += 1
              if (attempt >= maxAttempts) throw e
              Thread.sleep(math.min(500L, 20L * attempt))
              None
          }
        claimed.foreach { case (marker, token) =>
          try {
            if (currentVersion(dir) == cur) {
              // heartbeat for the whole rewrite: the claim marker (so a
              // long commit's claim never reads as stale) and the caller's
              // staging dirs (so vacuum never reaps in-use .bin files the
              // decode jobs read lazily until the last leg finishes)
              // heartbeat also covers the writer-private build dir so a
              // very long rewrite can't age past vacuum's threshold
              val buildPath = Paths.get(s"${versionDir(dir, next)}.build-$token")
              // authoritative idempotence check: the claim serializes
              // writers per version, so a racing retry of the same
              // (appId, txnVersion) that lost the earlier claim sees the
              // winner's published record here and no-ops
              if (txn.exists { case (a, v) =>
                    lastTxnVersion(dir, a).exists(_ >= v) }) {
                committed = cur
              } else committed = withClaimHeartbeat(marker +: buildPath +: heartbeatPaths) {
                commitVersion(spark, dir, meta, ch, touched,
                  cur, allInserts, overwrite, bucketedFor, marker, token, txn,
                  smallKeyed, smallBatchHint)
              }
            } else {
              // claim won but the pointer moved first (stale pre-claim
              // read): count it against the retry budget and back off —
              // without this a contended writer busy-spins claim/release
              if (!retriable) throw new java.util.ConcurrentModificationException(
                s"table $dir advanced past version $cur during the delta " +
                  "rewrite; re-run the statement against the new version")
              attempt += 1
              if (attempt >= maxAttempts) throw new java.util.ConcurrentModificationException(
                s"table $dir under sustained write contention; gave up after $attempt attempts")
              Thread.sleep(math.min(500L, 20L * attempt))
            }
          } finally releaseClaim(marker, token)
        }
      }
      // auto_optimize: close the fragmentation loop inline — bounded to
      // the slots THIS commit wrote, and only when one of them crossed
      // the cap (optimize itself rewrites only over-cap slots, so cold
      // slots are never touched). Contention is the expected failure
      // (another writer or optimizer holds the next claim): skip, the
      // next commit's hook retries. The DML itself has already
      // committed; real IO failures propagate loudly.
      autoOptimizeIfNeeded(spark, dir, meta, committed)
      committed
    } finally if (ch != null) ch.unpersist()
  }

  /** Inline slot-scoped compaction after a commit on an
    * `auto_optimize` table — see [[GraftTableMeta.autoOptimize]]. */
  private def autoOptimizeIfNeeded(spark: SparkSession, dir: String,
      meta: GraftTableMeta, committed: Long): Unit = {
    val cap = meta.autoOptimize
    if (cap <= 0) return
    val own = localSlots(versionDir(dir, committed))
    if (own.isEmpty) return
    val owners = ownersOf(dir, committed)
    val hot = own.exists { s =>
      owners.getOrElse(s, Nil).map(o =>
        listBucketFiles(s"${versionDir(dir, o)}/$s").size).sum > cap
    }
    if (hot)
      try optimize(spark, dir, cap)
      catch { case _: java.util.ConcurrentModificationException => () }
  }

  /** One claimed commit attempt: build version `cur + 1` from the bucketed
    * change batch and flip the pointer. Caller holds the commit claim (and
    * its heartbeat); ownership is re-verified immediately before the flip. */
  private def commitVersion(spark: SparkSession, dir: String,
      meta: GraftTableMeta, ch: DataFrame, touched: Set[Int], cur: Long,
      allInserts: Boolean, overwrite: Boolean, buckets: Int,
      marker: Path, token: String,
      txn: Option[(String, Long)] = None,
      smallKeyed: Boolean = false,
      smallBatchHint: Boolean = false): Long = {
    val next = cur + 1
    val nextDir = versionDir(dir, next)
    // writer-private build dir: the final vN name appears only after the
    // last ownership re-check (see publishVersion)
    val buildDir = s"$nextDir.build-$token"
    deleteRecursively(Paths.get(buildDir))
    val cols = meta.schema.fieldNames.toSeq
    locally {
      val curDir = versionDir(dir, cur)

      // Merge-on-read decision. A 'mor' table's row-level delta writes the
      // after-images + an equality-delete slice instead of rewriting its
      // touched buckets — unless the LIVE delete set would outgrow the cap,
      // in which case THIS commit escalates to the copy-on-write rewrite
      // over (touched ∪ every DV-carrying bucket), applying and clearing
      // all slices in one claimed commit (the LSM-style compaction bound:
      // the reader's probe set can never exceed the cap).
      val morRequested = meta.mergeMode == "mor" && !allInserts &&
        !overwrite && touched.nonEmpty

      // the LAYOUT's partition spec: new dirs are written under the grain
      // the current layout declares (set_partition_spec evolves it), and
      // the commit stamps its own marker so readers interpret its dirs
      // under the era they were written with
      val curPartSpec = layoutPartSpec(dir, cur, meta)

      // Changelog leg: persist the change batch itself, one immutable dir
      // per version. Written to a dot-prefixed STAGING dir now and renamed
      // to its visible `change_version=N` name only after the pointer
      // flips (see recoverChangelog) — changelog readers can never observe
      // an uncommitted batch. Each U/D row is enriched with its BEFORE
      // image (the replaced base row as a struct — Debezium-shaped), which
      // is what lets downstream aggregates be maintained incrementally
      // (add `after`, retract `before`) instead of recomputed; the
      // pre-image join reuses the same touched-bucket base read the
      // rewrite needs anyway, and the all-insert path skips both. Cost ∝
      // rows changed. TRUNCATE intentionally writes no changelog — a
      // changelog never spans a truncation; consumers re-snapshot.
      val chDir = changesStaging(dir, next)
      deleteRecursively(Paths.get(chDir))
      val nullBefore = {
        val structType = StructType(meta.schema.fields.map(_.copy(nullable = true)).toSeq)
        lit(null).cast(structType).as(ChangeBeforeCol)
      }
      // Files store PHYSICAL names (flat columns AND the before-image's
      // inner fields — the struct cast renames by position), so renames
      // stay metadata-only across the whole changelog history.
      val physBefore = StructType(physicalSchema(meta.schema)
        .fields.map(_.copy(nullable = true)).toSeq)
      def writeChangelog(df: DataFrame): Unit =
        // right-size the slice's file count to its data volume — CDC
        // readers stream every slice, so a 32-task commit must not cost
        // them 32 near-empty file opens. Small keyed batches coalesce to
        // one file with NO exchange (the broadcast plan's output is a
        // handful of tiny cached partitions); everything else rebalances
        toPhysical(df.withColumn(ChangeBeforeCol,
            col(ChangeBeforeCol).cast(physBefore)), meta.schema)
          .transform(d => if (smallKeyed && !allInserts) d.coalesce(1)
            else d.hint("rebalance"))
          .write.parquet(chDir)
      // All-insert commits: the data files ARE the changelog rows — the op
      // is the constant 'I' and the before-image the constant NULL, so the
      // data leg writes those two columns into its files (constant-encoded:
      // a dictionary page and definition levels, ~bytes per file) and the
      // changelog slice is built by HARD-LINKING the data files instead of
      // running a second Spark shuffle+write over the whole batch. Appends
      // are the dominant write shape at scale; this halves their write
      // amplification. Data readers are unaffected (every data read
      // projects the declared physical schema, and the changelog column
      // names are reserved at CREATE/ALTER time); changelog readers see
      // the exact rows+columns the old slice write produced.
      val linkChangelog = allInserts && !overwrite
      val baseTouched = () => readVersion(spark, dir, cur, Some(touched))
      val changelogLeg: () => Unit = () =>
        if (allInserts) {
          writeChangelog(ch.select((OpCol +: cols).map(col) :+ nullBefore: _*)
            .withColumnRenamed(OpCol, ChangeOpCol)
            .select((cols :+ ChangeOpCol :+ ChangeBeforeCol).map(col): _*))
        } else {
          // small batch: semi-filter the base's before-images down to the
          // batch's keys through a broadcast of the (bounded) key set,
          // then broadcast the filtered images into the left-outer attach
          // — the touched-bucket base is scanned once and never shuffled
          // (a point UPDATE over a billion-row bucket moves its changed
          // keys, not the bucket). Large batches keep the shuffle join.
          val beforeImages0 = baseTouched()
            .select(struct(cols.map(col): _*).as(ChangeBeforeCol) +:
              meta.keyCols.map(col): _*)
          val beforeImages =
            if (smallKeyed)
              broadcast(beforeImages0.join(
                broadcast(ch.select(meta.keyCols.map(col): _*)),
                meta.keyCols, "left_semi"))
            else beforeImages0
          writeChangelog(ch.select((OpCol +: cols).map(col): _*)
            .join(beforeImages, meta.keyCols, "left_outer")
            .withColumn(ChangeBeforeCol,
              when(col(OpCol) === "I", lit(null)).otherwise(col(ChangeBeforeCol)))
            .withColumnRenamed(OpCol, ChangeOpCol)
            .select((cols :+ ChangeOpCol :+ ChangeBeforeCol).map(col): _*))
        }

      // Data leg. Append fast path: write only the new rows; every
      // existing bucket's files are hard-linked alongside (part-file names
      // are job-unique, so dirs merge safely). General path: rewrite
      // touched buckets (anti-join out removed keys, union adds), link
      // the untouched ones.
      //
      // Both paths REBALANCE on the bucket column before the write: a
      // partitionBy write emits one file per (task × bucket), so an
      // unrebalanced commit's file count tracks the UPSTREAM task count —
      // a 32-task batch into 8 buckets writes ~250 near-empty files, and a
      // 1000-task append into 64 buckets would write 64k; every subsequent
      // touched-bucket read then pays per-file listing/footer cost. The
      // rebalance hint makes file count track DATA size instead: AQE
      // coalesces a small batch to a handful of tasks and skew-splits a
      // huge bucket into target-sized ones (so bucket count never caps
      // write parallelism the way a plain repartition(buckets) would).
      // the copy-on-write rewrite: anti-join removed keys out of the kept
      // buckets, union the after-images, write the whole touched set.
      // `buckets` ⊇ the change batch's touched set; under delete-cap
      // escalation it also folds in every DV-carrying bucket, whose
      // (merge-on-read-applied) live rows re-materialize plainly —
      // clearing the slices.
      def cowRewrite(rewriteBuckets: Set[Int]): Set[Int] = {
        // small batch: broadcast the removed keys into the anti-join —
        // the kept base streams through unshuffled (and undistincted
        // duplicates in the build side cannot change an anti-join's
        // result, so the batch skips the dedup exchange too). Large
        // batches keep the distinct + shuffle join.
        val removes0 = ch.filter(col(OpCol).isin("U", "D"))
          .select(meta.keyCols.map(col): _*)
        val removes =
          if (smallKeyed) broadcast(removes0) else removes0.distinct()
        val adds = ch.filter(col(OpCol).isin("I", "U"))
          .select((cols :+ BucketCol).map(col): _*)
        val keptBase = readVersion(spark, dir, cur, Some(rewriteBuckets))
        val kept = keptBase.join(removes, meta.keyCols, "left_anti")
          .select((cols :+ BucketCol).map(col): _*)
        withPartCol(toPhysical(kept.unionByName(adds), meta.schema), meta,
            curPartSpec)
          .hint("rebalance", layoutCols(meta).map(col): _*)
          .write.options(bloomOptions(meta))
            .partitionBy(layoutCols(meta): _*).parquet(buildDir)
        rewriteBuckets
      }

      val dataLeg: () => Set[Int] = () =>
        if (allInserts) {
          // unconditional write: an empty batch produces an empty version
          // dir, and skipping the touched-set job saves one Spark action
          // per append
          withPartCol(toPhysical(
              ch.select((cols :+ BucketCol).map(col): _*), meta.schema),
              meta, curPartSpec)
            // see linkChangelog above: the constant changelog columns ride
            // the data files so the slice can link instead of re-write
            .transform(d => if (linkChangelog)
              d.withColumn(ChangeOpCol, lit("I"))
                .withColumn(ChangeBeforeCol, lit(null).cast(physBefore))
              else d)
            // smallBatchHint (caller-asserted small batch, e.g. an MV
            // state ∝ |view|): one write task, no AQE rebalance round —
            // partitionBy still splits one file per slot
            .transform(d => if (smallBatchHint) d.coalesce(1)
              else d.hint("rebalance", layoutCols(meta).map(col): _*))
            .write.options(bloomOptions(meta))
            .partitionBy(layoutCols(meta): _*).parquet(buildDir)
          Set.empty
        } else if (morRequested) {
          // merge-on-read: after-images land like an append; removed keys
          // land as an equality-delete slice under _dv/dseq=<next>. Every
          // base bucket (and every still-live older slice) hard-links over
          // — the commit writes O(changed rows), never O(touched buckets).
          // The cap decision is made AFTER the slice write from its parquet
          // footers (free metadata reads) instead of a separate count job —
          // the common path pays zero extra passes over the change batch;
          // only the rare over-cap commit discards this small staged write
          // and escalates.
          // both merge-on-read legs write O(batch) bytes, so a small batch
          // (same bound as the broadcast legs) coalesces to one task with
          // no exchange — partitionBy still splits per slot, and one task
          // per tiny slice beats an AQE rebalance round per write
          def sizeSlice(df: DataFrame, cols: Seq[Column]): DataFrame =
            if (smallKeyed) df.coalesce(1) else df.hint("rebalance", cols: _*)
          sizeSlice(withPartCol(toPhysical(ch.filter(col(OpCol).isin("I", "U"))
              .select((cols :+ BucketCol).map(col): _*), meta.schema),
              meta, curPartSpec), layoutCols(meta).map(col))
            .write.options(bloomOptions(meta))
            .partitionBy(layoutCols(meta): _*).parquet(buildDir)
          sizeSlice(toPhysical(ch.filter(col(OpCol).isin("U", "D"))
              .select((meta.keyCols :+ BucketCol).map(col): _*).distinct(),
              meta.schema), Seq(col(BucketCol)))
            .write.partitionBy(BucketCol)
            .parquet(s"$buildDir/$DvDirName/$DvSeqCol=$next")
          val newRemoveRows = dvLiveRows(buildDir)
          // subtraction form: dvLiveRows saturates to Long.MaxValue on a
          // corrupt footer, and MaxValue + n would WRAP past the cap —
          // `live <= cap - new` keeps the forced escalation intact
          if (dvLiveRows(curDir) <= morMaxLiveDeletes - newRemoveRows) {
            if (newRemoveRows == 0) // nothing removed: no slice to keep
              deleteRecursively(Paths.get(dvRoot(buildDir)))
            Set.empty
          } else {
            // escalate: discard the staged merge-on-read build and rewrite
            // (touched ∪ every DV-carrying bucket) copy-on-write, applying
            // and clearing all slices in one claimed commit — the
            // LSM-style bound keeping the reader's probe set under the cap
            deleteRecursively(Paths.get(buildDir))
            cowRewrite(touched ++ dvBuckets(curDir))
          }
        } else if (touched.nonEmpty) {
          cowRewrite(touched)
        } else {
          Files.createDirectories(Paths.get(buildDir))
          Set.empty
        }

      // The two legs write to DIFFERENT staging locations from the same
      // persisted change batch — run their Spark jobs concurrently (the
      // commit's latency is then max(legs), not their sum; per-statement
      // overhead matters when a pipeline issues many small commits).
      val rewritten: Set[Int] = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        val chF =
          if (overwrite || linkChangelog)
            Future.successful(()) // no separate changelog write
          else Future(changelogLeg())(commitPool)
        val dataF = Future(dataLeg())(commitPool)
        try {
          val r = Await.result(dataF, Duration.Inf)
          Await.result(chF, Duration.Inf)
          // link AFTER the data write: the slice is the data files
          if (linkChangelog) linkChangelogSlice(buildDir, chDir)
          r
        } catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }

      // Carry untouched buckets by MANIFEST REFERENCE: the new version's
      // `_bucketmap` points at the owner versions still holding their
      // files — one line per bucket, never a per-file pass. Buckets this
      // commit rewrote own themselves; buckets it appended to gain `next`
      // as an additional owner; an overwrite carries nothing (the new
      // data IS the version).
      val local = localSlots(buildDir).toSet
      val prevOwners =
        if (overwrite) Map.empty[String, Seq[Long]] else ownersOf(dir, cur)
      val newMap = (prevOwners.keySet ++ local).flatMap { slot =>
        val owners =
          if (rewritten.contains(slotBucket(slot)) || overwrite)
            if (local.contains(slot)) Seq(next) else Seq.empty
          else prevOwners.getOrElse(slot, Seq.empty) ++
            (if (local.contains(slot)) Seq(next) else Seq.empty)
        if (owners.isEmpty) None else Some(slot -> owners)
      }.toMap
      writeBucketMap(buildDir, newMap)
      // carry still-live delete slices for buckets NOT rewritten this
      // commit (a rewrite APPLIES its buckets' deletes; an overwrite
      // starts from nothing). Physical links stay correct here: the live
      // delete set is cap-bounded, so this is O(changed rows), not
      // O(table).
      if (!overwrite) linkDvCarry(curDir, buildDir, rewritten)
      // per-file write-version manifest for the LOCAL files (all stamped
      // `next` — a file now lives forever in the version dir that wrote
      // it); carried files keep their seqs in their own owners' manifests
      writeFileSeq(buildDir, None, next)
      // A remnant final-named change dir for `next` can only predate this
      // commit (publication always happens after the flip, so a live one
      // would imply pointer >= next). Clear it BEFORE the flip — after the
      // flip a dir under the final name may be our own batch, published by
      // a concurrent reader's recoverChangelog the instant the pointer
      // moved, and deleting it then would destroy the committed changelog
      // (r7 ADVICE race).
      val chFinal = Paths.get(changesDir(dir, next))
      deleteRecursively(chFinal)
      // zone maps: footer stats for the LOCAL files only (cost ∝ files
      // written); carried files' entries live in their owner versions'
      // manifests, which is where the scan looks them up (per-file path →
      // owning version dir)
      GraftStats.writeManifest(buildDir, None)
      writeBucketMarker(buildDir, buckets)
      writePartSpecMarker(buildDir, curPartSpec)
      if (overwrite) writeBoundaryMarker(buildDir) // snapshot boundary for CDC
      // idempotent-write record publishes atomically WITH the commit: in
      // the build dir before the rename, so neither "recorded but not
      // committed" (lost write on retry) nor "committed but not recorded"
      // (duplicate on retry) can exist after a crash
      txn.foreach { case (a, v) => writeTxnMarker(buildDir, a, v) }
      // a commit that outlived even the heartbeat-refreshed stale window
      // (or whose heartbeat was starved) may have lost its claim to a
      // takeover — re-verify ownership at the last instant so we never
      // flip a pointer onto a version another writer now owns
      verifyClaim(marker, token)
      publishVersion(buildDir, nextDir)
      writePointer(dir, next)
      // Publish the changelog: visible name only after the commit point.
      // If staging is already gone, a reader won the publish — done.
      if (!overwrite) {
        try Files.move(Paths.get(chDir), chFinal, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.NoSuchFileException if Files.exists(chFinal) => ()
          case _: java.nio.file.FileAlreadyExistsException => ()
        }
      }
      next
    }
  }

  /** Compact fragmented slots — the maintenance pass that keeps the
    * append fast path honest: INSERT lands new files next to carried
    * references, so a slot accumulates one file per append until
    * rewritten. Leaf slot dirs (`[gpart=v/]gbucket=k` — the bucket itself
    * on unpartitioned tables) with more than `maxFilesPerBucket` files are
    * rewritten (→ one compact file each); the rest carry by reference. The
    * commit is a normal version bump with NO changelog entry — compaction
    * changes layout, not content, so CDC consumers see nothing. Old
    * versions still reference the fragmented files (time travel is
    * unaffected) until [[expireVersions]] drops them. Returns the new
    * version, or the current one if nothing is fragmented.
    *
    * `sortWithin` clusters each rewritten bucket by the given columns
    * (Z-less liquid-clustering): rows land in sorted row groups, so the
    * parquet min/max statistics make range predicates on those columns
    * skip whole row groups — the scan-narrowing complement to the
    * key-hash bucket pruning. Layout-only, like the rest of compaction.
    *
    * `targetFileRows` > 0 caps rows per output file: at 100 TB "one
    * compact file per bucket" is an unbounded file — the cap splits each
    * bucket's (sorted) run into bounded files, and because a sorted run
    * cuts into RANGE-DISJOINT pieces, the commit's zone maps
    * ([[GraftStats]]) then prune range predicates to the few overlapping
    * files WITHIN a bucket, not just across commits.
    *
    * `zorderBy` (exactly two columns) clusters each rewritten bucket by
    * the Morton interleave of both columns instead of a lexicographic
    * sort: with `targetFileRows` each file covers a narrow rectangle in
    * BOTH dimensions, so zone maps prune selective predicates on EITHER
    * column — the layout a single-column sort only provides for its own
    * column (the `OPTIMIZE ZORDER BY` analogue; bounds come from one tiny
    * broadcast aggregate, never a collect). */
  def optimize(spark: SparkSession, dir: String,
      maxFilesPerBucket: Int = 4, sortWithin: Seq[String] = Nil,
      targetFileRows: Long = 0L, zorderBy: Seq[String] = Nil): Long = {
    require(zorderBy.isEmpty || zorderBy.size == 2,
      s"zorder_by takes exactly two columns, got $zorderBy")
    require(zorderBy.isEmpty || sortWithin.isEmpty,
      "sort_by and zorder_by are mutually exclusive")
    recoverChangelog(dir)
    val cur = currentVersion(dir)
    val curDir = versionDir(dir, cur)
    // Fragmentation is SLOT-scoped: a leaf dir (`[gpart=v/]gbucket=k`)
    // over the threshold rewrites ALONE — compacting a hot day's bucket
    // never rewrites that bucket's cold history (pre-r13 the count summed
    // across partitions, so a long date-partitioned table read as
    // permanently fragmented and every optimize rewrote whole buckets
    // across every partition — O(bucket × history) instead of O(hot
    // slots)). Unpartitioned tables are unchanged (slot == bucket).
    // Buckets carrying live merge-on-read delete slices rewrite ALL their
    // slots: a delete entry can suppress rows in any partition, so
    // clearing the slice requires applying it everywhere — which is what
    // returns a 'mor' table to plain scans (no probe, restored agg
    // pushdown / exact stats).
    val dvB = dvBuckets(curDir)
    val fragmented = slotFileCounts(dir, cur).collect {
      case (s, n) if n > maxFilesPerBucket || dvB.contains(slotBucket(s)) => s
    }.toSet
    // a DV-carrying bucket whose live slots ALL fell away (e.g. an
    // expire_partitions dropped every partition it had files in) leaves
    // orphaned slices: unreachable-dead for reads, but they'd keep the
    // table in mor-scan mode (probe + withheld stats) forever — the
    // clearing commit below must still run, with nothing to rewrite
    if (fragmented.isEmpty && dvB.isEmpty) return cur
    val next = cur + 1
    val (marker, token) = claimCommit(dir, next)
    try withClaimHeartbeat(Seq(marker,
        Paths.get(s"${versionDir(dir, next)}.build-$token"))) {
      if (currentVersion(dir) != cur)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past version $cur during OPTIMIZE; re-run")
      val nextDir = versionDir(dir, next)
      val buildDir = s"$nextDir.build-$token"
      deleteRecursively(Paths.get(buildDir))
      // repartition BY the layout columns: each slot's rows land wholly in
      // one task, so partitionBy writes exactly one compact file per slot.
      // Task count caps at 4× the cores — a full compaction of a
      // many-slot table hashes several slots per task without losing the
      // one-file-per-slot property (partitionBy splits by dir). Physical-
      // named read → physical-named write: compaction never touches the
      // logical mapping.
      val meta = readMeta(dir)
      val sortPhys = sortWithin.map(c => physicalName(meta.schema(c)))
      val nTasks = math.max(1, math.min(fragmented.size,
        spark.sparkContext.defaultParallelism * 4))
      val rep = withPartCol(
          readVersionPhysical(spark, dir, meta, cur, slots = Some(fragmented)),
          meta, layoutPartSpec(dir, cur, meta))
        .repartition(nTasks, layoutCols(meta).map(col): _*)
      val clustered =
        if (zorderBy.nonEmpty) {
          val Seq(zx, zy) = zorderBy.map(c => physicalName(meta.schema(c)))
          graft.Graft.withZValue(rep, zx, zy, "__z")
            .sortWithinPartitions(layoutCols(meta).map(col) :+ col("__z"): _*)
            .drop("__z")
        } else if (sortPhys.isEmpty) rep
        else rep.sortWithinPartitions(
          (layoutCols(meta) ++ sortPhys).map(col): _*)
      val writer =
        (if (targetFileRows > 0)
          clustered.write.option("maxRecordsPerFile", targetFileRows)
        else clustered.write).options(bloomOptions(meta))
      writer.partitionBy(layoutCols(meta): _*).parquet(buildDir)
      // carry the un-fragmented slots by manifest reference; rewritten
      // slots own themselves (a slot whose live rows all fell to deletes
      // simply leaves the map)
      val local = localSlots(buildDir).toSet
      val prevOwners = ownersOf(dir, cur)
      writeBucketMap(buildDir, (prevOwners.keySet ++ local)
        .flatMap { slot =>
          if (fragmented.contains(slot))
            if (local.contains(slot)) Some(slot -> Seq(next)) else None
          else prevOwners.get(slot).map(slot -> _)
        }.toMap)
      // every slot of every DV-carrying bucket is in `fragmented`, so no
      // delete slice survives compaction; rewrites stamp `next` (≥ any
      // dseq — stale
      // entries could never match even if one leaked); carried files keep
      // their seqs in their owners' manifests
      writeFileSeq(buildDir, None, next)
      GraftStats.writeManifest(buildDir, None)
      writeBucketMarker(buildDir, layoutBuckets(dir, cur, meta))
      writePartSpecMarker(buildDir, layoutPartSpec(dir, cur, meta))
      verifyClaim(marker, token)
      publishVersion(buildDir, nextDir)
      writePointer(dir, next)
      next
    } finally releaseClaim(marker, token)
  }

  /** Change the table's hash-bucket fan-out — `CALL rebucket(table, n)`:
    * ONE claimed commit that re-hashes every row into `newBuckets`
    * directories (one compact file each) and flips the pointer, plus a
    * meta update so future change batches bucket under the new count.
    * Layout, not content: no changelog slice, CDC consumers see nothing —
    * the same contract as [[optimize]]. This is the operational escape
    * hatch the fixed CREATE-time count needs at 100 TB: when buckets
    * outgrow "a few GB each", re-bucket to a higher fan-out and point
    * lookups/SPJ/CoW granularity all follow (their machinery reads the
    * per-version `_buckets` marker, so old versions keep pruning correctly
    * under their own layout and time travel is unaffected).
    *
    * Crash-safe at every boundary: the new version dir + its marker land
    * before the meta update, the meta update (under the meta lock) before
    * the pointer flip; a crash in between leaves meta.buckets ahead of the
    * layout, which is harmless — every reader AND writer derives the
    * effective fan-out from the current version's marker
    * ([[layoutBuckets]]), never from meta alone. */
  def rebucket(spark: SparkSession, dir: String, newBuckets: Int): Long = {
    require(newBuckets > 0, "buckets must be positive")
    recoverChangelog(dir)
    val meta = readMeta(dir)
    val cur = currentVersion(dir)
    // a same-count rebucket is a no-op ONLY when the snapshot is also
    // partition-era-uniform: after set_partition_spec, `CALL rebucket`
    // with the existing count is the documented re-grain (full rewrite
    // under the current grain, pruning resumes)
    if (layoutBuckets(dir, cur, meta) == newBuckets &&
        meta.buckets == newBuckets &&
        snapshotPartSpecs(dir, cur, meta).size <= 1)
      return cur
    val next = cur + 1
    val (marker, token) = claimCommit(dir, next)
    try withClaimHeartbeat(Seq(marker,
        Paths.get(s"${versionDir(dir, next)}.build-$token"))) {
      if (currentVersion(dir) != cur)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past version $cur during REBUCKET; re-run")
      // stamp the old layout's count on the current version first, so the
      // fallback-to-meta path can never misread it after our meta update.
      // A pre-stamp version also has no _committed_at, so TIMESTAMP AS OF
      // falls back to the version DIR's mtime — which writing the backfill
      // into the dir disturbs. Capture the original mtime BEFORE touching
      // the dir and persist it as _committed_at in the same backfill, so
      // the version keeps resolving to when it actually committed, never
      // to when it was rebucketed.
      if (versionBuckets(dir, cur).isEmpty) {
        val cdir = Paths.get(versionDir(dir, cur))
        val origMtime = Files.getLastModifiedTime(cdir).toMillis
        val stampP = Paths.get(versionDir(dir, cur), "_committed_at")
        if (!Files.exists(stampP))
          Files.write(stampP, origMtime.toString.getBytes("UTF-8"))
        Files.write(Paths.get(versionDir(dir, cur), "_buckets"),
          meta.buckets.toString.getBytes("UTF-8"))
      }
      val nextDir = versionDir(dir, next)
      val buildDir = s"$nextDir.build-$token"
      deleteRecursively(Paths.get(buildDir))
      val physKeys = bucketColsOf(meta).map(k => physicalName(meta.schema(k)))
      withPartCol(readVersionPhysical(spark, dir, meta, cur)
          .drop(BucketCol)
          .withColumn(BucketCol, bucketExpr(physKeys, newBuckets)), meta,
          layoutPartSpec(dir, cur, meta))
        .repartition(newBuckets, col(BucketCol))
        .write.options(bloomOptions(meta))
            .partitionBy(layoutCols(meta): _*).parquet(buildDir)
      writeBucketMap(buildDir,
        localSlots(buildDir).map(s => s -> Seq(next)).toMap)
      writeFileSeq(buildDir, None, next) // every file rewritten (DVs applied)
      GraftStats.writeManifest(buildDir, None) // every file rewritten
      writeBucketMarker(buildDir, newBuckets)
      writePartSpecMarker(buildDir, layoutPartSpec(dir, cur, meta))
      withMetaLock(dir) {
        val m = readMeta(dir) // re-read: fold over concurrent ALTERs
        writeMeta(dir, m.copy(buckets = newBuckets))
      }
      verifyClaim(marker, token)
      publishVersion(buildDir, nextDir)
      writePointer(dir, next)
      next
    } finally releaseClaim(marker, token)
  }

  /** Roll the table back to a retained earlier version — `CALL
    * restore(table, v)`, the undo-a-bad-write operation. One claimed
    * commit whose new version HARD-LINKS the target version's files
    * (cost ∝ file count — at 100 TB a restore is links/manifest refs, not
    * a copy); history is preserved, the pointer only ever moves forward,
    * so time travel to the undone versions still works until
    * [[expireVersions]] drops them. Like TRUNCATE/overwrite, a restore
    * writes NO changelog slice: the missing slice is the detectable
    * snapshot boundary — a CDC consumer folding past it would resurrect
    * the undone writes, so it must re-snapshot instead. The restored
    * version keeps the TARGET's bucket fan-out (marker copied), so a
    * restore across a [[rebucket]] prunes correctly under the old layout
    * and later writes re-derive from it. */
  def restore(dir: String, toVersion: Long): Long = {
    recoverChangelog(dir)
    val meta = readMeta(dir)
    val cur = currentVersion(dir)
    require(listVersions(dir).contains(toVersion),
      s"table $dir has no retained version $toVersion " +
        s"(have ${listVersions(dir)})")
    if (toVersion == cur) return cur
    val next = cur + 1
    val (marker, token) = claimCommit(dir, next)
    try withClaimHeartbeat(Seq(marker,
        Paths.get(s"${versionDir(dir, next)}.build-$token"))) {
      if (currentVersion(dir) != cur)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past version $cur during RESTORE; re-run")
      val srcV = versionDir(dir, toVersion)
      val nextDir = versionDir(dir, next)
      val buildDir = s"$nextDir.build-$token"
      deleteRecursively(Paths.get(buildDir))
      Files.createDirectories(Paths.get(buildDir))
      // pure metadata commit: the new version's bucket map is the
      // target's resolved owner map verbatim — O(buckets), no per-file
      // pass at any table size
      val ownerMap = ownersOf(dir, toVersion)
      writeBucketMap(buildDir, ownerMap)
      // the restored state includes the target's live delete slices
      // verbatim (physical cap-bounded links) — a merge-on-read version
      // restores to exactly the rows it read as; file seqs stay in the
      // owner versions' manifests
      linkDvCarry(srcV, buildDir, Set.empty)
      writeFileSeq(buildDir, None, next)
      GraftStats.writeManifest(buildDir, None)
      writeBucketMarker(buildDir, layoutBuckets(dir, toVersion, meta))
      writePartSpecMarker(buildDir, layoutPartSpec(dir, toVersion, meta))
      writeBoundaryMarker(buildDir) // restore = snapshot boundary for CDC
      verifyClaim(marker, token)
      // Re-check against a concurrent expireVersions (a maintenance op that
      // runs without a commit claim): since restore is a pure metadata
      // commit, nothing before this point touched the owner slot dirs the
      // new manifest points at — an expire racing us could have retired the
      // target and deleted some of them, and publishing anyway would ship a
      // manifest whose reads silently drop those buckets (resolvedSlotDirs
      // filters missing dirs). Fail loudly instead; the residual window
      // between this check and the pointer flip is the same documented
      // class as the verifyClaim→flip TOCTOU.
      if (!listVersions(dir).contains(toVersion))
        throw new java.util.ConcurrentModificationException(
          s"table $dir version $toVersion was expired during RESTORE; aborting")
      val gone = ownerMap.toSeq.flatMap { case (s, os) =>
        os.map(o => s"${versionDir(dir, o)}/$s")
      }.filterNot(d => Files.isDirectory(Paths.get(d)))
      if (gone.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"RESTORE of $dir to version $toVersion lost referenced slot dirs " +
            s"to a concurrent expire (${gone.take(3).mkString(", ")}…); aborting")
      publishVersion(buildDir, nextDir)
      writePointer(dir, next)
      next
    } finally releaseClaim(marker, token)
  }

  /** ANALYZE — `CALL analyze(table)`: ONE aggregate job over the current
    * version computing per-column approximate NDV, null count, and
    * min/max (atomic columns), persisted at the table level and served to
    * the planner through the scan's `Statistics.columnStats()`
    * ([[org.apache.spark.sql.GraftRenamingScan.estimateStatistics]]) — the
    * cardinality input Spark's CBO join estimation works from. Returns the
    * analyzed version. Values normalize into the zone-map comparison
    * domains (dates → epoch days, timestamps → micros), so the planner
    * sees catalyst-comparable endpoints. */
  def analyzeTable(spark: SparkSession, dir: String,
      histogramBins: Int = 0): Long = {
    val meta = readMeta(dir)
    val cur = currentVersion(dir)
    val supported = meta.schema.fields.filter(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType | StringType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    })
    if (supported.isEmpty) return cur
    val df = readVersion(spark, dir, cur)
    // count(*) rides in the same one-pass aggregate: the analyzed row
    // count is the staleness signal freshTableColStats compares against
    val aggs = count(lit(1)).as("__rows") +: supported.flatMap { f =>
      val c = col(f.name)
      Seq(approx_count_distinct(c).as(s"ndv_${f.name}"),
        count(when(c.isNull, 1)).as(s"nulls_${f.name}"),
        min(c).as(s"min_${f.name}"), max(c).as(s"max_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val analyzedRows = row.getLong(0)
    def norm(dt: DataType, v: Any): (String, Option[Any]) = (dt, v) match {
      case (_, null) => (kindOfType(dt), None)
      case (DateType, d: java.sql.Date) =>
        ("l", Some(d.toLocalDate.toEpochDay))
      case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
        ("l", Some(t.toInstant.getEpochSecond * 1000000L +
          t.toInstant.getNano / 1000L))
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        ("l", Some(t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond *
          1000000L + t.getNano / 1000L))
      case (_, n: java.lang.Number)
          if kindOfType(dt) == "l" => ("l", Some(n.longValue()))
      case (_, n: java.lang.Number)
          if kindOfType(dt) == "d" => ("d", Some(n.doubleValue()))
      case (_, b: java.lang.Boolean) => ("b", Some(b.booleanValue()))
      case (_, s: String) => ("s", Some(s))
      case _ => (kindOfType(dt), None)
    }
    val stats = supported.zipWithIndex.map { case (f, i) =>
      val ndv = row.getLong(1 + i * 4)
      val nulls = row.getLong(1 + i * 4 + 1)
      val (kind, mn) = norm(f.dataType, row.get(1 + i * 4 + 2))
      val (_, mx) = norm(f.dataType, row.get(1 + i * 4 + 3))
      physicalName(f) -> GraftStats.TableColStat(kind, ndv, nulls, mn, mx)
    }.toMap
    val withHists =
      if (histogramBins <= 1) stats
      else stats ++ histograms(spark, df, supported.toSeq, stats,
        histogramBins, analyzedRows)
        .map { case (c, h) => c -> stats(c).copy(histogram = Some(h)) }
    GraftStats.writeTableColStats(dir, cur, Some(analyzedRows), withHists)
    cur
  }

  /** Equi-height histograms for the numeric/date/timestamp columns (kind
    * 'l'/'d'): bin edges from one `percentile_approx` pass over every
    * column at once, per-bin NDV from one more aggregate pass (bins ×
    * columns `approx_count_distinct(when(...))` aggregates — two extra
    * distributed jobs total, never per-column). This is the skew signal
    * min/max interpolation can't carry: Catalyst's filter and join
    * estimation consume the bins directly under CBO, so a predicate into
    * a sparse range estimates small even when min/max span is huge. */
  private def histograms(spark: SparkSession, df: DataFrame,
      supported: Seq[StructField], stats: Map[String, GraftStats.TableColStat],
      bins: Int, analyzedRows: Long): Map[String, GraftStats.ColHistogram] = {
    val histCols = supported.filter { f =>
      val k = stats(physicalName(f)).kind
      (k == "l" || k == "d") && stats(physicalName(f)).min.isDefined
    }
    if (histCols.isEmpty) return Map.empty
    def asD(f: StructField): Column = f.dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(f.name)).cast(DoubleType)
      case DateType => datediff(col(f.name), lit(java.sql.Date.valueOf(
        "1970-01-01"))).cast(DoubleType)
      case _ => col(f.name).cast(DoubleType)
    }
    val fractions = (0 to bins).map(_.toDouble / bins)
    val pctAggs = histCols.map(f => percentile_approx(asD(f),
      lit(fractions.toArray), lit(10000)).as(s"p_${f.name}"))
    val pctRow = df.agg(pctAggs.head, pctAggs.tail: _*).head()
    val edges: Map[String, Seq[Double]] = histCols.zipWithIndex.map {
      case (f, i) => f.name -> pctRow.getSeq[Double](i) }.toMap
    // per-bin NDV, all columns in one pass: bin membership by edge range
    // (upper-inclusive, first bin closed at both ends — Spark's own
    // histogram bin convention)
    val ndvAggs = histCols.flatMap { f =>
      val es = edges(f.name)
      (0 until bins).map { b =>
        val lo = es(b); val hi = es(b + 1)
        val cond =
          if (b == 0) asD(f) >= lo && asD(f) <= hi
          else asD(f) > lo && asD(f) <= hi
        approx_count_distinct(when(cond, asD(f))).as(s"h_${f.name}_$b")
      }
    }
    val ndvRow = df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
    histCols.zipWithIndex.map { case (f, fi) =>
      val es = edges(f.name)
      val binStats = (0 until bins).map { b =>
        (es(b), es(b + 1), math.max(1L, ndvRow.getLong(fi * bins + b)))
      }
      val s = stats(physicalName(f))
      // equi-height by construction (percentile edges): height =
      // non-null rows / bins, the invariant Catalyst's estimation assumes
      physicalName(f) -> GraftStats.ColHistogram(
        (analyzedRows - s.nullCount).toDouble / bins, binStats)
    }.toMap
  }

  /** Staleness bound for served ANALYZE stats: column stats survive DML
    * after the analyzed version only while the CURRENT snapshot's row
    * count stays within this fraction of the analyzed one (default 0.5 —
    * a table that grew or shrank past ±50% serves estimates worse than
    * none, so the scan withholds them until the next `CALL analyze`). */
  private[sources] def statsMaxStaleFraction: Double =
    sys.props.get("graft.store.statsMaxStaleFraction").map(_.toDouble)
      .getOrElse(0.5)

  /** ANALYZE column stats for scanning (`dir`, `version`) — EMPTY when the
    * persisted stats are stale. Fresh means: analyzed at this exact
    * version, or the analyzed row count is recorded (r13+) and the
    * scanned snapshot's manifest row count drifted less than
    * [[statsMaxStaleFraction]] from it. Row/byte estimates are per-scan
    * from zone maps and never go through here — only column NDV/min-max
    * age. Legacy `_colstats` without a recorded row count serve only at
    * their own analyzed version (conservative; the next analyze upgrades
    * the format). */
  def freshTableColStats(dir: String, version: Long)
      : Map[String, GraftStats.TableColStat] =
    GraftStats.readTableColStatsFull(dir) match {
      case Some((av, _, m)) if av == version => m
      case Some((_, Some(arows), m)) =>
        snapshotRowCount(dir, version) match {
          case Some(cur)
              if math.abs(cur - arows).toDouble <=
                statsMaxStaleFraction * math.max(arows, 1L) => m
          case _ => Map.empty
        }
      case _ => Map.empty
    }

  private def kindOfType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => "l"
    case FloatType | DoubleType => "d"
    case BooleanType => "b"
    case _ => "s"
  }

  /** Partition-scoped retention — `CALL expire_partitions(table, below)`:
    * ONE claimed commit whose new version simply OMITS every slot whose
    * partition ordinal is below the bound from its `_bucketmap`. Pure
    * metadata at any table size (no file is read, moved, or deleted —
    * older versions still reference the dropped partitions until
    * [[expireVersions]] reclaims them), which is exactly what makes
    * date-grained retention viable at 100 TB. Like TRUNCATE/overwrite it
    * writes NO changelog slice and stamps the snapshot-boundary marker:
    * rows disappeared without per-row D entries, so a CDC fold across it
    * must re-snapshot. Ordinals compare numerically when both sides parse
    * as integers (the time transforms and integral identity), else as
    * strings. Returns the new version (or the current one if nothing
    * matched). */
  def expirePartitions(dir: String, below: String): Long = {
    recoverChangelog(dir)
    val meta = readMeta(dir)
    require(meta.partition.isDefined,
      s"table $dir has no PARTITIONED BY transform")
    val cur = currentVersion(dir)
    // MIXED partition grains make ordinal comparison meaningless across
    // owner dirs — require era uniformity (rebucket re-grains everything)
    val eras = snapshotPartSpecs(dir, cur, meta)
    require(eras.size <= 1,
      s"table $dir mixes partition grains ${eras.map(_._1).mkString("/")} " +
        "after set_partition_spec — CALL rebucket to re-grain before " +
        "expire_partitions")
    val effSpec = eras.headOption.orElse(layoutPartSpec(dir, cur, meta))
    // compare UNESCAPED values (partitionBy escapes special chars into the
    // dir name) and never drop the null-partition sentinel — NULL cannot
    // satisfy an ordering bound
    val defaultName = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    // The comparison domain is fixed ONCE by the table's partition
    // transform, never per-value: time transforms write integer ordinals
    // and identity over an integral column writes integers → numeric;
    // identity over string/date/timestamp columns writes (escaped) string
    // values whose ISO forms order lexicographically → string. Deciding
    // per-directory by parseability would flip the basis between dirs
    // (e.g. values '9' and 'abc' against below='10'), so the dropped set
    // would follow no single total order.
    val numericDomain = effSpec.exists { case (fn, physCol) =>
      fn != "identity" || meta.schema.fields
        .find(f => physicalName(f) == physCol)
        .exists(_.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        })
    }
    val belowNum = below.toLongOption
    if (numericDomain) require(belowNum.isDefined,
      s"expire_partitions bound '$below' must be an integer ordinal for " +
        s"transform ${effSpec.map(_._1).getOrElse("?")}")
    def lt(rawDir: String): Boolean = {
      if (rawDir == defaultName) return false
      val a = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.unescapePathName(rawDir)
      if (numericDomain)
        // a non-parsing dir value cannot exist for these transforms; if one
        // ever does, keep it (conservative) rather than guess an order
        a.toLongOption.exists(_ < belowNum.get)
      else a < below
    }
    val owners = ownersOf(dir, cur)
    val keepMap = owners.filter { case (slot, _) =>
      !slotPart(slot).exists(lt)
    }
    if (keepMap.size == owners.size) return cur
    val next = cur + 1
    val (marker, token) = claimCommit(dir, next)
    try withClaimHeartbeat(Seq(marker,
        Paths.get(s"${versionDir(dir, next)}.build-$token"))) {
      if (currentVersion(dir) != cur)
        throw new java.util.ConcurrentModificationException(
          s"table $dir advanced past version $cur during EXPIRE PARTITIONS")
      val nextDir = versionDir(dir, next)
      val buildDir = s"$nextDir.build-$token"
      deleteRecursively(Paths.get(buildDir))
      Files.createDirectories(Paths.get(buildDir))
      writeBucketMap(buildDir, keepMap)
      // a merge-on-read table's live delete slices MUST carry across the
      // retention commit: slices are keyed (bucket, key), deliberately NOT
      // partition-scoped (an update that moves a row between partitions
      // cannot know the old partition value without reading the base —
      // the read mor exists to avoid), so dropping partitions never makes
      // a slice obsolete and dropping the slices would resurrect deleted
      // rows in every KEPT partition. Cap-bounded links, O(changed rows).
      linkDvCarry(versionDir(dir, cur), buildDir, Set.empty)
      writeFileSeq(buildDir, None, next)
      GraftStats.writeManifest(buildDir, None)
      writeBucketMarker(buildDir, layoutBuckets(dir, cur, meta))
      writePartSpecMarker(buildDir, layoutPartSpec(dir, cur, meta))
      writeBoundaryMarker(buildDir) // rows vanish with no changelog slice
      verifyClaim(marker, token)
      publishVersion(buildDir, nextDir)
      writePointer(dir, next)
      next
    } finally releaseClaim(marker, token)
  }

  /** Drop changelog slices below `keepFromVersion` — changelog retention.
    * Replay/stream consumers must have advanced past the horizon; after
    * this, reconstruction older than the horizon needs a kept snapshot
    * version (the same contract as any log-compacted CDC feed). */
  def expireChanges(dir: String, keepFromVersion: Long): Unit = {
    val root = Paths.get(changesRoot(dir))
    if (!Files.isDirectory(root)) return
    // Record the horizon BEFORE deleting (monotone, staged+atomic like the
    // pointer): "no changelog below v" and "this version committed no
    // changes" are indistinguishable from the directory listing alone, so
    // a resuming CDC stream needs this marker to tell a harmless gap from
    // silently-skipped history (see GraftChangesMicroBatchStream).
    val h = math.max(keepFromVersion, changesHorizon(dir))
    val tmp = Paths.get(changesRoot(dir), "_horizon.tmp")
    Files.write(tmp, h.toString.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(changesRoot(dir), "_horizon"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    listDir(root)(_.filter(
        _.getFileName.toString.startsWith(s"$ChangeVersionCol="))
      .filter(_.getFileName.toString.split("=")(1).toLong < keepFromVersion)
      .toList).foreach(deleteRecursively)
    // promoted boundary markers below the horizon are subsumed by the
    // horizon check itself (any resume below it already fails loudly)
    listDir(root)(_.map(_.getFileName.toString)
      .filter(_.matches("_boundary-\\d{10}"))
      .filter(_.stripPrefix("_boundary-").toLong < keepFromVersion).toList)
      .foreach(n => Files.deleteIfExists(Paths.get(changesRoot(dir), n)))
  }

  /** Lowest version whose changelog slice is guaranteed retained (slices
    * below it were dropped by [[expireChanges]]; 0 = nothing ever expired). */
  def changesHorizon(dir: String): Long = {
    val p = Paths.get(changesRoot(dir), "_horizon")
    if (!Files.exists(p)) 0L
    else new String(Files.readAllBytes(p), "UTF-8").trim.toLong
  }

  /** Snapshot-boundary marker. TRUNCATE / INSERT OVERWRITE / CALL restore
    * commit NO changelog slice, and a CDC fold ACROSS one resurrects the
    * undone rows — but from the changes directory alone a boundary is
    * indistinguishable from a harmless changelog-less maintenance commit
    * (optimize/rebucket also leave a missing slice). Boundary commits
    * therefore stamp `_boundary` inside their version dir — atomic with
    * the publish rename, so a crash pre-flip can never leave a spurious
    * marker — and [[expireVersions]] promotes the marker to a persistent
    * `_boundary-<v>` file under the changes root before dropping the dir,
    * so a resuming CDC stream still detects the boundary after the version
    * itself is expired. */
  private[sources] def writeBoundaryMarker(buildDir: String): Unit =
    Files.write(Paths.get(buildDir, "_boundary"), Array.empty[Byte])

  /** Whether version `v` was a snapshot-boundary commit (restore/truncate/
    * overwrite — see [[writeBoundaryMarker]]). */
  def isBoundary(dir: String, v: Long): Boolean =
    Files.exists(Paths.get(versionDir(dir, v), "_boundary")) ||
      Files.exists(Paths.get(changesRoot(dir), f"_boundary-$v%010d"))

  /** Snapshot-boundary versions in [from, to] — retained version dirs plus
    * markers promoted by [[expireVersions]]. Metadata-scale: one listing
    * of the versions dir and one of the changes root. */
  def boundariesIn(dir: String, from: Long, to: Long): Seq[Long] = {
    val live = listVersions(dir).filter(v => v >= from && v <= to)
      .filter(v => Files.exists(Paths.get(versionDir(dir, v), "_boundary")))
    val root = Paths.get(changesRoot(dir))
    val promoted =
      if (!Files.isDirectory(root)) Seq.empty[Long]
      else listDir(root)(_.map(_.getFileName.toString)
        .filter(_.matches("_boundary-\\d{10}"))
        .map(_.stripPrefix("_boundary-").toLong)
        .filter(v => v >= from && v <= to).toSeq)
    (live ++ promoted).distinct.sorted
  }

  /** Latest snapshot-boundary version, if any — the floor below which a
    * fresh CDC stream must not start its fold. */
  def latestBoundary(dir: String): Option[Long] =
    boundariesIn(dir, 0L, Long.MaxValue).lastOption

  /** Remove abandoned write debris: `_staging/<queryId>` dirs and stale
    * claim tombs older than `olderThanMillis`. A LIVE write keeps its
    * staging dir's mtime fresh for its whole commit (the commit-claim
    * heartbeat touches it while the decode/rewrite jobs lazily read the
    * staged .bin files — see [[withClaimHeartbeat]]), so with the default
    * 1 h threshold an age-out really does mean an abandoned writer, not an
    * in-flight commit that merely outran its task writers. Committed data,
    * versions, and changelog are never touched. Returns the number of
    * entries removed. */
  def vacuum(dir: String, olderThanMillis: Long = 3600000L): Long = {
    // resolve any group-commit marker FIRST: a DECIDED-but-incomplete
    // group's adopted above-pointer dirs are its roll-forward payload —
    // completing (or aborting) the group here means the sweep below can
    // never reclaim dirs a committed group still needs (post-recovery, a
    // committed member's pointer covers them; an aborted group's dirs
    // are genuinely debris)
    recoverGroupCommit(dir)
    val now = System.currentTimeMillis()
    var removed = 0L
    val stagingRoot = Paths.get(dir, "_staging")
    if (Files.isDirectory(stagingRoot)) {
      listDir(stagingRoot)(_.toList).foreach { p =>
        val age = try now - Files.getLastModifiedTime(p).toMillis
        catch { case _: java.nio.file.NoSuchFileException => -1L }
        if (age > olderThanMillis) { deleteRecursively(p); removed += 1 }
      }
    }
    listDir(Paths.get(dir))(_.filter(p => {
        val n = p.getFileName.toString
        n.matches("_commit-\\d{10}\\.stale-\\d+") ||
          n.matches("_meta_lock\\.stale-\\d+")
      }).toList)
      .foreach { p => Files.deleteIfExists(p); removed += 1 }
    // abandoned writer-private build dirs (vN.build-<token>): their
    // writers died or lost a takeover; the publish rename never happened.
    // vN.expired-<nonce> tombs are expireVersions' rename-then-sweep
    // remnants (a crash between the move and the recursive delete) —
    // already invisible to the version listing, reclaim immediately.
    listDir(Paths.get(dir))(_.filter { p =>
        val n = p.getFileName.toString
        n.matches("v\\d{10}\\.build-.*") || n.matches("v\\d{10}\\.expired-\\d+")
      }.toList)
      .foreach { p =>
        val isTomb = p.getFileName.toString.contains(".expired-")
        val age = try now - Files.getLastModifiedTime(p).toMillis
        catch { case _: java.nio.file.NoSuchFileException => -1L }
        if (isTomb || age > olderThanMillis) { deleteRecursively(p); removed += 1 }
      }
    // final-named version dirs ABOVE the pointer are a crashed
    // fast_forward's adoption debris (a live fast_forward heartbeats a
    // claim per adopted version — the claim check keeps an in-flight
    // publish safe). Invisible to listVersions (pointer-capped), so
    // reclaiming them is pure space hygiene; a retried fast_forward
    // rebuilds them from the still-intact branch.
    locally {
      val cur = currentVersion(dir)
      listDir(Paths.get(dir))(_.filter { p =>
          val n = p.getFileName.toString
          n.matches("v\\d{10}") && n.drop(1).toLong > cur
        }.toList)
        .foreach { p =>
          val v = p.getFileName.toString.drop(1).toLong
          val claim = Paths.get(dir, f"_commit-$v%010d")
          val claimFresh = Files.exists(claim) &&
            (now - (try Files.getLastModifiedTime(claim).toMillis
              catch { case _: java.nio.file.NoSuchFileException => 0L })) <=
              olderThanMillis
          val age = try now - Files.getLastModifiedTime(p).toMillis
          catch { case _: java.nio.file.NoSuchFileException => -1L }
          if (!claimFresh && age > olderThanMillis) {
            deleteRecursively(p); removed += 1
          }
        }
    }
    // abandoned CTAS/RTAS stage dirs and clone builds live as SIBLINGS of
    // the table dir (`<table>.stage-<uuid>` / `<table>.clonebuild-<uuid>`):
    // their sessions died before commitStagedChanges/the clone rename
    val self = Paths.get(dir).getFileName.toString
    Option(Paths.get(dir).getParent).filter(Files.isDirectory(_)).foreach {
      parent =>
        listDir(parent)(_.filter { p =>
          val n = p.getFileName.toString
          n.startsWith(s"$self.stage-") || n.startsWith(s"$self.clonebuild-")
        }.toList).foreach { p =>
          // liveness = the NEWEST mtime anywhere in the subtree: a live
          // CTAS/RTAS keeps writing files deep inside the stage dir
          // without touching its root mtime, and killing an in-flight
          // statement is worse than keeping an orphan another hour
          val age = try {
            val walk = Files.walk(p)
            val newest =
              try walk.iterator().asScala
                .map(f => try Files.getLastModifiedTime(f).toMillis
                  catch { case _: Exception => now })
                .foldLeft(0L)(math.max)
              finally walk.close()
            now - newest
          } catch { case _: Exception => -1L }
          if (age > olderThanMillis) { deleteRecursively(p); removed += 1 }
        }
    }
    // a crashed createBranch/rebaseBranch leaks its full hard-linked
    // clone under `_branches/.creating-*` (and a crashed rebase swap the
    // displaced original under `_branches/.prerebase-*`) — never
    // promoted, invisible to listBranches, reclaimed here with the same
    // newest-mtime liveness gate as the stage-dir sweep (a live clone
    // keeps linking files)
    locally {
      val broot = branchesRoot(dir)
      if (Files.isDirectory(broot)) {
        listDir(broot)(_.filter { p =>
            val n = p.getFileName.toString
            n.startsWith(".creating-") || n.startsWith(".prerebase-")
          }.toList)
          .foreach { p =>
            val age = try {
              val walk = Files.walk(p)
              val newest =
                try walk.iterator().asScala
                  .map(f => try Files.getLastModifiedTime(f).toMillis
                    catch { case _: Exception => now })
                  .foldLeft(0L)(math.max)
                finally walk.close()
              now - newest
            } catch { case _: Exception => -1L }
            if (age > olderThanMillis) { deleteRecursively(p); removed += 1 }
          }
      }
    }
    // claim markers for versions AT OR BELOW the pointer are definitionally
    // dead (claims only gate versions above it): their writer committed and
    // was killed before releasing, or lost a takeover race post-flip. The
    // age gate keeps a racing claim for cur+1 read during a concurrent
    // flip safe.
    val cur = currentVersion(dir)
    listDir(Paths.get(dir))(_.filter { p =>
        val n = p.getFileName.toString
        n.matches("_commit-\\d{10}") && n.drop("_commit-".length).toLong <= cur
      }.toList)
      .foreach { p =>
        val age = try now - Files.getLastModifiedTime(p).toMillis
        catch { case _: java.nio.file.NoSuchFileException => -1L }
        if (age > olderThanMillis) { Files.deleteIfExists(p); removed += 1 }
      }
    removed += expireTxnBranches(dir, olderThanMillis)
    removed
  }

  /** Reclaim hidden transaction branches (`txn-*`, [[GraftTxn]]) whose
    * last COMMIT activity predates the retention window — the GC for
    * branches leaked by sessions that died between begin_txn and
    * commit/rollback (nothing else ever sweeps them; each holds a full
    * hard-linked clone plus whatever the txn staged). Activity is
    * commit-granular and O(2) stats per branch: the branch pointer's
    * mtime (every branch commit rewrites it) or the fork stamp's at
    * birth. A LIVE txn idle past the window loses its branches too —
    * its next statement or commit_txn then refuses LOUDLY ("lost its
    * branch") and the session can only roll back; nothing was ever
    * published, so the failure mode is a refused commit, never a torn
    * or silent one — the same contract as a warehouse's idle-txn
    * timeout. User-named (S40) branches are never touched. Runs inside
    * [[vacuum]] with its window, callable alone for a tighter one. */
  def expireTxnBranches(dir: String, olderThanMillis: Long): Long = {
    val now = System.currentTimeMillis()
    var dropped = 0L
    listBranches(dir).filter(_.startsWith("txn-")).foreach { n =>
      if (txnBranchLastActivity(dir, n).exists(now - _ > olderThanMillis))
        try { dropBranch(dir, n); dropped += 1 }
        catch { // raced its own commit/rollback
          case scala.util.control.NonFatal(_) => ()
        }
    }
    dropped
  }

  /** Last commit-activity instant of a txn branch (pointer mtime, fork
    * stamp at birth) — [[expireTxnBranches]]'s gate, exposed so
    * maintenance_report can count leak candidates without dropping. */
  private[sources] def txnBranchLastActivity(dir: String,
      name: String): Option[Long] = {
    val bd = branchDir(dir, name)
    val stamps = Seq(pointerPath(bd), Paths.get(bd, ForkBaseName))
      .flatMap { p =>
        try Some(Files.getLastModifiedTime(p).toMillis)
        catch { case _: java.io.IOException => None }
      }
    if (stamps.isEmpty) None else Some(stamps.max)
  }

  /** Changes-table schema: logical columns (all nullable — delete rows
    * carry only the key), the operation, and the committing version. */
  def changesSchema(meta: GraftTableMeta): StructType = {
    val nullable = StructType(meta.schema.fields.map(_.copy(nullable = true)).toSeq)
    StructType(nullable.fields.toSeq ++ Seq(
      StructField(ChangeOpCol, StringType, nullable = false),
      StructField(ChangeBeforeCol, nullable, nullable = true),
      StructField(ChangeVersionCol, LongType, nullable = false)))
  }

  /** [[changesSchema]] with file (physical) names, flat and inside the
    * before-image struct. */
  private[sources] def physicalChangesSchema(meta: GraftTableMeta): StructType =
    StructType(changesSchema(meta).fields.map {
      case f if f.name == ChangeBeforeCol =>
        f.copy(dataType = physicalSchema(f.dataType.asInstanceOf[StructType]))
      case f if meta.schema.fieldNames.contains(f.name) =>
        f.copy(name = physicalName(meta.schema(f.name)))
      case f => f
    }.toSeq)

  /** Map a physical-named changes DataFrame to logical names (flat rename
    * + positional struct cast for the before-image). */
  private def changesToLogical(df: DataFrame, meta: GraftTableMeta): DataFrame = {
    val logBefore = StructType(meta.schema.fields.map(_.copy(nullable = true)).toSeq)
    toLogical(df.withColumn(ChangeBeforeCol,
      col(ChangeBeforeCol).cast(logBefore)), meta.schema)
  }

  /** Read the committed changelog for versions in [fromV, toV]. Remnant
    * change directories above the current pointer (crash between changelog
    * write and pointer flip) are excluded by the pointer cap. */
  def readChanges(spark: SparkSession, dir: String, fromV: Long, toV: Long): DataFrame = {
    recoverChangelog(dir)
    val meta = readMeta(dir)
    val cap = math.min(toV, currentVersion(dir))
    val root = Paths.get(changesRoot(dir))
    val any = Files.isDirectory(root) && listDir(root)(
      _.exists(_.getFileName.toString.startsWith(s"$ChangeVersionCol=")))
    if (!any) spark.createDataFrame(new java.util.ArrayList[Row](), changesSchema(meta))
    else changesToLogical(
      spark.read.schema(physicalChangesSchema(meta)).parquet(changesRoot(dir))
        .filter(col(ChangeVersionCol).between(fromV, cap)), meta)
  }

  /** Replay a changelog slice onto a base snapshot. Because every change
    * row carries the FULL row image, multi-version replay collapses to
    * last-writer-wins per key: one max_by aggregate + one anti-join — no
    * per-version iteration, one shuffle each, which is what makes replay
    * viable when the slice spans thousands of commits of a 100 TB table.
    * Assumes the merge-key discipline the row-level surface maintains
    * (one live row per key); a changelog containing duplicate-key INSERT
    * appends within one version replays to one survivor per key. */
  def replayChanges(base: DataFrame, changes: DataFrame, meta: GraftTableMeta): DataFrame = {
    val cols = meta.schema.fieldNames.toSeq
    // keyless (append-only) changelogs are all-I by the write guard:
    // replay is a plain union, no per-key folding to do
    if (meta.keyCols.isEmpty)
      return base.select(cols.map(col): _*).unionByName(
        changes.filter(col(ChangeOpCol) === "I").select(cols.map(col): _*))
    // max_by orders by (version, op-rank): a key-reassigning update emits
    // D(old key) and U(new key) in ONE version, so a key can legitimately
    // carry both a delete and a live image at the same version (key swap)
    // — the live image wins the tie, matching the store's state.
    val opRank = when(col(ChangeOpCol) === "D", lit(0)).otherwise(lit(1))
    val last = changes.groupBy(meta.keyCols.map(col): _*)
      .agg(max_by(
        struct((cols :+ ChangeOpCol).map(col): _*),
        struct(col(ChangeVersionCol), opRank.as("r"))).as("r"))
      .select(cols.map(c => col(s"r.$c").as(c)) :+
        col(s"r.$ChangeOpCol").as(ChangeOpCol): _*)
    val survivors = last.filter(col(ChangeOpCol).isin("I", "U"))
      .select(cols.map(col): _*)
    base.join(last.select(meta.keyCols.map(col): _*), meta.keyCols, "left_anti")
      .select(cols.map(col): _*)
      .unionByName(survivors)
  }

  /** The changelog as a STREAM — change-data-feed reads. This is the stock
    * file streaming source over the changelog directory (schema supplied,
    * `basePath` so `change_version` survives as a column): every commit
    * drops new files under a new `change_version=N` dir and the source's
    * file log admits them as a micro-batch, checkpointable and replayable
    * like any file stream. Pair with `Trigger.AvailableNow` for catch-up
    * runs, or `foreachBatch` + [[incrementalAgg]] for a continuously
    * maintained downstream aggregate. No custom source machinery: the
    * changelog's layout IS a valid streaming input, which is the point of
    * committing it as immutable per-version files. */
  def streamChanges(spark: SparkSession, dir: String): DataFrame = {
    recoverChangelog(dir)
    val meta = readMeta(dir)
    changesToLogical(
      spark.readStream.schema(physicalChangesSchema(meta))
        .option("basePath", changesRoot(dir))
        .parquet(changesRoot(dir) + s"/$ChangeVersionCol=*"), meta)
  }

  /** Incrementally maintain a grouped (COUNT(*), SUM(aggCol)) materialized
    * view from a changelog slice, using the before/after images:
    * after-images (I/U) contribute (+1, +agg) to their group, before-images
    * (U/D) contribute (−1, −agg) to THEIR group — which handles rows whose
    * update MOVES them between groups — then one full-outer merge with the
    * previous view state drops groups whose count reaches zero.
    *
    * `mv` schema: groupCols ++ (n BIGINT, s BIGINT); an empty view is a
    * valid start. Cost ∝ changelog slice + |view|, never ∝ |table| — the
    * point of maintaining a view incrementally at 100 TB. Group keys are
    * merged null-safely (`<=>`), so nullable group columns fold correctly.
    */
  def incrementalAgg(mv: DataFrame, changes: DataFrame,
      groupCols: Seq[String], aggCol: String): DataFrame = {
    val adds = changes.filter(col(ChangeOpCol).isin("I", "U"))
      .select(groupCols.map(col) :+ lit(1L).as("dn") :+
        col(aggCol).cast(LongType).as("ds"): _*)
    val subs = changes.filter(col(ChangeOpCol).isin("U", "D"))
      .select(groupCols.map(c => col(s"$ChangeBeforeCol.$c").as(c)) :+
        lit(-1L).as("dn") :+
        (-col(s"$ChangeBeforeCol.$aggCol")).cast(LongType).as("ds"): _*)
    val delta = adds.unionByName(subs)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    val d = delta.select(delta.columns.map(c => col(c).as(s"d_$c")): _*)
    val joinCond = groupCols.map(c => col(c) <=> col(s"d_$c")).reduce(_ && _)
    mv.join(d, joinCond, "full_outer")
      .select(groupCols.map(c => coalesce(col(c), col(s"d_$c")).as(c)) :+
        (coalesce(col("n"), lit(0L)) + coalesce(col("d_dn"), lit(0L))).as("n") :+
        (coalesce(col("s"), lit(0L)) + coalesce(col("d_ds"), lit(0L))).as("s"): _*)
      .filter(col("n") > 0)
  }

  private def deleteRecursively(p: Path): Unit = {
    // deleteIfExists + swallowed NoSuchFile: two sweepers can race on
    // the same debris tree (vacuum vs expireVersions' tomb sweep, or two
    // group-commit resolvers consuming the same branch) and concurrent
    // deletion of the same entry must not crash either. Files.walk is
    // LAZY: a subtree vanishing mid-iteration surfaces as an
    // UncheckedIOException(NoSuchFileException) from the iterator itself
    // — re-walk until the root is gone, so an aborted pass can never
    // leave a partial tree squatting on the name (the tree only
    // shrinks, so this terminates).
    var attempts = 0
    while (Files.exists(p) && attempts < 50) {
      attempts += 1
      val s = try Files.walk(p)
      catch { case _: java.nio.file.NoSuchFileException => return }
      try {
        try s.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach { f =>
            try Files.deleteIfExists(f)
            catch {
              case _: java.nio.file.NoSuchFileException => ()
              // a dir whose child was re-listed by our walk but deleted by
              // the other sweeper can briefly read non-empty; the re-walk
              // (or the other sweeper) finishes it
              case _: java.nio.file.DirectoryNotEmptyException => ()
            }
          }
        catch {
          case e: java.io.UncheckedIOException
              if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] =>
            () // racer shredded the tree mid-walk; re-walk
        }
      } finally s.close()
    }
  }
}
