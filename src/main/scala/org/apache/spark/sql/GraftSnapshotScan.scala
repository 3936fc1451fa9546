package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, Literal}
import org.apache.spark.sql.execution.datasources.{PartitioningAwareFileIndex, PartitionPath, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Builds the delegated parquet scan for one graft-store SNAPSHOT under
  * the r12 manifest layout: a version's live files stay in the version
  * dirs that WROTE them (`_bucketmap` slot references, no per-commit link
  * pass), so a snapshot is not one directory — it is a resolved list of
  * `[gpart=<v>/]gbucket=<k>` leaf dirs spread across owner versions.
  * Hive-style partition discovery cannot serve that (mixed non-partition
  * `vNNN` segments ⇒ "conflicting directory structures"), so this shim
  * does what Delta/Iceberg do on Spark: hand the stock
  * [[ParquetScanBuilder]] an [[InMemoryFileIndex]] whose [[PartitionSpec]]
  * is authored from the store's own manifest — one partition entry per
  * (slot, owner dir), the partition ordinal and bucket id as the
  * partition values. Everything above keeps working unchanged: pushed
  * `gbucket=`/`gpart` filters prune at the file index (S18 point lookups,
  * S30 partition pruning), DPP/zone-map pruning key on path segments the
  * layout preserves, SPJ regroups by the same segment, and column
  * pruning/filter pushdown/vectorized reads are the stock parquet path.
  * In-package because `InMemoryFileIndex`'s partition-spec constructor
  * and `ParquetScanBuilder` are `private[sql]` — the same shim pattern as
  * [[GraftSqlShim]]. */
object GraftSnapshotScan {
  import graft.sources.{GraftStore, GraftTableMeta}

  /** Catalyst type of the `gpart` partition column: the source column's
    * type for identity partitioning, INT ordinal for the time transforms. */
  def partType(meta: GraftTableMeta, physSchema: StructType): Option[DataType] =
    meta.partition.map {
      case ("identity", physCol) => physSchema(physCol).dataType
      case _ => IntegerType
    }

  /** Internal (catalyst) value of one `gpart=<s>` directory segment. */
  def partInternal(s: String, dt: DataType): Any =
    if (s == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
    else Cast(Literal(UTF8String.fromString(
        ExternalCatalogUtils.unescapePathName(s)), StringType),
      dt, Some("UTC")).eval(null)

  /** A ParquetScanBuilder over the resolved snapshot (`tableDir`, `v`).
    * `physSchema` = the data columns as stored in files; the partition
    * columns ([`gpart`,] `gbucket`) are appended here.
    *
    * The file index is built ENTIRELY from the store's manifests
    * (`_bucketmap` slots + `_fileseq` names/sizes) — zero filesystem
    * listing at plan time. Pre-r12 the InMemoryFileIndex listed every
    * slot dir before pruning could run, so a one-day scan of a
    * 129-day × 16-bucket table paid a ~2000-directory listing job per
    * query (measured ~4 s at 10M rows); planning from metadata is the
    * object-store design point this store exists for. */
  // the authored (PartitionSpec, dir → files) of a snapshot is a pure
  // function of the immutable version dir (+ the partition-column type),
  // but building it is O(slots) — a plan-heavy workload (many pruned
  // queries against one snapshot) must not re-author 100k PartitionPath /
  // FileStatus objects per query. Same cache discipline as
  // GraftStore.snapshotFilesCache: keyed by version dir, cleared at 64,
  // invalidated per table by GraftStore on drop/recreate/expire.
  private val authoredCache = new java.util.concurrent.ConcurrentHashMap[
    String, (PartitionSpec, Map[Path, Array[FileStatus]])]()

  /** Bumped by every invalidation: a scan that was COMPUTING its index
    * across a concurrent drop/recreate must not re-insert the stale entry
    * after invalidate() already swept the map (get-miss → compute → put
    * races the sweep) — the put is skipped when the epoch moved. */
  private val invalidationEpoch = new java.util.concurrent.atomic.AtomicLong()

  /** Drop cached authored indexes under a table dir (public: the store's
    * invalidateDvCache calls across packages on drop/recreate/expire). */
  def invalidate(tableDir: String): Unit = {
    invalidationEpoch.incrementAndGet()
    // path-segment-scoped: dropping 'wh/t' must not evict 'wh/t2'
    val prefix = tableDir + java.io.File.separator
    authoredCache.keySet.removeIf(k => k == tableDir || k.startsWith(prefix))
  }

  def parquetScanBuilder(spark: SparkSession, tableDir: String, v: Long,
      meta: GraftTableMeta, physSchema: StructType,
      options: CaseInsensitiveStringMap): ParquetScanBuilder = {
    val pt = partType(meta, physSchema)
    val partCols = StructType(
      pt.map(t => StructField(GraftStore.PartCol, t, nullable = true)).toSeq :+
        StructField(GraftStore.BucketCol, IntegerType, nullable = true))
    val key = GraftStore.versionDir(tableDir, v) +
      pt.map(t => s"#${t.sql}").getOrElse("")
    val cached = authoredCache.get(key)
    val epoch0 = invalidationEpoch.get()
    val (spec, filesByDir) = if (cached != null) cached else {
      val hconf = spark.sessionState.newHadoopConf()
      val fs = new Path(tableDir).getFileSystem(hconf)
      def qualified(p: String): Path = fs.makeQualified(new Path(p))
      // size < 0 = the manifest predates the size column AND the physical
      // stat failed (file gone) — nothing a scan could read anyway
      val entries = GraftStore.snapshotFileEntries(tableDir, v)
        .filter(_.size >= 0)
      val bySlotDir = entries.groupBy(e =>
        e.path.stripSuffix("/" + e.rel.substring(e.rel.lastIndexOf('/') + 1)))
      val parts = bySlotDir.toSeq.sortBy(_._1).map { case (d, es) =>
        val slot = es.head.slot
        val b = GraftStore.slotBucket(slot)
        val values: Array[Any] = pt match {
          case Some(t) => Array(
            GraftStore.slotPart(slot).map(partInternal(_, t)).orNull, b)
          case None => Array(b)
        }
        val files = es.map(e => new FileStatus(e.size, false, 1, 134217728L,
          0L, qualified(e.path))).toArray
        (PartitionPath(new GenericInternalRow(values), qualified(d)), files)
      }
      val computed = (PartitionSpec(partCols, parts.map(_._1)),
        parts.map(p => p._1.path -> p._2).toMap)
      if (authoredCache.size > 64) authoredCache.clear()
      if (invalidationEpoch.get() == epoch0) authoredCache.put(key, computed)
      computed
    }
    val index = new GraftSlotFileIndex(spark, spec, filesByDir)
    ParquetScanBuilder(spark,
      index, StructType(physSchema.fields ++ partCols.fields), physSchema,
      options)
  }
}

/** A [[PartitioningAwareFileIndex]] whose partition spec AND file listing
  * are authored from the graft store's manifests — the parent's
  * `listFiles` prunes partitions and looks children up in these maps, so
  * planning never touches the filesystem (file names and sizes come from
  * `_fileseq`, written at commit). Version dirs are immutable once
  * published, which is what makes the authored listing sound. */
final class GraftSlotFileIndex(spark: SparkSession, spec0: PartitionSpec,
    filesByDir: Map[Path, Array[FileStatus]])
    extends PartitioningAwareFileIndex(spark,
      Map.empty[String, String], None) {
  override def partitionSpec(): PartitionSpec = spec0
  override def rootPaths: Seq[Path] = spec0.partitions.map(_.path)
  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] = filesByDir
  override val leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = new scala.collection.mutable.LinkedHashMap[Path, FileStatus]()
    filesByDir.valuesIterator.flatten.foreach(f => m.put(f.getPath, f))
    m
  }
  override def refresh(): Unit = ()
}
