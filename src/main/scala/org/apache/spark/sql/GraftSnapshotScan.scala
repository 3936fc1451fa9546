package org.apache.spark.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, Literal}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, NoopCache, PartitionPath, PartitionSpec}
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
    * columns ([`gpart`,] `gbucket`) are appended here. */
  def parquetScanBuilder(spark: SparkSession, tableDir: String, v: Long,
      meta: GraftTableMeta, physSchema: StructType,
      options: CaseInsensitiveStringMap): ParquetScanBuilder = {
    val hconf = spark.sessionState.newHadoopConf()
    def qualified(p: String): Path = {
      val hp = new Path(p)
      hp.getFileSystem(hconf).makeQualified(hp)
    }
    val pt = partType(meta, physSchema)
    val partCols = StructType(
      pt.map(t => StructField(GraftStore.PartCol, t, nullable = true)).toSeq :+
        StructField(GraftStore.BucketCol, IntegerType, nullable = true))
    val parts = GraftStore.resolvedSlotDirs(tableDir, v)
      .flatMap { case (slot, dirs) =>
        val b = GraftStore.slotBucket(slot)
        val values: Array[Any] = pt match {
          case Some(t) => Array(
            GraftStore.slotPart(slot).map(partInternal(_, t)).orNull, b)
          case None => Array(b)
        }
        dirs.map(d => PartitionPath(
          new GenericInternalRow(values.clone()), qualified(d)))
      }
    val spec = PartitionSpec(partCols, parts)
    val index = new InMemoryFileIndex(spark, parts.map(_.path),
      Map.empty[String, String], None, NoopCache, Some(spec), None)
    ParquetScanBuilder(spark,
      index, StructType(physSchema.fields ++ partCols.fields), physSchema,
      options)
  }
}
