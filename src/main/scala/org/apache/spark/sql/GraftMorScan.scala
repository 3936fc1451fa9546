package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.CustomMetric
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Scan-side application of the graft store's MERGE-ON-READ delete slices
  * (see [[graft.sources.GraftStore]]'s merge-on-read section). Active only
  * while a version has live `_dv` slices — a compacted table bypasses this
  * wrapper entirely, paying nothing.
  *
  * The read rule is per (key, file): a row is dead iff the newest delete
  * entry for its key is NEWER than the file that holds the row (per-file
  * seq from the `_fileseq` manifest). The delete set is cap-bounded by the
  * write side ([[graft.sources.GraftStore.morMaxLiveDeletes]]), so it
  * ships to executors as a plain in-memory probe map — the Iceberg
  * equality-delete shape, minus the shuffle a join-based application would
  * cost.
  *
  * Mechanics:
  *  - column pruning is AUGMENTED with the merge-key columns (the probe
  *    needs them), and rows/batches are projected back to the requested
  *    schema after the filter — the extra read is key columns only, and
  *    only while deletes are live;
  *  - files that CAN hold dead rows (their bucket has entries newer than
  *    the file) become row-filtered single-file reads; every other file
  *    keeps the delegate's columnar path untouched;
  *  - aggregate pushdown and exact manifest row counts are withheld by the
  *    catalog while deletes are live (footers count dead rows);
  *  - bucket pruning, zone maps and DPP runtime filtering still run in the
  *    wrapped scan — delete application only ever REMOVES rows, so every
  *    pruning decision below stays valid. */
final class GraftMorScanBuilder(inner: ScanBuilder,
    keyCols: Seq[String], tableSchema: StructType,
    dv: Map[Int, Map[Seq[Any], Long]], fileSeq: Map[String, Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  /** Requested output schema; inner reads this PLUS any missing key cols. */
  private var requested: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    requested = Some(requiredSchema)
    val missing = keyCols.filterNot(requiredSchema.fieldNames.contains)
    val augmented = StructType(
      requiredSchema.fields ++ missing.map(tableSchema(_)))
    inner match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(augmented)
      case _ => ()
    }
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner match {
      case p: SupportsPushDownCatalystFilters => p.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters(): Array[Predicate] = inner match {
    case p: SupportsPushDownCatalystFilters => p.pushedFilters
    case _ => Array.empty
  }

  override def build(): Scan =
    new GraftMorScan(inner.build(), requested, keyCols, dv, fileSeq)
}

/** One BUCKET's files that may hold deleted rows, carrying the bucket's
  * own delete entries (key → newest delete seq): each file is read
  * row-wise and probed. Self-contained on purpose — the reader needs no
  * scan-level state, so a partition planned against version N stays
  * correct even if the factory is built later (the streaming snapshot
  * leg), and the serialized delete slice ships exactly once per bucket.
  * `seqs` parallels `files`. */
final case class GraftMorFilterPartition(index: Int,
    files: Array[PartitionedFile], seqs: Array[Long],
    bucketDv: Map[Seq[Any], Long])
    extends InputPartition {
  override def preferredLocations(): Array[String] =
    FilePartition(index, files).preferredLocations()
}

final class GraftMorScan(delegate: Scan, requested: Option[StructType],
    keyCols: Seq[String], dv: Map[Int, Map[Seq[Any], Long]],
    fileSeq: Map[String, Long])
    extends Scan with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  override def readSchema(): StructType =
    requested.getOrElse(delegate.readSchema())

  override def description(): String = s"GraftMor(${delegate.description()})"
  override def supportedCustomMetrics(): Array[CustomMetric] =
    delegate.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    delegate.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED

  // DPP runtime filtering forwards so join-time bucket pruning still works
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    delegate match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        f.filterAttributes()
      case _ => Array.empty
    }
  override def filter(predicates: Array[Predicate]): Unit = delegate match {
    case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
      f.filter(predicates)
    case _ => ()
  }

  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    private val innerBatch = delegate.toBatch
    private val bucketRe =
      ("(?:^|/)" + graft.sources.GraftStore.BucketCol + "=(\\d+)(?:/|$)").r
    private val relRe = "/v\\d{10}/(.+)$".r
    // newest delete seq per bucket: files at/after it can't hold dead rows
    private val maxDseq: Map[Int, Long] =
      dv.map { case (b, m) => b -> m.values.max }

    // Planned FRESH on every call — BatchScanExec re-plans after a
    // runtime filter lands (SupportsRuntimeV2Filtering), and a cached
    // plan would silently hand DPP the pre-filter file set. Fresh
    // planning stays consistent with the constant reader factory because
    // runtime filters only ever REMOVE files.
    override def planInputPartitions(): Array[InputPartition] = {
      val parts = innerBatch.planInputPartitions()
      require(parts.forall(_.isInstanceOf[FilePartition]),
        s"merge-on-read scan expected file partitions, got " +
          parts.find(!_.isInstanceOf[FilePartition]).map(_.getClass).orNull)
      val out = Array.newBuilder[InputPartition]
      var idx = 0
      // per-bucket accumulation: every filtered file of a bucket lands in
      // ONE partition so its delete slice serializes exactly once
      val filtered = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.ArrayBuffer[(PartitionedFile, Long)]]
      parts.iterator.map(_.asInstanceOf[FilePartition]).foreach { fp =>
        val plain = Array.newBuilder[PartitionedFile]
        fp.files.foreach { pf =>
          val path = pf.filePath.toString
          val bucket = bucketRe.findFirstMatchIn(path).map(_.group(1).toInt)
          val rel = relRe.findFirstMatchIn(path).map(_.group(1))
          bucket match {
            case Some(b) if dv.contains(b) =>
              val seq = rel.flatMap(fileSeq.get).getOrElse(0L)
              if (seq < maxDseq(b))
                filtered.getOrElseUpdate(b,
                  scala.collection.mutable.ArrayBuffer.empty) += ((pf, seq))
              else plain += pf
            case Some(_) => plain += pf
            case None =>
              // a store version dir always buckets its files; refuse to
              // guess rather than resurrect deleted rows
              sys.error(s"file outside a bucket dir in a merge-on-read " +
                s"version: $path")
          }
        }
        val p = plain.result()
        if (p.nonEmpty) { out += FilePartition(idx, p); idx += 1 }
      }
      filtered.toSeq.sortBy(_._1).foreach { case (b, fs) =>
        out += GraftMorFilterPartition(idx, fs.map(_._1).toArray,
          fs.map(_._2).toArray, dv(b))
        idx += 1
      }
      out.result()
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val innerSchema = delegate.readSchema()
      val keyOrdinals = keyCols.map(innerSchema.fieldIndex).toArray
      val keyTypes = keyOrdinals.map(innerSchema(_).dataType)
      // augmentation appends missing keys AFTER the requested fields, so
      // the projection back is "keep the first N columns"
      val keepCols = requested match {
        case Some(r) if r.length != innerSchema.length => Some(r)
        case _ => None
      }
      // Spark's PARTITION_DEFINED columnar mode refuses a plan that mixes
      // columnar and row partitions, so the whole scan reads row-based
      // while the wrapper is active (it only installs when delete slices
      // exist, and a fresh mor commit's base files always need filtering).
      // A constant decision also keeps the factory consistent with any
      // runtime-filtered re-plan. Transient: optimize clears the slices
      // and the wrapper disappears entirely.
      new GraftMorReaderFactory(innerBatch.createReaderFactory(),
        keyOrdinals, keyTypes, keepCols, forceRowBased = true)
    }
  }
}

final class GraftMorReaderFactory(inner: PartitionReaderFactory,
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType], keepCols: Option[StructType],
    forceRowBased: Boolean)
    extends PartitionReaderFactory {

  private def projectRow(r: PartitionReader[InternalRow])
      : PartitionReader[InternalRow] = keepCols match {
    case None => r
    case Some(schema) =>
      val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(schema,
        (0 until schema.length).toIndexedSeq)
      new PartitionReader[InternalRow] {
        override def next(): Boolean = r.next()
        override def get(): InternalRow = { proj.project(r.get()); proj }
        override def close(): Unit = r.close()
      }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case fp: FilePartition => projectRow(inner.createReader(fp))
      case mp: GraftMorFilterPartition =>
        projectRow(new GraftMorFilteringReader(inner, mp, keyOrdinals,
          keyTypes))
      case other => inner.createReader(other)
    }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val r = inner.createColumnarReader(p.asInstanceOf[FilePartition])
    keepCols match {
      case None => r
      case Some(schema) =>
        val n = schema.length
        new PartitionReader[ColumnarBatch] {
          override def next(): Boolean = r.next()
          override def get(): ColumnarBatch = {
            val b = r.get()
            new ColumnarBatch(
              Array.tabulate(n)(b.column), b.numRows())
          }
          override def close(): Unit = r.close()
        }
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case fp: FilePartition => !forceRowBased && inner.supportColumnarReads(fp)
    case _ => false
  }
}

/** Chains one row reader per file, dropping rows whose key has a delete
  * entry newer than the file. */
final class GraftMorFilteringReader(factory: PartitionReaderFactory,
    mp: GraftMorFilterPartition,
    keyOrdinals: Array[Int], keyTypes: Array[DataType])
    extends PartitionReader[InternalRow] {

  private var fileIdx = -1
  private var current: PartitionReader[InternalRow] = null
  private val bucketDv: Map[Seq[Any], Long] = mp.bucketDv
  private var fileSeq = 0L
  private var row: InternalRow = null

  private def openNext(): Boolean = {
    if (current != null) { current.close(); current = null }
    fileIdx += 1
    if (fileIdx >= mp.files.length) return false
    current = factory.createReader(
      FilePartition(mp.index, Array(mp.files(fileIdx))))
    fileSeq = mp.seqs(fileIdx)
    true
  }

  private def live(r: InternalRow): Boolean = {
    val n = keyOrdinals.length
    val key = new Array[Any](n)
    var i = 0
    while (i < n) {
      key(i) = GraftMorScanSupport.normalizeKey(
        r.get(keyOrdinals(i), keyTypes(i)))
      i += 1
    }
    bucketDv.get(scala.collection.immutable.ArraySeq.unsafeWrapArray(key)) match {
      case Some(dseq) => dseq <= fileSeq // delete older than the file: live
      case None => true
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (current == null && !openNext()) return false
      if (current.next()) {
        val r = current.get()
        if (live(r)) { row = r; return true }
      } else {
        current.close(); current = null
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (current != null) current.close()
}

object GraftMorScanSupport {
  /** Canonical catalyst key value for probe equality: signed zeros fold
    * (Spark's own join semantics treat -0.0 = 0.0); everything else probes
    * as-is. */
  def normalizeKey(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue() == 0.0d => java.lang.Double.valueOf(0.0d)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case other => other
  }
}
