package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream offset = committed store version (exclusive lower bound when used
  * as a range start). */
final case class GraftVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** `spark.readStream.table("cat.\`t$changes\`")` — the changelog as a
  * native DSv2 micro-batch stream with VERSION-ALIGNED batches: each
  * micro-batch is exactly the change slices of versions (start, end], so a
  * batch boundary is always a transaction boundary (the file-stream
  * alternative, [[GraftStore.streamChanges]], batches by file discovery
  * and can split a version across batches). Offsets are plain version
  * numbers — checkpointable, replayable, resumable.
  *
  * Planning delegates to the stock parquet machinery: per batch, a
  * ParquetTable over exactly the `change_version=N` directories in range
  * (with `basePath` so the version survives as a column) plans the file
  * partitions; one shared reader factory (schema-identical across batches)
  * serves them. Streaming v2 relations bypass column pruning, so the
  * stream always reads the full changes schema — physical names map to
  * logical positionally, same as the batch path.
  *
  * Retention: versions expired by `expire_changes` simply have no
  * directory — a catch-up stream starting below the horizon streams what
  * is retained (the standard log-compaction contract; consumers needing
  * older history re-snapshot). */
final class GraftChangesMicroBatchStream(dir: String, meta: GraftTableMeta)
    extends MicroBatchStream {

  private def spark = SparkSession.active

  private def retainedVersions: Seq[Long] = {
    val root = Paths.get(GraftStore.changesRoot(dir))
    if (!Files.isDirectory(root)) Seq.empty
    else GraftStore.listDir(root)(_.map(_.getFileName.toString)
      .filter(_.startsWith(s"${GraftStore.ChangeVersionCol}="))
      .map(_.split("=")(1).toLong).toSeq.sorted)
  }

  override def initialOffset(): Offset = {
    GraftStore.recoverChangelog(dir)
    val vs = retainedVersions
    // start BEFORE the earliest retained slice so the first batch carries
    // the full retained history; an empty changelog starts at the current
    // version (only future commits stream)
    GraftVersionOffset(
      if (vs.nonEmpty) vs.min - 1 else GraftStore.currentVersion(dir))
  }

  override def latestOffset(): Offset = {
    GraftStore.recoverChangelog(dir)
    GraftVersionOffset(GraftStore.currentVersion(dir))
  }

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val e = end.asInstanceOf[GraftVersionOffset].v
    val dirs = ((s + 1) to e)
      .map(v => s"${GraftStore.changesRoot(dir)}/${GraftStore.ChangeVersionCol}=$v")
      .filter(p => Files.isDirectory(Paths.get(p)))
    if (dirs.isEmpty) return Array.empty
    batchScan(dirs).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // schema-driven, not file-driven: one factory serves every batch's
    // file partitions (they all share the physical changes schema)
    batchScan(Seq(GraftStore.changesRoot(dir))).toBatch.createReaderFactory()

  private def batchScan(paths: Seq[String]) = {
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("basePath", GraftStore.changesRoot(dir)))
    ParquetTable(s"graft-changes-stream:$dir", spark, opts, paths,
      Some(GraftStore.physicalChangesSchema(meta)), classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
  }
}
