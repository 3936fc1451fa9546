package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming materialized aggregate view: the additive companion of
  * [[CompactingSink]] (which keeps latest-per-key). Each micro-batch lands
  * as an immutable per-batch DELTA holding the batch's partial aggregate
  * (LSM-style); the view is the sum of all committed deltas, and a fold
  * step compacts deltas back to one.
  *
  * Exactly-once without a transaction log: additive merges are not
  * idempotent (replaying a batch into a running total double-counts — the
  * at-most-once hazard of the reference's pop-then-execute queue,
  * scheduler.cpp:92-99, inverted), so the store never mutates a running
  * total. A checkpoint-replayed batch re-derives the same batchId and
  * finds its `delta=<id>` already committed → no-op. The fold commits via
  * stage → atomic rename with a crash protocol mirroring the compacting
  * store's ([[recover]]): every interruption either retries the fold or
  * completes it, never drops or double-counts a delta.
  *
  * At 100 TB: deltas are per-key partial aggregates, so each is tiny
  * regardless of batch row count (map-side combine happens in the batch
  * aggregate); the reader merges `#deltas × #keys` rows, and fold
  * frequency bounds #deltas. The cluster-scale landing swaps the dir
  * renames for a manifest commit, same protocol.
  */
object AggregatingSink {

  /** foreachBatch body: aggregate the batch per `keyCols` (summing each of
    * `sumCols`) and commit it as the immutable `delta=<batchId>`.
    * Idempotent under checkpoint replay: an already-committed delta for
    * this batchId is left untouched. */
  def appendDelta(storeDir: String, keyCols: Seq[String], sumCols: Seq[String])
                 (batch: DataFrame, batchId: Long): Unit = {
    recover(storeDir)
    val root = Paths.get(storeDir)
    Files.createDirectories(root)
    val target = root.resolve(s"delta=$batchId")
    if (Files.exists(target)) return // replayed batch: identical content committed
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    val partial = batch.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val staging = root.resolve(s"_staging_delta_$batchId")
    partial.write.mode("overwrite").parquet(staging.toString)
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The merged view: per-key totals over all committed deltas. */
  def read(spark: SparkSession, storeDir: String,
           keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    spark.read.parquet(storeDir)
      .groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Committed delta ids, ascending. */
  def deltaIds(storeDir: String): Seq[Long] = {
    val root = Paths.get(storeDir)
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("delta=")).map(_.stripPrefix("delta=").toLong)
      .toSeq.sorted
    finally s.close()
  }

  /** Fold all committed deltas into one (named after the max folded id).
    * Commit protocol: (1) write the folded aggregate to `_fold_staging_<m>`
    * — droppable at any point; (2) atomic-rename to `_fold_commit_<m>` —
    * THE commit point; (3) delete the folded sources (all `delta=<id>`
    * with id <= m; later batches only ever add higher ids); (4)
    * atomic-rename the commit dir to `delta=<m>`. A crash inside (3)/(4)
    * is completed by [[recover]]; before (2) it is rolled back. Run while
    * the writer is quiescent (between batches), like the split path of the
    * compacting store. */
  def fold(spark: SparkSession, storeDir: String,
           keyCols: Seq[String], sumCols: Seq[String]): Unit = {
    recover(storeDir)
    val ids = deltaIds(storeDir)
    if (ids.size <= 1) return
    val m = ids.max
    val root = Paths.get(storeDir)
    val staging = root.resolve(s"_fold_staging_$m")
    read(spark, storeDir, keyCols, sumCols)
      .write.mode("overwrite").parquet(staging.toString)
    Files.move(staging, root.resolve(s"_fold_commit_$m"), StandardCopyOption.ATOMIC_MOVE)
    completeFold(root, m)
  }

  private def completeFold(root: Path, m: Long): Unit = {
    deltaIds(root.toString).filter(_ <= m)
      .foreach(id => deleteRecursively(root.resolve(s"delta=$id")))
    Files.move(root.resolve(s"_fold_commit_$m"), root.resolve(s"delta=$m"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Crash recovery, safe to run any time the writer is quiescent: drop
    * uncommitted staging (the writing step simply reruns), complete any
    * committed-but-unfinished fold. */
  def recover(storeDir: String): Unit = {
    val root = Paths.get(storeDir)
    if (!Files.isDirectory(root)) return
    val names = {
      val s = Files.list(root)
      try s.iterator().asScala.map(_.getFileName.toString).toList finally s.close()
    }
    names.foreach { n =>
      if (n.startsWith("_staging_delta_") || n.startsWith("_fold_staging_"))
        deleteRecursively(root.resolve(n))
    }
    names.filter(_.startsWith("_fold_commit_"))
      .map(_.stripPrefix("_fold_commit_").toLong)
      .foreach(m => completeFold(root, m))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toList.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
