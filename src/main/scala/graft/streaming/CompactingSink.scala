package graft.streaming

import graft.Graft
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The north-star composition (BASELINE.json "spark_approach"): a
  * Structured Streaming consumer whose sink maintains a compacted
  * latest-per-key store — each micro-batch merges into the store and
  * re-compacts, so downstream readers always see exactly one row per key.
  *
  * The store swap is write-to-temp + directory rename (atomic enough for a
  * local store; at scale this becomes a transactional table format commit —
  * the foreachBatch body is the part that stays the same). The reference
  * analogue: the execution queue's tick-drain consuming frames into current
  * state (scheduler.cpp:81-108), upgraded from at-most-once to
  * checkpoint-replayable merges.
  */
object CompactingSink {

  /** foreachBatch body: merge `batch` into the compacted store at
    * `storeDir`, keeping the max-`orderCols` row per `keyCols`. */
  def upsertCompact(storeDir: String, keyCols: Seq[String], orderCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val store = Paths.get(storeDir)
    val existing =
      if (Files.exists(store)) Some(spark.read.parquet(storeDir)) else None
    val all = existing.map(_.unionByName(batch)).getOrElse(batch)
    val compacted = Graft.compactLatest(all, keyCols, orderCols)
    val tmp = storeDir + s"__tmp_$batchId"
    compacted.write.mode("overwrite").parquet(tmp)
    // swap: remove old store, move tmp into place
    if (Files.exists(store)) {
      val old = storeDir + s"__old_$batchId"
      Files.move(store, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(Paths.get(old))
    }
    Files.move(Paths.get(tmp), store, StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(c => deleteRecursively(c))
    Files.deleteIfExists(p)
  }
}
