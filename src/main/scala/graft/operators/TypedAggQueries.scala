package graft.operators

import graft.{GraftQuery, Tables => T}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A5: the custom typed-Aggregator surface (`Aggregator[IN, BUF, OUT]` via
  * `udaf`). The exemplar aggregates 2-decimal money into exact integer
  * cents — integer buffer, so partial+final merge order can't introduce FP
  * drift and the DuckDB oracle matches bit-for-bit.
  */
object ExactCentsSum extends Aggregator[Double, Long, Long] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: Double): Long = b + math.round(a * 100)
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object TypedAggQueries {
  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("a5_typed_aggregator", (s, d) => {
      import s.implicits._
      val centsSum = udaf(ExactCentsSum)
      T.events(s, d)
        .groupBy($"event_type")
        .agg(centsSum($"value").as("cents"), count(lit(1)).as("n"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type,
        CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
