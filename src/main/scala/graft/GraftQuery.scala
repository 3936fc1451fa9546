package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared operator from SURVEY.md §2: a Spark build function plus an
  * optional DuckDB oracle SQL over the same tables. Queries without an
  * oracle (approx sketches, LSH variants whose recall is probabilistic)
  * get the driver's weaker rows-only check.
  *
  * Determinism contract (required for the driver's hash compare):
  *  - every query output is totally ordered (ORDER BY a unique key set);
  *  - floating aggregates are computed in exact decimal and cast to double
  *    at the end (bit-identical in Spark and DuckDB as long as the
  *    unscaled value fits in 2^53 — it does at these scales);
  *  - timestamps are emitted as formatted strings or DATEs, never raw
  *    TIMESTAMP columns (parquet tz-awareness differs between writers).
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Shared deterministic-arithmetic helpers used across query modules. */
object Det {
  /** Cast a 2-decimal money double to exact decimal. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  val one: Column = lit(1).cast(DecimalType(18, 2))

  /** Exact decimal sum emitted as double (bit-identical across engines). */
  def moneySum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** price * (1 - discount) in exact decimal. */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (one - dec(discount))

  /** events.value (2-decimal double) as exact integer cents. */
  def vcents(c: Column): Column = round(c * 100).cast(LongType)

  /** Timestamp → second-precision string, matching DuckDB strftime. */
  def tsFmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** DuckDB-side fragments mirroring the helpers above. */
  object sql {
    def dec(col: String): String = s"CAST($col AS DECIMAL(18,2))"
    def moneySum(col: String): String = s"CAST(SUM(${dec(col)}) AS DOUBLE)"
    def discPrice(p: String, d: String): String = s"${dec(p)} * (1 - ${dec(d)})"
    def vcents(col: String): String = s"CAST(round($col * 100) AS BIGINT)"
    def tsFmt(col: String): String = s"strftime($col, '%Y-%m-%d %H:%M:%S')"
  }
}
