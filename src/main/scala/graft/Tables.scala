package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Tables are plain parquet files under `/root/testdata/sf{N}/<name>.parquet`.
  * Every query receives the sf dir at call time, so nothing here caches
  * across scale factors. At cluster scale these would be catalog tables
  * partitioned by date; the reader path is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so `spark.sql` queries (and the
    * DuckDB oracle, which sees the same names) can reference them. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** events.parquet stores TIMESTAMP(NANOS). How Spark surfaces that column
    * depends on the build: with `spark.sql.legacy.parquet.nanosAsLong=true`
    * honored it arrives as a nanos BIGINT; newer 4.x builds ignore the
    * legacy conf and read it natively as TIMESTAMP_NTZ (micros, truncated —
    * exactly what DuckDB's reader does, so oracle semantics agree either
    * way). [[normalizeEventsTs]] maps both shapes to a micros TIMESTAMP, so
    * callers never see the difference. The conf is still set (builder-level
    * in every main; best-effort here) for builds that honor it. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true"))
      try spark.conf.set(key, "true") catch { case _: Exception => () }
    load(spark, dir, "events")
  }

  /** Normalize the events `ts` column — whatever type this Spark build's
    * parquet reader produced for TIMESTAMP(NANOS) — to a micros TIMESTAMP
    * in the session time zone (UTC everywhere in this project). Shared by
    * the batch loader, the streaming source, and the test fixtures. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // legacy nanosAsLong path: nanos bigint → micros
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // native nanos path: NTZ micros, UTC session
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"unexpected events.ts type from the parquet reader: $other")
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(eventsRaw(s, d))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
