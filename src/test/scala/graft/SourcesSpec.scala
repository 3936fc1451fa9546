package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S2/S4 source-sink coverage: csv/json/text/binaryFile scans, partitioned
  * writes with zstd/lz4 codecs (SURVEY.md §2.2 S2/S4; workspace-FS analogue
  * filesys.hpp:107-507, payload codecs crypt.hpp / bytecode.cpp). */
class SourcesSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("orc write/read round-trip with zstd codec preserves values") {
    import spark.implicits._
    val dir = tmp("orc")
    val src = Tables.nation(spark, sf).orderBy($"n_nationkey")
    src.write.mode("overwrite").option("compression", "zstd").orc(dir)
    val back = spark.read.orc(dir).orderBy($"n_nationkey")
    assert(back.schema == src.schema)
    assert(back.collect().map(_.toSeq).toSeq == src.collect().map(_.toSeq).toSeq)
  }

  test("csv write/read round-trip preserves rows and schema") {
    import spark.implicits._
    val dir = tmp("csv")
    val src = Tables.customer(spark, sf).orderBy($"c_custkey")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
  }

  test("json write/read round-trip preserves values") {
    import spark.implicits._
    val dir = tmp("json")
    Tables.nation(spark, sf).write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 25)
    assert(back.filter($"n_name".isNotNull).count() == 25)
  }

  test("text + binaryFile sources read raw payloads") {
    import spark.implicits._
    val dir = tmp("text")
    Tables.documents(spark, sf).select($"text").write.mode("overwrite").text(dir)
    assert(spark.read.text(dir).count() == 500)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt").load(dir)
    assert(bin.columns.contains("content") && bin.count() >= 1)
    assert(bin.select(length($"content").cast("long")).head.getLong(0) > 0)
  }

  test("partitioned parquet write with zstd codec, partition-pruned read-back") {
    import spark.implicits._
    val dir = tmp("part")
    Tables.orders(spark, sf)
      .withColumn("y", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("y")
      .option("compression", "zstd").parquet(dir)
    // partition dirs exist
    val years = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("y="))
    assert(years.length > 1, s"expected multiple y= partitions, got ${years.toSeq}")
    // pruned scan only touches one partition
    val one = spark.read.parquet(dir).filter($"y" === 1996)
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(plan.contains("PartitionFilters: [isnotnull(y"), s"partition filter missing:\n$plan")
  }

  test("parquet schema evolution: mergeSchema unifies old and new writers") {
    import spark.implicits._
    val dir = tmp("evolve")
    Tables.region(spark, sf).write.mode("overwrite").parquet(s"$dir/p=1")
    Tables.region(spark, sf).withColumn("r_extra", lit(42L))
      .write.mode("overwrite").parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("r_extra"))
    assert(merged.count() == 10)
    // rows from the old writer surface the new column as null
    assert(merged.filter($"r_extra".isNull).count() == 5)
  }

  test("lz4-codec parquet write round-trips") {
    val dir = tmp("lz4")
    Tables.region(spark, sf).write.mode("overwrite")
      .option("compression", "lz4").parquet(dir)
    assert(spark.read.parquet(dir).count() == 5)
  }
  test("normalizeEventsTs maps every reader shape for TIMESTAMP(NANOS) to micros") {
    import spark.implicits._
    // legacy nanosAsLong build: nanos arrive as BIGINT
    val fromLong = Seq((1L, 1704067200000000000L)).toDF("event_id", "ts")
    assert(Tables.normalizeEventsTs(fromLong)
      .select($"ts".cast("string")).head().getString(0) == "2024-01-01 00:00:00")
    // native build: nanos arrive as TIMESTAMP_NTZ (UTC session)
    val fromNtz = spark.sql(
      "SELECT 1L AS event_id, TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts")
    assert(Tables.normalizeEventsTs(fromNtz)
      .select($"ts".cast("string")).head().getString(0) == "2024-01-01 00:00:00")
    // already-normalized passthrough
    val fromTs = spark.sql("SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts")
    assert(Tables.normalizeEventsTs(fromTs).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // anything else is a loud failure, not a silent wrong answer
    intercept[IllegalStateException] {
      Tables.normalizeEventsTs(Seq((1L, "x")).toDF("event_id", "ts"))
    }
  }
}
