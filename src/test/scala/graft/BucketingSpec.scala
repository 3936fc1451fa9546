package graft

import org.apache.spark.sql.functions._

/** Bucketed tables: the co-located-join layout for 100 TB fact-fact joins
  * (DESIGN.md "Joins"). Both sides bucketed by the join key into the same
  * bucket count → the join plans with zero Exchange. */
class BucketingSpec extends SparkTestBase {

  test("matching bucketed tables join without a shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce an exchange on either side
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles lineitem:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles orders:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }

  test("z-ordered layout localizes point filters on both dimensions") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_spec")
    base.toFile.deleteOnExit()
    val src = Tables.events(spark, sf).select($"user_id", $"event_id",
      unix_micros($"ts").as("tsu"))
    val nFiles = 16
    Graft.zorderWrite(src, "user_id", "tsu", s"$base/z", nFiles)
    // baseline: same data, time-sorted only — the layout a naive writer
    // produces; selective user filters then touch ~every file
    src.repartitionByRange(nFiles, $"tsu").sortWithinPartitions("tsu")
      .write.parquet(s"$base/t")
    val z = spark.read.parquet(s"$base/z")
    val t = spark.read.parquet(s"$base/t")
    def filesTouched(df: org.apache.spark.sql.DataFrame,
                     p: org.apache.spark.sql.Column): Long =
      df.filter(p).select(input_file_name()).distinct().count()
    // sample users spread across the id range
    val users = src.select($"user_id").distinct().orderBy($"user_id")
      .collect().map(_.getLong(0))
    val sample = Seq(users.head, users(users.length / 3),
      users(2 * users.length / 3), users.last)
    val zTouch = sample.map(u => filesTouched(z, $"user_id" === u)).sum
    val tTouch = sample.map(u => filesTouched(t, $"user_id" === u)).sum
    // a 16-cut z-curve confines one user to ~1/4 of the files; the
    // time-sorted layout has every user in ~every file (2x slack each way)
    assert(zTouch <= sample.size * nFiles / 2,
      s"z-order layout not localized: $zTouch files touched for ${sample.size} users")
    assert(zTouch * 2 <= tTouch,
      s"z-order ($zTouch) did not beat time-sorted layout ($tTouch)")
    // and the time dimension stays localized too: a quarter of the time
    // range must not touch every z file
    val bounds = src.agg(min($"tsu"), max($"tsu")).head()
    val (tlo, thi) = (bounds.getLong(0), bounds.getLong(1))
    val cut = tlo + (thi - tlo) / 4
    assert(filesTouched(z, $"tsu" <= cut) <= nFiles * 3 / 4,
      "a quarter-range time filter touched nearly every z-ordered file")
  }
}
