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
}
