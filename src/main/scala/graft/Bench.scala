package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries (GraftQuery.bench) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully executed
  * (count() of the final plan — results are small aggregates/top-ks, so this
  * measures the pipeline, not the driver collect).
  */
object Bench {
  /** Bench-only: the a3 sketches without their exact-answer companions.
    * The gate query (a3_approx_sketch) computes sketch AND exact side by
    * side to emit its correctness booleans; at 100 TB only the sketch
    * would run, so the bench measures the operator alone here. Lives
    * outside SparkEntry.queries on purpose — it has no oracle form. */
  private def a3SketchOnly(spark: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.lineitem(spark, d).agg(
      approx_count_distinct(col("l_partkey")).as("apx_parts"),
      expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)").as("apx_q"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm each headline query once at the smallest sf: schemas are
    // identical across scale factors, so this compiles the same
    // whole-stage-codegen classes and JITs the same paths — the measured
    // numbers below are then engine throughput at sfDir, not compiler
    // latency (methodology recorded in BASELINE.md)
    val benched: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      SparkEntry.benchNames.map(n => n -> SparkEntry.queries(n)) :+
        ("a3_sketch_only" -> (a3SketchOnly _))
    benched.foreach { case (_, build) =>
      try build(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val results = benched.map { case (name, build) =>
      val t0 = System.nanoTime()
      try { build(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
