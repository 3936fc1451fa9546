package graft

import org.apache.spark.sql.SparkSession

/** Scratch audit tool (not part of the driver contract):
  *   runMain graft.Scratch <sfDir> [queryNames...]   → formatted plans
  *   runMain graft.Scratch <sfDir> --time            → cold/warm timings
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1) == "--time") {
      SparkEntry.benchNames.foreach { n =>
        def run() = {
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = run(); val warm = run(); val warm2 = run()
        println(f"[time] $n%-24s cold=$cold%6.2f warm=$warm%6.2f warm2=$warm2%6.2f")
      }
    } else {
      val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.benchNames
      names.foreach { n =>
        println(s"\n########## $n ##########")
        val df = SparkEntry.queries(n)(spark, d)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
