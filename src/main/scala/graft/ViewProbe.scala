package graft
import org.apache.spark.sql.SparkSession
object ViewProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("hprobe").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.catalog.gs", classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gs.warehouse", wh)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE TABLE gs.t (k BIGINT NOT NULL, v BIGINT) USING graft TBLPROPERTIES ('merge_key'='k','buckets'='4')")
    spark.sql("INSERT INTO gs.t SELECT id, CASE WHEN id % 20 = 0 THEN (id % 1000) + 1 ELSE 0 END FROM range(0, 10000)")
    spark.sql("CALL gs.analyze(table => 't', histogram_bins => 32)")
    val qe = spark.sql("SELECT * FROM gs.t WHERE v > 500").queryExecution
    val plan = qe.optimizedPlan
    println("PLAN-CLASS " + plan.getClass.getSimpleName)
    println("TOP-STATS " + plan.stats)
    plan.collect { case p => println(s"NODE ${p.getClass.getSimpleName} rows=${p.stats.rowCount} attrs=${p.stats.attributeStats.map{case(a,c)=>a.name+":"+c.distinctCount+":h="+c.histogram.isDefined}}") }
    spark.stop()
  }
}
