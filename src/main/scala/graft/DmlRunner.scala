package graft

import org.apache.spark.sql.SparkSession

/** Batch executor for the DML-sequence fuzzer (scripts/fuzz_dml.py): reads
  * a JSON object {name: [statement, ...]} where every statement is SQL text
  * against the `graftdml` catalog and the LAST statement is a SELECT; runs
  * each sequence in order, writes the final SELECT result to
  * `<outDir>/<name>` and the table's per-version changelog op counts to
  * `<outDir>/<name>__changes` (both parquet). The Python side mirrors the
  * sequence against its own state model and diffs both outputs. */
object DmlRunner {
  def main(args: Array[String]): Unit = {
    val Array(warehouse, seqJson, outDir) = args.take(3)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-dml-fuzz")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graftdml",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.graftdml.warehouse", warehouse)
      .config("spark.sql.extensions",
        classOf[graft.sources.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(seqJson))
    val sequences: Seq[(String, Seq[String])] = {
      import scala.jdk.CollectionConverters._
      root.properties().asScala.toSeq.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
      }
    }

    sequences.foreach { case (name, stmts) =>
      try {
        // every statement — DML, ALTER, and maintenance CALLs — is plain
        // SQL against the catalog (maintenance runs as native DSv2 stored
        // procedures, GraftProcedures)
        stmts.init.foreach(spark.sql(_).collect())
        spark.sql(stmts.last).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        val table = stmts.init.collectFirst {
          case s if s.toUpperCase.startsWith("CREATE TABLE") =>
            s.split("\\s+")(2) // graftdml.<t>
        }.get.split("\\.")(1)
        spark.sql(
          s"""SELECT change_version, change_op, COUNT(*) AS n
              FROM graftdml.`$table$$changes`
              GROUP BY change_version, change_op
              ORDER BY change_version, change_op""")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/${name}__changes")
        println(s"[dmlrunner] $name ok")
      } catch {
        case e: Exception =>
          System.err.println(s"[dmlrunner] $name failed: ${e.toString.take(500)}")
          e.getStackTrace.take(3).foreach(f => System.err.println(s"[dmlrunner]   at $f"))
      }
    }
    spark.stop()
  }
}
