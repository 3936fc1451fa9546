package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Differential-fuzz runner: reads a JSON map name→SQL (written by
  * scripts/fuzz_oracle.py), executes each statement with spark.sql over the
  * registered testdata views, writes one parquet dir per name. The Python
  * side runs the identical SQL in DuckDB and diffs — the §5.5
  * property-based differential against the oracle. */
object SqlRunner {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sqlJson, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[graft.sources.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // minimal JSON object parser for {"name": "sql", ...} with escapes
    val text = Files.readString(Paths.get(sqlJson))
    val entries = parseJsonObject(text)
    entries.foreach { case (name, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[sqlrunner] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }

  /** Parse a flat {"k":"v",...} JSON object (string values only). */
  def parseJsonObject(s: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = s.indexOf('{') + 1
    def parseString(): String = {
      while (s(i) != '"') i += 1
      i += 1
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    while (s.indexOf('"', i) >= 0 && s.lastIndexOf('}') > s.indexOf('"', i)) {
      val k = parseString()
      while (s(i) != ':') i += 1
      i += 1
      val v = parseString()
      out += (k -> v)
      while (i < s.length && s(i) != ',' && s(i) != '}') i += 1
      if (i >= s.length || s(i) == '}') return out.result()
      i += 1
    }
    out.result()
  }
}
