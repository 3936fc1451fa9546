package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 is one [[GraftQuery]] in the
  * module registries below; each carries its own DuckDB oracle SQL where the
  * semantics are SQL-expressible (the driver's t2 gate), and a rows-only
  * entry otherwise (approx sketches, LSH variants).
  */
object SparkEntry {
  /** All declared queries, in module order. */
  lazy val all: Seq[GraftQuery] =
    operators.RelationalQueries.queries ++
    operators.SourceQueries.queries ++
    operators.EventQueries.queries ++
    operators.MessageQueries.queries ++
    operators.TypedAggQueries.queries ++
    operators.ScalarQueries.queries ++
    operators.DedupQueries.queries ++
    operators.TextQueries.queries ++
    operators.PipelineQueries.queries ++
    operators.SimilarityQueries.queries ++
    operators.MultimodalQueries.queries ++
    operators.GraphQueries.queries ++
    operators.ProfileQueries.queries ++
    streaming.StreamingQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap

  /** Headline subset for the per-round benchmark (Bench.scala). */
  lazy val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
