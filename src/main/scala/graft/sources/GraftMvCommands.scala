package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** The three materialized-view statements Spark's grammar lacks —
  *
  *   CREATE MATERIALIZED VIEW [IF NOT EXISTS] <cat>.<ns>.<name> AS <query>
  *   DROP MATERIALIZED VIEW [IF EXISTS] <cat>.<ns>.<name>
  *   REFRESH MATERIALIZED VIEW <cat>.<ns>.<name>
  *
  * — intercepted by a delegating parser (the standard session-extension
  * shape: claim the statements the stock grammar can't parse, delegate
  * everything else verbatim). The name is validated through the
  * delegate's own `parseMultipartIdentifier`, so quoting/namespacing
  * rules stay exactly Spark's. `CALL <cat>.sys.refresh_mv(view => ...)`
  * is the procedural spelling of REFRESH (same code path). */
final class GraftMvParser(delegate: ParserInterface) extends ParserInterface {
  import GraftMvParser._

  private def intercept(sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(ifNot, name, query) =>
      Some(GraftCreateMvCommand(delegate.parseMultipartIdentifier(name),
        ifNotExists = ifNot != null, query.trim.stripSuffix(";").trim))
    case DropRe(ifEx, name) =>
      Some(GraftDropMvCommand(delegate.parseMultipartIdentifier(name),
        ifExists = ifEx != null))
    case RefreshRe(name) =>
      Some(GraftRefreshMvCommand(delegate.parseMultipartIdentifier(name)))
    case ShowRe(ns) =>
      Some(GraftShowMvsCommand(delegate.parseMultipartIdentifier(ns)))
    case _ => None
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    intercept(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    intercept(sqlText).getOrElse(
      delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

private object GraftMvParser {
  // Identifier chars: word chars, backquoted parts, and dots — the
  // delegate's parseMultipartIdentifier is the real validator.
  private val Ident = """((?:[\w$]|`[^`]*`|\.)+)"""
  val CreateRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+NOT\s+EXISTS)\s+)?""" +
      Ident + """\s+AS\s+(.+?)\s*""").r
  val DropRe =
    ("""(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?""" +
      Ident + """\s*;?\s*""").r
  val RefreshRe =
    ("""(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+""" + Ident + """\s*;?\s*""").r
  val ShowRe =
    ("""(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s+(?:IN|FROM)\s+""" +
      Ident + """\s*;?\s*""").r
}

private object GraftMvTarget {
  def apply(spark: SparkSession, nameParts: Seq[String], stmt: String)
      : (String, GraftCatalog, org.apache.spark.sql.connector.catalog.Identifier) =
    GraftViewResolution.graftTarget(spark, nameParts).getOrElse(
      throw new UnsupportedOperationException(
        s"$stmt requires an explicitly qualified graft-catalog name " +
          s"(<catalog>.<ns>.<name>), got ${nameParts.mkString(".")}"))
}

final case class GraftCreateMvCommand(nameParts: Seq[String],
    ifNotExists: Boolean, query: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, g, id) =
      GraftMvTarget(spark, nameParts, "CREATE MATERIALIZED VIEW")
    GraftMaterializedViews.create(spark, cat, g, id, query, ifNotExists)
    Nil
  }
}

final case class GraftDropMvCommand(nameParts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (_, g, id) =
      GraftMvTarget(spark, nameParts, "DROP MATERIALIZED VIEW")
    GraftMaterializedViews.drop(g, id, ifExists)
    Nil
  }
}

final case class GraftShowMvsCommand(nsParts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // `SHOW MATERIALIZED VIEWS IN <catalog>[.<ns>]` — the namespace form
    // mirrors SHOW VIEWS; listing is metadata-only (one dir listing)
    val (cat, g, ns) =
      GraftViewResolution.graftTarget(spark, nsParts :+ "_") match {
        case Some((c, g0, id)) => (c, g0, id.namespace().toSeq)
        case None => throw new UnsupportedOperationException(
          "SHOW MATERIALIZED VIEWS requires a graft catalog namespace " +
            s"(<catalog>[.<ns>]), got ${nsParts.mkString(".")}")
      }
    g.listMvs(ns).map(id =>
      Row((cat +: id.namespace().toSeq).mkString("."), id.name())).toSeq
  }
}

final case class GraftRefreshMvCommand(nameParts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("mode", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, g, id) =
      GraftMvTarget(spark, nameParts, "REFRESH MATERIALIZED VIEW")
    val (v, mode) = GraftMaterializedViews.refresh(spark, cat, g, id)
    Seq(Row(v, mode))
  }
}
