package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Transparent materialized-view rewrite (S39c): a resolved query whose
  * `Aggregate` is semantically the body of a FRESH materialized view is
  * answered from the MV's state table — one scan of |view| rows — without
  * the user naming the MV. The standard warehouse lever: ETL keeps
  * querying base tables, dashboards get MV latency the moment someone
  * materializes the rollup.
  *
  * Matching is EXACT-BODY: the candidate MV's stored SQL is analyzed in
  * its definer context, its relations are REBASED onto the query's own
  * relation instances (two `loadTable` calls yield distinct Table objects
  * that defeat canonical comparison by reference; sharing the leaves and
  * remapping the body's attribute ids makes `sameResult` see through
  * alias/exprId/COUNT(*)-vs-COUNT(1) noise), and the canonical plans must
  * agree. No containment/rollup derivation — a non-match just runs the
  * query as written.
  *
  * Substitution happens ONLY when the MV is fresh — the state's txn
  * watermark equals the watermark table's current version and every dim
  * sits at its recorded version (exactly [[GraftMaterializedViews
  * .isFresh]], the same math `mv$mv` reports) — so the rewrite can never
  * serve data a direct evaluation wouldn't. A stale MV leaves the plan
  * untouched; freshness is re-checked per planning, not cached.
  *
  * Safety rails: never fires inside the MV machinery's own evaluations
  * ([[GraftMaterializedViews.inMaintenance]] — a recompute matching its
  * own MV would read its own stale state, and candidate analysis inside
  * the rule would recurse), never on streaming plans, never when any
  * query relation is version-pinned (time travel must read history), and
  * positional output types must agree exactly. Kill switch:
  * `spark.graft.mv.rewrite.enabled=false`.
  */
final case class GraftMvRewriteRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mv.rewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (GraftMaterializedViews.inMaintenance.value || !enabled) return plan
    if (!plan.exists(_.isInstanceOf[Aggregate])) return plan
    plan.transformUp {
      case a: Aggregate if a.resolved && !a.isStreaming =>
        tryRewrite(a).getOrElse(a)
    }
  }

  private def graftRels(p: LogicalPlan): Seq[DataSourceV2Relation] =
    p.collect {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
    }

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = {
    val qRels = graftRels(a)
    if (qRels.isEmpty) return None
    // a pinned relation is a time-travel read: history, never the state
    if (qRels.exists(_.table.asInstanceOf[GraftTable].pinned.nonEmpty))
      return None
    val qNames = qRels.map(_.table.name()).toSet
    val cats = qRels.flatMap(_.catalog).collect {
      case gc: GraftCatalog => gc }.distinct
    cats.iterator.flatMap { g =>
      g.listAllMvs().iterator.flatMap(id => matchMv(a, g, id, qRels, qNames))
    }.nextOption()
  }

  private def matchMv(a: Aggregate, g: GraftCatalog, id: Identifier,
      qRels: Seq[DataSourceV2Relation], qNames: Set[String])
      : Option[LogicalPlan] = {
    val rec =
      try GraftMaterializedViews.readRecordCached(g.mvPath(id))
      catch { case NonFatal(_) => return None }
    // prefilter before any analysis: a never-refreshed MV (no recorded
    // sources) can't be fresh; disjoint table sets can't match
    if (rec.sources.isEmpty || !rec.sources.keySet.exists(qNames)) return None
    val stateDir = g.mvStateDir(id)
    if (!GraftStore.exists(stateDir)) return None
    val key = (g.name() +: id.namespace().toSeq :+ id.name()).mkString(".")
    val analyzed =
      try GraftMaterializedViews.inMaintenance.withValue(true) {
        GraftMaterializedViews.analyzeBody(spark, rec, key)
      } catch { case NonFatal(_) => return None }
    // the state's public columns must still be what the body produces
    if (!analyzed.schema.fieldNames.sameElements(
        rec.outputSchema.fieldNames)) return None
    val bodyCore = analyzed match {
      case s: Sort => s.child
      case p => p
    }
    if (!bodyCore.isInstanceOf[Aggregate]) return None

    // rebase the body onto the QUERY's relation instances (same dirs, in
    // order) and remap its attribute ids onto theirs, so sameResult's
    // canonical comparison sees shared leaves instead of two Table
    // objects that only differ by reference
    val bRels = graftRels(bodyCore)
    if (bRels.size != qRels.size) return None
    def dirOf(r: DataSourceV2Relation) =
      r.table.asInstanceOf[GraftTable].tableDir
    if (bRels.map(dirOf) != qRels.map(dirOf)) return None
    if (bRels.exists(_.table.asInstanceOf[GraftTable].pinned.nonEmpty))
      return None
    val pairs = bRels.zip(qRels)
    if (pairs.exists { case (b, q) =>
        b.output.exists(ba => !q.output.exists(_.name == ba.name)) })
      return None
    val attrMap = pairs.flatMap { case (b, q) =>
      b.output.flatMap(ba =>
        q.output.find(_.name == ba.name).map(ba.exprId -> _))
    }.toMap
    val rebased = bodyCore.transformUp {
      case r: DataSourceV2Relation =>
        val i = bRels.indexWhere(_ eq r)
        if (i >= 0) qRels(i) else r
    }.transformAllExpressions {
      case ar: AttributeReference => attrMap.getOrElse(ar.exprId, ar)
    }
    if (!rebased.sameResult(a)) return None

    // semantics proven equal — now the state must be CURRENT. Guarded
    // like every other lookup here: a concurrent DROP of the source or
    // state mid-probe degrades to "no rewrite", never fails the user's
    // unrelated query
    val fresh =
      try GraftMaterializedViews.isFresh(g, id, rec, analyzed)
      catch { case NonFatal(_) => false }
    if (!fresh) return None

    val stateIdent = g.mvStateIdent(id)
    val stateTable =
      try g.loadTable(stateIdent)
      catch { case NonFatal(_) => return None }
    val rel = DataSourceV2Relation.create(stateTable, Some(g),
      Some(stateIdent))
    val fields = rec.outputSchema.fields
    if (a.output.size != fields.length) return None
    if (a.output.zip(fields).exists {
        case (attr, f) => attr.dataType != f.dataType }) return None
    val projOpt = a.output.zip(fields).map { case (attr, f) =>
      rel.output.find(_.name == f.name)
        .map(src => Alias(src, attr.name)(exprId = attr.exprId))
    }
    if (projOpt.exists(_.isEmpty)) return None
    logInfo(s"rewriting aggregate over ${qNames.mkString(", ")} to " +
      s"materialized view $key's state scan")
    Some(Project(projOpt.flatten.toIndexedSeq, rel))
  }
}
