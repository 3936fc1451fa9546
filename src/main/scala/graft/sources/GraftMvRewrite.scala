package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, EqualTo, Expression, If, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DoubleType

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
  * agree — PLUS the classic ROLLUP DERIVATION: when the exact match
  * fails but the query aggregates the SAME child at a COARSER grain
  * (every query grouping is one of the MV's projected groupings, every
  * query aggregate re-aggregates one of the MV's public outputs —
  * COUNT(*)/COUNT(x) → SUM(count col) with an empty-input coalesce,
  * SUM(x) → SUM(sum col), MIN/MAX → MIN/MAX), the substitution is an
  * Aggregate over the state instead of a projection: a per-region
  * dashboard rolls up from the per-(region, day) MV without anyone
  * materializing the coarser view — with AVG(x) derived when the MV
  * co-projects SUM(x) AND COUNT(x) (Σsums/Σcounts; COUNT(*) never
  * stands in, it counts the nulls AVG ignores). PLUS PREDICATE
  * CONTAINMENT (S39e): a WHERE under the aggregate whose every base
  * reference re-expresses over PROJECTED GROUPING expressions commutes
  * with the aggregation (each group's rows pass or fail together), so
  * the filtered dashboard query — σ(region='ASIA') over a per-(region,
  * day) MV — substitutes as Filter over the state scan, composing with
  * both the exact and the rollup matchers. Anything else
  * (DISTINCT/FILTER aggregates, predicates on non-grouping columns,
  * decimal re-sums that would widen the type) just runs the query as
  * written.
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
    // PREDICATE CONTAINMENT (S39e): when the aggregate sits over a WHERE,
    // also try the match with the filter peeled off — a predicate whose
    // every base reference resolves to a PROJECTED GROUPING column of the
    // MV commutes with the aggregation (a group's rows all pass or all
    // fail together), so σ over the state answers it exactly. The
    // unstripped match runs FIRST per MV: a body that itself contains
    // the same WHERE must keep matching as a plain projection.
    val stripped: Option[(Expression, Aggregate)] = a.child match {
      case f: Filter if f.condition.deterministic &&
          !f.condition.exists(_.isInstanceOf[SubqueryExpression]) =>
        Some((f.condition, a.copy(child = f.child)))
      case _ => None
    }
    // an EXACT match (one projection of the state, filtered or not)
    // beats a rollup (re-aggregation of a finer state) whenever both
    // exist — the preference keeps plan quality deterministic instead of
    // riding the _mvs directory-listing order
    var rollupFallback: Option[LogicalPlan] = None
    for (g <- cats; id <- g.listAllMvs()) {
      val hit = matchMv(a, None, g, id, qRels, qNames).orElse(
        stripped.flatMap { case (cond, aCore) =>
          matchMv(aCore, Some(cond), g, id, qRels, qNames) })
      hit match {
        case Some((plan, true)) => return Some(plan)
        case Some((plan, false)) if rollupFallback.isEmpty =>
          rollupFallback = Some(plan)
        case _ => ()
      }
    }
    rollupFallback
  }

  /** The substituted plan plus whether the match was EXACT (a projection
    * of the state) as opposed to a rollup (a re-aggregation of it).
    * `residual` is a WHERE predicate peeled off the query below the
    * aggregate — it must re-express entirely over projected grouping
    * columns of the MV and is applied over the state scan. */
  private def matchMv(a: Aggregate, residual: Option[Expression],
      g: GraftCatalog, id: Identifier,
      qRels: Seq[DataSourceV2Relation], qNames: Set[String])
      : Option[(LogicalPlan, Boolean)] = {
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
    val rebasedAgg = rebased match {
      case ag: Aggregate => ag
      case _ => return None
    }
    val exact = rebased.sameResult(a)
    val colNames = rec.outputSchema.fieldNames.toSeq
    val rollup = if (exact) None else deriveRollup(a, rebasedAgg, colNames)
    if (!exact && rollup.isEmpty) return None
    // the peeled WHERE must re-express over the state: every MAXIMAL
    // sub-expression matching a projected grouping expression maps to
    // its state column (transformDown replaces largest-first, so
    // `k % 2 = 1` maps through the `k % 2` grouping without ever
    // needing `k` itself), and nothing else may reference the base
    // child. Checked BEFORE the freshness probe so an unmappable
    // predicate costs no metadata reads.
    val groupOuts = groupOutsOf(rebasedAgg, colNames)
    def mapResidual(cond: Expression, target: String => Option[Expression])
        : Expression =
      cond.transformDown {
        case e if groupOuts.exists(_._1.semanticEquals(e)) =>
          val c = groupOuts.collectFirst {
            case (ge, cc) if ge.semanticEquals(e) => cc }.get
          target(c).getOrElse(e)
      }
    if (residual.exists(cond => mapResidual(cond,
        c => Some(Literal(null, groupOuts.collectFirst {
          case (ge, cc) if cc == c => ge.dataType }.get)))
        .references.nonEmpty))
      return None // predicate looks at something the state doesn't carry

    // semantics proven equal (or derivable) — now the state must be
    // CURRENT. Guarded like every other lookup here: a concurrent DROP
    // of the source or state mid-probe degrades to "no rewrite", never
    // fails the user's unrelated query
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
    def stateAttr(c: String): Option[Attribute] = rel.output.find(_.name == c)

    // σ over the state (mappability proven above; a state column missing
    // despite the schema check degrades to no-rewrite like every other
    // lookup here)
    val scanBase: LogicalPlan = residual match {
      case None => rel
      case Some(cond) =>
        val mapped = mapResidual(cond, c => stateAttr(c))
        if (!mapped.references.subsetOf(rel.outputSet)) return None
        Filter(mapped, rel)
    }

    if (exact) {
      val fields = rec.outputSchema.fields
      if (a.output.size != fields.length) return None
      if (a.output.zip(fields).exists {
          case (attr, f) => attr.dataType != f.dataType }) return None
      val projOpt = a.output.zip(fields).map { case (attr, f) =>
        stateAttr(f.name)
          .map(src => Alias(src, attr.name)(exprId = attr.exprId))
      }
      if (projOpt.exists(_.isEmpty)) return None
      logInfo(s"rewriting aggregate over ${qNames.mkString(", ")} to " +
        s"materialized view $key's state scan")
      Some((Project(projOpt.flatten.toIndexedSeq, scanBase), true))
    } else {
      // coarser grain: re-aggregate the state — groups are a subset of
      // the MV's, each output re-aggregates one public state column.
      // The final type check rejects re-sums that widen (decimal).
      val (gCols, outs) = rollup.get
      if (gCols.exists(c => stateAttr(c).isEmpty)) return None
      val groupExprs: Seq[Expression] = gCols.map(c => stateAttr(c).get)
      val aliasOpt = a.output.zip(outs).map { case (attr, roll) =>
        val built: Option[Expression] = roll match {
          case RollGroup(c) => stateAttr(c)
          case RollSum(c) =>
            stateAttr(c).map(sa => Sum(sa).toAggregateExpression())
          case RollCount(c) =>
            // COUNT over an EMPTY input is 0, but SUM is null — the
            // coalesce keeps the global-rollup-of-empty-state case exact
            stateAttr(c).map(sa => Coalesce(Seq(
              Sum(sa).toAggregateExpression(), Literal(0L))))
          case RollMin(c) =>
            stateAttr(c).map(sa => Min(sa).toAggregateExpression())
          case RollMax(c) =>
            stateAttr(c).map(sa => Max(sa).toAggregateExpression())
          case RollAvg(sc, cc) =>
            // Σsums / Σcounts, null when no non-null operand survived —
            // built post-analysis, so the double casts Divide requires
            // are explicit. Decimal SUMs fall out at the type check
            // below (a decimal AVG's output type is decimal, never the
            // double built here).
            for {
              sa <- stateAttr(sc)
              ca <- stateAttr(cc)
            } yield {
              val cntSum = Sum(ca).toAggregateExpression()
              If(EqualTo(cntSum, Literal(0L)), Literal(null, DoubleType),
                Divide(Cast(Sum(sa).toAggregateExpression(), DoubleType),
                  Cast(cntSum, DoubleType)))
            }
        }
        built.filter(_.dataType == attr.dataType)
          .map(e => Alias(e, attr.name)(exprId = attr.exprId))
      }
      if (aliasOpt.exists(_.isEmpty)) return None
      logInfo(s"rolling up aggregate over ${qNames.mkString(", ")} from " +
        s"materialized view $key's state (coarser grain)")
      Some((Aggregate(groupExprs, aliasOpt.flatten.toIndexedSeq,
        scanBase), false))
    }
  }

  private sealed trait Roll
  private case class RollGroup(col: String) extends Roll
  private case class RollSum(col: String) extends Roll
  private case class RollCount(col: String) extends Roll
  private case class RollMin(col: String) extends Roll
  private case class RollMax(col: String) extends Roll
  /** AVG derived from CO-PROJECTED public SUM(x) and COUNT(x) columns:
    * Σsums / Σcounts over the finer groups, null when the non-null
    * operand count is zero (exactly AVG's empty/all-null semantics). */
  private case class RollAvg(sumCol: String, cntCol: String) extends Roll

  private def stripAlias(ne: NamedExpression): Expression = ne match {
    case Alias(c, _) => c
    case other => other
  }

  /** The MV's PROJECTED grouping outputs as (grouping expression → state
    * column name) — the vocabulary both the rollup matcher and the
    * residual-filter remap resolve against. */
  private def groupOutsOf(mv: Aggregate, cols: Seq[String])
      : Seq[(Expression, String)] =
    mv.aggregateExpressions.zip(cols).flatMap { case (ne, c) =>
      val e = stripAlias(ne)
      if (!e.exists(_.isInstanceOf[AggregateExpression]) &&
          mv.groupingExpressions.exists(_.semanticEquals(e))) Some(e -> c)
      else None
    }

  /** Rollup derivation: the query aggregates the SAME child (canonical
    * plan equality below the two Aggregates) at a coarser grain. Every
    * query grouping expression must be one of the MV's PROJECTED
    * groupings (the state carries its column), and every query aggregate
    * must re-aggregate one MV public output: additive COUNT/SUM re-sum,
    * extrema re-min/max (min of group minima = the subset's min). The
    * derivation is exact by the associativity of those aggregates over a
    * disjoint partition of the rows — which is precisely what the MV's
    * finer groups are. DISTINCT/FILTER/AVG (not derivable from public
    * columns) and unmatched expressions bail to no-rewrite. */
  private def deriveRollup(a: Aggregate, mv: Aggregate,
      cols: Seq[String]): Option[(Seq[String], Seq[Roll])] = {
    if (mv.aggregateExpressions.size != cols.size) return None
    if (!a.child.sameResult(mv.child)) return None
    val mvOuts = mv.aggregateExpressions.zip(cols)
    val groupOuts = groupOutsOf(mv, cols)
    def groupColFor(e: Expression): Option[String] =
      groupOuts.collectFirst { case (ge, c) if ge.semanticEquals(e) => c }
    // the MV's PUBLIC aggregate outputs, unfiltered/non-distinct only
    def publicAgg[A](f: PartialFunction[(Expression, String), A]): Option[A] =
      mvOuts.iterator.flatMap { case (ne, c) =>
        stripAlias(ne) match {
          case m: AggregateExpression if !m.isDistinct && m.filter.isEmpty =>
            f.lift((m.aggregateFunction, c))
          case _ => None
        }
      }.nextOption()
    def derive(q: AggregateExpression): Option[Roll] = {
      if (q.isDistinct || q.filter.nonEmpty) return None
      q.aggregateFunction match {
        case qa: Average =>
          // AVG(x) = Σ SUM(x) / Σ COUNT(x) over the finer groups — BOTH
          // must be projected by the MV (COUNT(x) specifically: COUNT(*)
          // counts null operands AVG ignores)
          for {
            s <- publicAgg { case (ms: Sum, c)
                if ms.child.semanticEquals(qa.child) => c }
            n <- publicAgg { case (Count(Seq(ce)), c)
                if ce.semanticEquals(qa.child) => c }
          } yield RollAvg(s, n)
        case Count(Seq(qe)) => publicAgg {
          case (Count(Seq(me)), c) if me.semanticEquals(qe) => RollCount(c) }
        case qs: Sum => publicAgg {
          case (ms: Sum, c) if ms.child.semanticEquals(qs.child) =>
            RollSum(c) }
        case qm: Min => publicAgg {
          case (mm: Min, c) if mm.child.semanticEquals(qm.child) =>
            RollMin(c) }
        case qm: Max => publicAgg {
          case (mm: Max, c) if mm.child.semanticEquals(qm.child) =>
            RollMax(c) }
        case _ => None
      }
    }
    val gCols = a.groupingExpressions.map(groupColFor)
    if (gCols.exists(_.isEmpty)) return None
    val outs = a.aggregateExpressions.map { ne =>
      stripAlias(ne) match {
        case q: AggregateExpression => derive(q)
        case e if !e.exists(_.isInstanceOf[AggregateExpression]) =>
          groupColFor(e).map(RollGroup)
        case _ => None
      }
    }
    if (outs.exists(_.isEmpty)) None
    else Some((gCols.flatten, outs.flatten))
  }
}
