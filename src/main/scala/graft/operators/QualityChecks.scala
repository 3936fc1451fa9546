package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the constraint-validation pass a
  * warehouse runs before promoting a batch (the relational analogue of the
  * text-quality gates x2/x3: there the unit is a document, here it is a
  * row/key/reference). Reference analogue: the loader's schema checks
  * before admitting a module (bytecode.cpp:62-118) — validate, count what
  * fails, let policy decide; never silently drop.
  *
  * Execution shape, chosen for 100 TB inputs:
  *  - every ROW-level check (null / range / set / regex) compiles to one
  *    conditional-sum aggregate expression, and ALL of them run in a
  *    SINGLE scan of the table (one job, map-side partials, no per-check
  *    passes);
  *  - [[Check.Unique]] is one hash aggregation on the key (the only
  *    shuffle it needs) counting surplus rows per duplicated key;
  *  - [[Check.RefIntegrity]] is one left-anti join per referenced
  *    dimension against its DISTINCT key set (broadcastable when the
  *    dimension is small — Spark decides).
  * Violation counts are exact; nulls are counted ONLY by NotNull — value
  * checks skip null inputs so one defect is never double-reported.
  */
object QualityChecks {

  sealed trait Check { def name: String }
  object Check {
    /** Fails rows where `col` is null. */
    final case class NotNull(col: String) extends Check {
      def name = s"not_null($col)"
    }
    /** Fails non-null rows outside [lo, hi]. */
    final case class InRange(col: String, lo: Double, hi: Double) extends Check {
      def name = s"in_range($col,$lo,$hi)"
    }
    /** Fails non-null rows whose value is not in `values`. */
    final case class InSet(col: String, values: Seq[String]) extends Check {
      def name = s"in_set($col)"
    }
    /** Fails non-null rows not fully matching `regex`. */
    final case class Matches(col: String, regex: String) extends Check {
      def name = s"matches($col)"
    }
    /** Fails surplus rows sharing a key: Σ max(cnt−1, 0) over key groups.
      * Null-keyed rows group together (dropDuplicates semantics). */
    final case class Unique(cols: Seq[String]) extends Check {
      def name = s"unique(${cols.mkString(",")})"
    }
    /** Fails rows whose non-null foreign key has no match in `dim.pkCol`. */
    final case class RefIntegrity(fkCol: String, dim: DataFrame, pkCol: String)
        extends Check {
      def name = s"ref($fkCol)"
    }
  }
  import Check._

  private def rowViolation(df: DataFrame, c: Check): Option[Column] = c match {
    case NotNull(col0) => Some(col(col0).isNull)
    case InRange(col0, lo, hi) =>
      Some(col(col0).isNotNull && (col(col0) < lo || col(col0) > hi))
    case InSet(col0, vs) =>
      Some(col(col0).isNotNull && !col(col0).isin(vs: _*))
    case Matches(col0, re) =>
      Some(col(col0).isNotNull && !col(col0).rlike(re))
    case _ => None
  }

  /** Validate `df` against `checks`; returns one row per check, in input
    * order: (check STRING, violations BIGINT, pass BOOLEAN). */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    val rowChecks = checks.flatMap(c => rowViolation(df, c).map(c -> _))

    // all row-level checks in ONE scan, unpivoted to rows
    val rowCounts: Map[String, Long] =
      if (rowChecks.isEmpty) Map.empty
      else {
        val aggs = rowChecks.map { case (c, cond) =>
          sum(when(cond, 1L).otherwise(0L)).as(c.name)
        }
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        rowChecks.zipWithIndex.map { case ((c, _), i) =>
          c.name -> (if (r.isNullAt(i)) 0L else r.getLong(i))
        }.toMap
      }

    def scalar(d: DataFrame): Long = {
      val r = d.head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

    val rows = checks.map { c =>
      val n = c match {
        case u: Unique =>
          scalar(df.groupBy(u.cols.map(col): _*)
            .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
            .agg(sum(col("cnt") - 1L)))
        case r: RefIntegrity =>
          scalar(df.select(col(r.fkCol)).filter(col(r.fkCol).isNotNull)
            .join(r.dim.select(col(r.pkCol).as(r.fkCol)).distinct(),
              Seq(r.fkCol), "left_anti")
            .agg(count(lit(1))))
        case _ => rowCounts(c.name)
      }
      (c.name, n, n == 0L)
    }
    import spark.implicits._
    rows.toDF("check", "violations", "pass")
  }
}
