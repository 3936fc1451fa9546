package org.apache.spark.sql

import java.util.{Collections, IdentityHashMap}

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.CustomMetric
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Column-mapping bridge for renamed columns (in-package because
  * [[SupportsPushDownCatalystFilters]] is `private[sql]` — the same shim
  * pattern as [[GraftSqlShim]]).
  *
  * The graft store's RENAME COLUMN is metadata-only: parquet files keep
  * the column's original PHYSICAL name forever. This wrapper lets the
  * stock delegated parquet [[FileScanBuilder]] serve a logically-renamed
  * table without rewriting a byte: required columns and pushed filters are
  * translated logical→physical on the way down, and the scan's
  * `readSchema()` is translated physical→logical on the way back up, so
  * Spark resolves the pruned relation against logical names while the
  * parquet reader matches file names. Rows never need translation —
  * `InternalRow` is positional and the field ORDER is identical on both
  * sides (nested field accesses are ordinal-based too, so only names map).
  *
  * Pushdown survives in full: filter translation rewrites only
  * top-level [[AttributeReference]] names (nested references keep their
  * ordinals) and returns Spark's ORIGINAL expression objects for the
  * post-scan residue, identity-matched. Aggregate pushdown and runtime
  * filtering are NOT forwarded for renamed tables — correctness is
  * unaffected (Spark falls back to a normal scan+agg), and tables that
  * have never renamed a column bypass this wrapper entirely. */
final class GraftRenamingScanBuilder(delegate: FileScanBuilder,
    logToPhys: Map[String, String], mapSchemaToPhys: StructType => StructType,
    mapSchemaToLog: StructType => StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(mapSchemaToPhys(requiredSchema))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val renamed = filters.map { f =>
      val r = f.transform {
        case a: AttributeReference if logToPhys.contains(a.name) =>
          a.withName(logToPhys(a.name))
      }
      (r, f)
    }
    val residue = delegate.pushFilters(renamed.map(_._1))
    // FileScanBuilder returns a subset of the expressions it was given;
    // identity-match them back to the caller's originals so the post-scan
    // filter references the logical plan's own attributes.
    val residueSet = Collections.newSetFromMap(
      new IdentityHashMap[Expression, java.lang.Boolean]())
    residue.foreach(residueSet.add)
    renamed.collect { case (r, orig) if residueSet.contains(r) => orig }
  }

  /** Physical names leak into EXPLAIN's PushedFilters for renamed tables;
    * cosmetic only. */
  override def pushedFilters(): Array[Predicate] = delegate.pushedFilters

  override def build(): Scan =
    new GraftRenamingScan(delegate.build(), mapSchemaToLog)
}

final class GraftRenamingScan(delegate: Scan,
    mapSchemaToLog: StructType => StructType)
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = mapSchemaToLog(delegate.readSchema())
  override def toBatch: Batch = delegate.toBatch
  override def description(): String = s"GraftRenaming(${delegate.description()})"
  override def supportedCustomMetrics(): Array[CustomMetric] =
    delegate.supportedCustomMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()
  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}
