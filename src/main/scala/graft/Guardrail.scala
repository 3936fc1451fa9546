package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}

/** Surface guardrails — the benign port of the reference's deny-list hook
  * (env.cpp:29-119 interposes __index/__namecall to reject ~90
  * side-effecting APIs; filesys.hpp:86-105 blocklists write extensions).
  * Here the same idea as an allowlist: writes must stay inside the
  * warehouse root, and externally-supplied SQL (the loadstring analogue,
  * closures.hpp:253-344, which likewise rejects precompiled input) must be
  * read-only.
  */
object Guardrail {

  final class GuardrailViolation(msg: String) extends RuntimeException(msg)

  /** Reject write targets outside the allowed warehouse root. */
  def checkWritePath(path: String, warehouseRoot: String): Unit = {
    val p = java.nio.file.Paths.get(path).toAbsolutePath.normalize()
    val root = java.nio.file.Paths.get(warehouseRoot).toAbsolutePath.normalize()
    if (!p.startsWith(root))
      throw new GuardrailViolation(s"write to $p refused: outside warehouse $root")
  }

  /** Parse untrusted SQL and refuse anything that is not a pure query
    * (DDL/DML parse to Command nodes). Returns the parsed plan on success. */
  def readOnlySql(spark: SparkSession, sqlText: String): LogicalPlan = {
    val plan = spark.sessionState.sqlParser.parsePlan(sqlText)
    // DDL/DML parse to Command nodes or to V2 write plans whose node names
    // carry the verb (CreateTableAsSelect, InsertIntoStatement, ...)
    val writeVerb = "^(Create|Drop|Insert|Delete|Update|Merge|Alter|Replace|Truncate|Set|Cache|Uncache|Refresh|Add|Analyze)".r
    val offending = plan.collectFirst {
      case p if p.isInstanceOf[Command] => p
      case p if writeVerb.findFirstIn(p.nodeName).isDefined => p
    }
    offending.foreach(p => throw new GuardrailViolation(
      s"refusing non-read-only statement: ${p.nodeName}"))
    plan
  }

  /** Run untrusted SQL through the read-only gate. */
  def sqlReadOnly(spark: SparkSession, sqlText: String): org.apache.spark.sql.DataFrame = {
    readOnlySql(spark, sqlText)
    spark.sql(sqlText)
  }
}
