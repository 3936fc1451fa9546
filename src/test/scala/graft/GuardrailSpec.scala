package graft

import graft.Guardrail.GuardrailViolation

class GuardrailSpec extends SparkTestBase {

  test("write paths outside the warehouse root are refused") {
    Guardrail.checkWritePath("/root/repo/target/warehouse/t1", "/root/repo/target/warehouse")
    intercept[GuardrailViolation] {
      Guardrail.checkWritePath("/etc/passwd", "/root/repo/target/warehouse")
    }
    intercept[GuardrailViolation] {
      // traversal must not escape
      Guardrail.checkWritePath("/root/repo/target/warehouse/../../../etc", "/root/repo/target/warehouse")
    }
  }

  test("read-only SQL gate admits queries, refuses DDL/DML") {
    Tables.registerAll(spark, sf)
    assert(Guardrail.sqlReadOnly(spark, "SELECT count(*) FROM lineitem").count() == 1)
    intercept[GuardrailViolation] {
      Guardrail.readOnlySql(spark, "DROP TABLE lineitem")
    }
    intercept[GuardrailViolation] {
      Guardrail.readOnlySql(spark, "CREATE TABLE evil AS SELECT 1")
    }
    intercept[GuardrailViolation] {
      Guardrail.readOnlySql(spark, "INSERT INTO lineitem SELECT * FROM lineitem")
    }
  }
}
