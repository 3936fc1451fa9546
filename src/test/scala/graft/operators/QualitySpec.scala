package graft.operators

import graft.SparkTestBase
import graft.operators.QualityChecks.Check._

/** QualityChecks semantics on hand-built edges: value checks skip nulls
  * (NotNull is the only null counter — one defect, one report), unique
  * counts surplus rows per key group (null keys group together), and
  * ref-integrity ignores null foreign keys. */
class QualitySpec extends SparkTestBase {

  test("violation semantics on a hand-built fixture") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 10.0),
      (2L, null, 200.0),   // null name; range violation
      (2L, "b", -5.0),     // dup key 2; range violation
      (3L, "zz", null),    // set violation; null value (not a range violation)
      (null, "a", 20.0),   // null key
      (null, "a", 30.0)    // second null key → unique violation
    ).toDF("k", "name", "v")
    val dim = Seq(1L, 2L).toDF("pk")
    val out = QualityChecks.validate(df, Seq(
      NotNull("name"),
      InRange("v", 0, 100),
      InSet("name", Seq("a", "b")),
      Unique(Seq("k")),
      RefIntegrity("k", dim, "pk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("not_null(name)") === (1L, false))
    assert(out("in_range(v,0.0,100.0)") === (2L, false), "null v must not count")
    assert(out("in_set(name)") === (1L, false), "null name must not count")
    // k=2 twice (+1), k=null twice (+1)
    assert(out("unique(k)") === (2L, false))
    // k=3 unmatched; null keys ignored
    assert(out("ref(k)") === (1L, false))
  }

  test("all checks pass on clean data and report in input order") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val out = QualityChecks.validate(df, Seq(
      Unique(Seq("k")), NotNull("name"), InSet("name", Seq("a", "b"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(
      ("unique(k)", 0L, true), ("not_null(name)", 0L, true),
      ("in_set(name)", 0L, true)))
  }
}
