package graft

/** Golden end-to-end values at sf0.001 (SURVEY.md §5.4, the t1 smoke
  * shape): expected outputs computed independently with DuckDB and
  * hardcoded — catches regressions without the oracle harness. */
class GoldenSpec extends SparkTestBase {

  test("q1 pricing summary matches golden first row at sf0.001") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    val r = rows.head
    assert(r.getString(0) == "A" && r.getString(1) == "F")
    assert(r.getDouble(2) == 13096.0)                 // sum_qty
    assert(r.getDouble(3) == 26731890.14)             // sum_base_price
    assert(r.getDouble(4) == 25368762.5198)           // sum_disc_price
    assert(r.getDouble(5) == 26387936.88605)          // sum_charge
    assert(r.getLong(9) == 510L)                      // count_order
  }

  test("top-k matches golden ordering at sf0.001") {
    val rows = SparkEntry.queries("p5_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.take(3).toSeq == Seq(
      (988L, 98L, 499705.05), (605L, 118L, 499695.63), (485L, 30L, 499116.01)))
  }

  test("exact dedup finds all 500 docs unique at sf0.001") {
    assert(SparkEntry.queries("n1_exact_dedup")(spark, sf).count() == 500L)
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
