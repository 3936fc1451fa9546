package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftStore}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Planner-facing statistics: ANALYZE column stats served through the
  * scan's `Statistics.columnStats()`, and zone-map-scaled row/byte
  * estimates that make a selectively-filtered store scan broadcast-able. */
class PlannerStatsSpec extends SparkTestBase {

  private lazy val cat = "graftstats"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_planner_stats")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def scanStats(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.stats
    }.head

  test("ANALYZE column stats reach the optimizer's attributeStats under CBO") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_an")
    spark.sql(s"""CREATE TABLE $cat.t_an
      (k BIGINT NOT NULL, grp BIGINT, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.t_an SELECT id, id % 7, id * 3 FROM range(0, 1000)")
    spark.sql(s"CALL $cat.analyze(table => 't_an')")
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val st = scanStats(spark.sql(s"SELECT k, grp FROM $cat.t_an"))
      assert(st.rowCount.exists(_.toLong == 1000L))
      val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
      // approx NDV lands within HLL tolerance; min/max exact
      val grp = byName("grp")
      assert(grp.distinctCount.exists(n => n.toLong >= 6 && n.toLong <= 8),
        s"grp ndv=${grp.distinctCount}")
      assert(grp.min.contains(0L) && grp.max.contains(6L), s"got $grp")
      assert(grp.nullCount.exists(_.toLong == 0L))
      val k = byName("k")
      assert(k.distinctCount.exists(n =>
        n.toLong > 900 && n.toLong < 1100), s"k ndv=${k.distinctCount}")
    } finally saved.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
  }

  test("stale column stats are withheld after heavy DML; re-analyze restores them") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_stale")
    spark.sql(s"""CREATE TABLE $cat.t_stale
      (k BIGINT NOT NULL, grp BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.t_stale SELECT id, id % 5 FROM range(0, 1000)")
    spark.sql(s"CALL $cat.analyze(table => 't_stale')")
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def attrStats() =
        scanStats(spark.sql(s"SELECT k, grp FROM $cat.t_stale")).attributeStats
      assert(attrStats().nonEmpty, "freshly analyzed stats must serve")
      // a small append (10% drift) keeps the stats advisory-fresh
      spark.sql(s"INSERT INTO $cat.t_stale SELECT id, id % 5 FROM range(1000, 1100)")
      assert(attrStats().nonEmpty,
        "sub-threshold drift must keep serving column stats")
      // heavy DML: rows double → 100%+ drift past the 50% staleness bound
      spark.sql(s"INSERT INTO $cat.t_stale SELECT id, id % 5 FROM range(1100, 2400)")
      assert(attrStats().isEmpty,
        "a heavily-mutated table must not serve pre-mutation column stats")
      // the per-scan zone-map row count stays fresh regardless
      assert(scanStats(spark.sql(s"SELECT k, grp FROM $cat.t_stale"))
        .rowCount.exists(_.toLong == 2400L))
      spark.sql(s"CALL $cat.analyze(table => 't_stale')")
      val served = attrStats().map { case (a, cs) => a.name -> cs }
      assert(served.nonEmpty, "re-analyze must restore column stats")
      assert(served("grp").min.contains(0L) && served("grp").max.contains(4L))
    } finally saved.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
  }

  test("zone-map row estimates make a selective fact filter broadcast-able") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.fact")
    spark.sql(s"DROP TABLE IF EXISTS $cat.other")
    spark.sql(s"""CREATE TABLE $cat.fact
      (k BIGINT NOT NULL, cents BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    // four commits with DISJOINT cents windows → per-commit zone maps
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO $cat.fact SELECT id, id FROM " +
        s"range(${i * 10000}, ${i * 10000 + 10000})"))
    spark.sql(s"""CREATE TABLE $cat.other
      (k BIGINT NOT NULL, v BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.other SELECT id, id FROM range(0, 40000)")

    val fullBytes = scanStats(spark.sql(s"SELECT * FROM $cat.fact"))
      .sizeInBytes
    val sel = s"SELECT * FROM $cat.fact WHERE cents >= 5000 AND cents < 7000"
    val selStats = scanStats(spark.sql(sel))
    assert(selStats.sizeInBytes < fullBytes,
      s"filtered ${selStats.sizeInBytes} !< full $fullBytes")
    // the estimate tracks the MATCHING window (2k rows of one commit's
    // 10k-row file set): at most one commit's worth
    assert(selStats.sizeInBytes * 2 <= fullBytes,
      s"filtered ${selStats.sizeInBytes} vs full $fullBytes")

    // threshold between the two estimates: the filtered fact side must
    // plan as the BROADCAST build side of the join
    val mid = (selStats.sizeInBytes + fullBytes.toLong) / 2
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", mid.toString)
      // both joins read BOTH fact columns so column pruning can't shrink
      // either side below the threshold on its own — the estimate under
      // test is the zone-map row scaling, not projection narrowing
      val join = spark.sql(
        s"""SELECT SUM(o.v + f.cents) FROM $cat.other o
           JOIN ($sel) f ON o.k = f.k""")
      join.collect()
      val plan = join.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast join, got:\n${plan.take(1500)}")
      // control: the UNfiltered fact join stays un-broadcast at this
      // threshold (both sides above it)
      val join2 = spark.sql(
        s"SELECT SUM(o.v + f.cents) FROM $cat.other o " +
          s"JOIN $cat.fact f ON o.k = f.k")
      join2.collect()
      assert(!join2.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally saved.fold(
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("ANALYZE histograms sharpen skewed-range estimates under CBO") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_hist")
    spark.sql(s"""CREATE TABLE $cat.t_hist
      (k BIGINT NOT NULL, v BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    // heavy skew min/max interpolation cannot see: 95% of rows at v=0,
    // 5% spread over 1..1000
    spark.sql(s"""INSERT INTO $cat.t_hist
      SELECT id, CASE WHEN id % 20 = 0 THEN (id % 1000) + 1 ELSE 0 END
      FROM range(0, 10000)""")
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // the estimate the broadcast decision reads: the SCAN's reported
      // row count (pushed-filter scans withhold column stats by design —
      // the histogram's skew signal lands in the scan estimate itself)
      def estimate(): BigInt =
        spark.sql(s"SELECT * FROM $cat.t_hist WHERE v > 500")
          .queryExecution.optimizedPlan.collect {
            case r: DataSourceV2ScanRelation => r.stats.rowCount
          }.flatten.head
      spark.sql(s"CALL $cat.analyze(table => 't_hist')")
      val without = estimate()
      // zone maps keep every file (each spans the full 0..1000 domain)
      assert(without > BigInt(3000), s"expected coarse zone-map estimate, got $without")
      spark.sql(s"CALL $cat.analyze(table => 't_hist', histogram_bins => 32)")
      // the histogram is served end-to-end (attributeStats carries bins)
      val st = scanStats(spark.sql(s"SELECT k, v FROM $cat.t_hist"))
      val vStat = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "v" => cs }.get
      assert(vStat.histogram.isDefined, s"no histogram in $vStat")
      assert(vStat.histogram.get.bins.length === 32)
      assert(math.abs(vStat.histogram.get.height - 10000.0 / 32) < 1.0)
      // ... and the skewed-range estimate collapses toward the truth (~500)
      val withHist = estimate()
      assert(withHist * 5 < without,
        s"histogram estimate $withHist not sharper than uniform $without")
    } finally saved.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
  }
}
