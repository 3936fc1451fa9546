package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftStore}

/** `CALL maintenance_report(table)`: the read-only health report that
  * turns the store's maintenance signals (slot fragmentation, merge-on-
  * read delete-cap pressure, column-stats staleness, retention debt) into
  * one row each with the triggered flag and the CALL that addresses it —
  * metadata only, no commit, never a data read. */
class MaintenanceReportSpec extends SparkTestBase {

  private lazy val cat = "graftmaint"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_maint_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def report(t: String, maxFiles: Int = 4)
      : Map[String, (Boolean, Option[Long])] =
    spark.sql(s"CALL $cat.maintenance_report(`table` => '$t', " +
      s"max_files_per_bucket => $maxFiles)").collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap

  test("signals trigger and clear across the maintenance lifecycle") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_m")
    spark.sql(s"""CREATE TABLE $cat.t_m
      (k BIGINT NOT NULL, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4', 'merge_mode'='mor')""")
    spark.sql(s"INSERT INTO $cat.t_m SELECT id, id * 10 FROM range(0, 100)")

    val r0 = report("t_m")
    assert(r0.keySet === Set("fragmented_slots", "live_deletes",
      "stale_column_stats", "retained_versions", "changelog_slices",
      "expired_file_hosts", "leaked_txn_branches"))
    assert(!r0("fragmented_slots")._1, "one insert cannot fragment")
    assert(!r0("live_deletes")._1 && r0("live_deletes")._2 === Some(0L))
    assert(r0("stale_column_stats")._1, "never analyzed = planner is blind")
    // the report itself is read-only: no version bump
    val dir = s"$warehouse/t_m"
    assert(GraftStore.currentVersion(dir) === 1L)

    // fragment ONE slot: 5 single-key appends whose keys all hash to the
    // same bucket (the store buckets by xxhash64, seed 42)
    val sameBucket = graft.operators.DmlFixture.keysForBucket(1000L, 4, 0, 5)
    sameBucket.zipWithIndex.foreach { case (k, i) =>
      spark.sql(s"INSERT INTO $cat.t_m VALUES ($k, $i)") }
    val r1 = report("t_m")
    assert(r1("fragmented_slots")._1, "5 same-slot files must trigger at 4")

    // delete-cap pressure under a tiny cap: 3 live delete rows vs cap 4
    val prev = sys.props.get("graft.store.morMaxLiveDeletes")
    sys.props("graft.store.morMaxLiveDeletes") = "8"
    try {
      spark.sql(s"DELETE FROM $cat.t_m WHERE k IN (1, 2, 3, 4, 5)")
      val r2 = report("t_m")
      assert(r2("live_deletes")._1 && r2("live_deletes")._2 === Some(5L),
        s"5 of cap 8 (>half) must trigger: ${r2("live_deletes")}")
      // optimize clears BOTH write-side signals
      spark.sql(s"CALL $cat.optimize(`table` => 't_m')")
      val r3 = report("t_m")
      assert(!r3("fragmented_slots")._1 && !r3("live_deletes")._1)
    } finally prev match {
      case Some(v) => sys.props("graft.store.morMaxLiveDeletes") = v
      case None => sys.props.remove("graft.store.morMaxLiveDeletes")
    }

    // analyze clears staleness; doubling the rows re-triggers with the
    // observed drift percentage
    spark.sql(s"CALL $cat.analyze(`table` => 't_m')")
    assert(!report("t_m")("stale_column_stats")._1)
    spark.sql(s"INSERT INTO $cat.t_m SELECT id + 5000, id FROM range(0, 100)")
    val r4 = report("t_m")("stale_column_stats")
    assert(r4._1 && r4._2.exists(_ >= 50L), s"doubling must re-trigger: $r4")
    spark.sql(s"CALL $cat.analyze(`table` => 't_m')")
    assert(!report("t_m")("stale_column_stats")._1)
  }
}
