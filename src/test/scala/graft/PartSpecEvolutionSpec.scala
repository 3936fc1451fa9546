package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.sources.{GraftCatalog, GraftStore}

/** Partition-spec evolution (`CALL set_partition_spec`): a
  * time-partitioned table changes GRAIN for future commits as one
  * metadata-only commit. Old dirs keep the ordinals they were written
  * with (per-version `_partspec` markers), old versions keep pruning
  * under their own grain, mixed-era snapshots read exactly with pruning
  * paused, and `CALL rebucket` re-grains everything so pruning resumes
  * under the new spec. */
class PartSpecEvolutionSpec extends SparkTestBase {

  private lazy val cat = "graftpse"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_pse_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  /** gpart ordinals physically present in one version's OWN dirs. */
  private def ownOrdinals(dir: String, v: Long): Set[Long] = {
    val p = java.nio.file.Paths.get(GraftStore.versionDir(dir, v))
    if (!Files.isDirectory(p)) Set.empty
    else {
      val ls = Files.list(p)
      try ls.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(s"${GraftStore.PartCol}="))
        .map(_.stripPrefix(s"${GraftStore.PartCol}=").toLong).toSet
      finally ls.close()
    }
  }

  test("grain evolves metadata-only; eras coexist; rebucket re-grains") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_pse")
    spark.sql(s"""CREATE TABLE $cat.t_pse
      (k BIGINT NOT NULL, ts TIMESTAMP, v BIGINT) USING graft
      PARTITIONED BY (days(ts))
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    val dir = s"$warehouse/t_pse"
    spark.sql(s"""INSERT INTO $cat.t_pse VALUES
      (1, TIMESTAMP'2026-01-01 06:00:00', 10),
      (2, TIMESTAMP'2026-01-02 06:00:00', 20),
      (3, TIMESTAMP'2026-01-03 18:00:00', 30)""") // v1: day grain
    val dayOrds = ownOrdinals(dir, 1L)
    assert(dayOrds.nonEmpty && dayOrds.forall(o => o > 20000 && o < 30000),
      s"v1 must hold day ordinals, got $dayOrds")

    val v2 = spark.sql(s"CALL $cat.set_partition_spec(table => 't_pse', " +
      "transform => 'hours(ts)')").head().getLong(0)
    assert(v2 === 2L)
    // metadata-only: no data dirs of its own, no changelog, not a boundary
    assert(ownOrdinals(dir, 2L).isEmpty)
    assert(!GraftStore.hasChangelog(dir, 2L) && !GraftStore.isBoundary(dir, 2L))

    spark.sql(s"""INSERT INTO $cat.t_pse VALUES
      (4, TIMESTAMP'2026-01-02 07:00:00', 40),
      (5, TIMESTAMP'2026-01-03 23:00:00', 50)""") // v3: hour grain
    val hourOrds = ownOrdinals(dir, 3L)
    assert(hourOrds.nonEmpty && hourOrds.forall(_ > 400000),
      s"v3 must hold hour ordinals, got $hourOrds")

    // the mixed snapshot reads exactly
    val all = spark.sql(s"SELECT k, v FROM $cat.t_pse ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all === Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L)))
    // ... and a source-column predicate is still exact with pruning paused
    val day2 = spark.sql(s"SELECT k FROM $cat.t_pse WHERE " +
        "ts >= TIMESTAMP'2026-01-02 00:00:00' AND " +
        "ts < TIMESTAMP'2026-01-03 00:00:00' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(day2 === Seq(2L, 4L))

    // old versions prune under their OWN grain: the single-era v1
    // snapshot plans fewer files for a one-day range than its full scan
    val fullV1 = filesPlanned(spark.sql(s"SELECT * FROM $cat.t_pse VERSION AS OF 1"))
    val prunedV1 = filesPlanned(spark.sql(s"SELECT * FROM $cat.t_pse " +
      "VERSION AS OF 1 WHERE ts >= TIMESTAMP'2026-01-02 00:00:00' AND " +
      "ts < TIMESTAMP'2026-01-03 00:00:00'"))
    assert(prunedV1 < fullV1, s"v1 pruning: $prunedV1 !< $fullV1")

    // mixed-era maintenance is guarded
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.expire_partitions(table => 't_pse', below => '490000')")
    }
    assert(e.getMessage.contains("mixes partition grains"), e.getMessage)

    // rebucket re-grains everything under hours: pruning resumes
    spark.sql(s"CALL $cat.rebucket(table => 't_pse', buckets => 2)")
    val vNow = GraftStore.currentVersion(dir)
    val regrained = ownOrdinals(dir, vNow)
    assert(regrained.forall(_ > 400000), s"re-grain left $regrained")
    val full = filesPlanned(spark.sql(s"SELECT * FROM $cat.t_pse"))
    val pruned = filesPlanned(spark.sql(s"SELECT * FROM $cat.t_pse WHERE " +
      "ts >= TIMESTAMP'2026-01-03 20:00:00'"))
    assert(pruned < full, s"hour pruning after re-grain: $pruned !< $full")
    // and hour-ordinal retention now works: a bound below every 2026
    // hour ordinal (~490900) drops nothing; one inside the range drops
    // exactly the older hours
    spark.sql(s"CALL $cat.expire_partitions(table => 't_pse', " +
      "below => '490000')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t_pse").head().getLong(0) === 5L)
    spark.sql(s"CALL $cat.expire_partitions(table => 't_pse', " +
      "below => '490950')") // keeps only Jan 3 hours (ordinal >= 490950)
    val kept = spark.sql(s"SELECT k FROM $cat.t_pse ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(3L, 5L), s"hour-grain retention kept $kept")
  }

  test("guards: identity tables, unknown grains, column changes, noop") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_pse_id")
    spark.sql(s"""CREATE TABLE $cat.t_pse_id
      (k BIGINT NOT NULL, region BIGINT, v BIGINT) USING graft
      PARTITIONED BY (region)
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $cat.set_partition_spec(table => 't_pse_id', " +
        "transform => 'days')")
    }
    assert(e1.getMessage.contains("identity"), e1.getMessage)

    spark.sql(s"DROP TABLE IF EXISTS $cat.t_pse_g")
    spark.sql(s"""CREATE TABLE $cat.t_pse_g
      (k BIGINT NOT NULL, ts TIMESTAMP, v BIGINT) USING graft
      PARTITIONED BY (days(ts))
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.set_partition_spec(table => 't_pse_g', " +
        "transform => 'minutes')")
    }
    assert(e2.getMessage.contains("time grains"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(s"CALL $cat.set_partition_spec(table => 't_pse_g', " +
        "transform => 'hours(v)')")
    }
    assert(e3.getMessage.contains("COLUMN"), e3.getMessage)
    // unpartitioned tables are loud
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_pse_np")
    spark.sql(s"""CREATE TABLE $cat.t_pse_np (k BIGINT NOT NULL) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    val e4 = intercept[Exception] {
      spark.sql(s"CALL $cat.set_partition_spec(table => 't_pse_np', " +
        "transform => 'days')")
    }
    assert(e4.getMessage.contains("no PARTITIONED BY"), e4.getMessage)
    // same-spec call is a no-op (no version bump)
    val before = GraftStore.currentVersion(s"$warehouse/t_pse_g")
    val got = spark.sql(s"CALL $cat.set_partition_spec(table => 't_pse_g', " +
      "transform => 'days')").head().getLong(0)
    assert(got === before)
  }
}
