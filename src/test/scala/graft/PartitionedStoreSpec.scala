package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftStore}

/** `PARTITIONED BY` on the DML store: time-transform partition dirs above
  * the bucket fan-out (`gpart=<ordinal>/gbucket=<k>`), transform-aware
  * partition pruning composed with bucket pruning, DML/CDC/time-travel
  * interplay, and metadata-only partition retention. */
class PartitionedStoreSpec extends SparkTestBase {

  private lazy val cat = "graftpart"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_part_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def mkDays(name: String, buckets: Int = 4): String = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(s"""CREATE TABLE $cat.$name
      (k BIGINT NOT NULL, ts TIMESTAMP, amount BIGINT) USING graft
      PARTITIONED BY (days(ts))
      TBLPROPERTIES ('merge_key'='k', 'buckets'='$buckets')""")
    name
  }

  private def seedDays(t: String): Unit =
    // 3 distinct days x 8 keys each
    spark.sql(s"""INSERT INTO $cat.$t
      SELECT id AS k,
        timestamp'2024-03-01 00:00:00' + make_interval(0,0,0, CAST(id / 8 AS INT), 0,0,0) AS ts,
        id * 10 AS amount
      FROM range(0, 24)""")


  test("layout: partition dirs above buckets, slot-keyed manifest") {
    val t = mkDays("t_layout")
    seedDays(t)
    val dir = s"$warehouse/$t"
    val slots = GraftStore.ownersOf(dir, GraftStore.currentVersion(dir)).keySet
    assert(slots.nonEmpty)
    assert(slots.forall(_.matches("gpart=\\d+/gbucket=\\d+")), s"got $slots")
    // 2024-03-01..03 are epoch days 19783..19785
    assert(slots.map(_.split("/")(0)) ===
      Set("gpart=19783", "gpart=19784", "gpart=19785"))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t").head().getLong(0) === 24L)
  }

  test("partition pruning: a ts range plans only matching partitions; composes with bucket pruning") {
    val t = mkDays("t_prune")
    seedDays(t)
    val full = filesPlanned(spark.sql(s"SELECT * FROM $cat.$t"))
    val oneDay = filesPlanned(spark.sql(
      s"SELECT * FROM $cat.$t WHERE ts >= timestamp'2024-03-02 00:00:00' " +
        "AND ts < timestamp'2024-03-03 00:00:00'"))
    assert(oneDay > 0 && oneDay < full, s"one-day=$oneDay full=$full")
    val tail = filesPlanned(spark.sql(
      s"SELECT * FROM $cat.$t WHERE ts >= timestamp'2024-03-03 00:00:00'"))
    assert(tail > 0 && tail <= oneDay, s"tail=$tail oneDay=$oneDay")
    // a bound with no matching rows plans ZERO files: the partition
    // qualifies (same day) but the zone maps prove its files empty —
    // partition pruning and file skipping COMPOSE
    assert(filesPlanned(spark.sql(
      s"SELECT * FROM $cat.$t WHERE ts >= timestamp'2024-03-03 12:00:00'")) === 0L)
    // point lookup composes BOTH prunings: one bucket within one day
    val point = filesPlanned(spark.sql(
      s"SELECT * FROM $cat.$t WHERE k = 9 " + // id 9 → day 2024-03-02
        "AND ts >= timestamp'2024-03-02 00:00:00' " +
        "AND ts < timestamp'2024-03-03 00:00:00'"))
    assert(point >= 1 && point < oneDay, s"point=$point oneDay=$oneDay")
    // correctness alongside the pruning booleans
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t WHERE " +
      "ts >= timestamp'2024-03-02 00:00:00' AND " +
      "ts < timestamp'2024-03-03 00:00:00'").head().getLong(0) === 8L)
  }

  test("DML on a partitioned table: update, delete, CDC, time travel") {
    val t = mkDays("t_dml")
    seedDays(t)
    spark.sql(s"UPDATE $cat.$t SET amount = 0 WHERE k % 8 = 1")
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 2")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t").head().getLong(0) === 23L)
    assert(spark.sql(s"SELECT SUM(amount) FROM $cat.$t WHERE k % 8 = 1")
      .head().getLong(0) === 0L)
    // CDC: the UPDATE logged before-images
    val ch = spark.sql(s"SELECT change_op, COUNT(*) FROM $cat.`$t$$changes` " +
      "WHERE change_version = 2 GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch === Map("U" -> 3L))
    // time travel reads the pre-DML snapshot
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t VERSION AS OF 1")
      .head().getLong(0) === 24L)
    // a key UPDATE that MOVES the row's partition (ts shifts a day):
    // after-image lands in the new partition dir, count stays stable
    spark.sql(s"UPDATE $cat.$t SET ts = ts + INTERVAL 1 DAY WHERE k = 3")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t").head().getLong(0) === 23L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t WHERE " +
      "ts >= timestamp'2024-03-02 00:00:00' AND " +
      "ts < timestamp'2024-03-03 00:00:00'").head().getLong(0) === 9L)
  }

  test("expire_partitions: metadata-only boundary commit drops old days") {
    val t = mkDays("t_retire")
    seedDays(t)
    val dir = s"$warehouse/$t"
    val before = GraftStore.snapshotFiles(dir, GraftStore.currentVersion(dir))
    // drop everything before 2024-03-02 (epoch day 19784)
    spark.sql(s"CALL $cat.expire_partitions(table => '$t', below => '19784')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t").head().getLong(0) === 16L)
    assert(spark.sql(s"SELECT MIN(ts) FROM $cat.$t").head()
      .getTimestamp(0).toString.startsWith("2024-03-02"))
    val v = GraftStore.currentVersion(dir)
    // metadata-only: the new version dir holds NO data files of its own,
    // and every pre-existing file still exists on disk (older versions
    // retain the dropped partitions until expire_versions)
    assert(graft.sources.GraftStats
      .listDataFiles(GraftStore.versionDir(dir, v)).isEmpty)
    assert(before.forall(f => Files.exists(java.nio.file.Paths.get(f))))
    // boundary semantics: no changelog slice, boundary stamped
    assert(!GraftStore.hasChangelog(dir, v))
    assert(GraftStore.isBoundary(dir, v))
    // time travel still reads the full pre-retention snapshot
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t VERSION AS OF ${v - 1}")
      .head().getLong(0) === 24L)
    // idempotent when nothing matches
    spark.sql(s"CALL $cat.expire_partitions(table => '$t', below => '19784')")
    assert(GraftStore.currentVersion(dir) === v)
    // writes keep working after retention
    spark.sql(s"INSERT INTO $cat.$t VALUES " +
      "(100, timestamp'2024-03-05 00:00:00', 1000)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t").head().getLong(0) === 17L)
  }

  test("identity partitioning, optimize, and rebucket keep layout + contents") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_id")
    spark.sql(s"""CREATE TABLE $cat.t_id
      (k BIGINT NOT NULL, region STRING, amount BIGINT) USING graft
      PARTITIONED BY (region)
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO $cat.t_id " +
      s"SELECT id, CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, id * $i " +
      s"FROM range(${i * 10}, ${i * 10 + 10})"))
    val dir = s"$warehouse/t_id"
    val pre = spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.t_id").head()
    val slots = GraftStore.ownersOf(dir, GraftStore.currentVersion(dir)).keySet
    assert(slots.map(_.split("/")(0)) === Set("gpart=eu", "gpart=us"))
    // identity pruning on the source column
    val full = filesPlanned(spark.sql(s"SELECT * FROM $cat.t_id"))
    val eu = filesPlanned(spark.sql(s"SELECT * FROM $cat.t_id WHERE region = 'eu'"))
    assert(eu > 0 && eu < full, s"eu=$eu full=$full")
    // optimize compacts fragmented buckets across partitions
    spark.sql(s"CALL $cat.optimize(table => 't_id', max_files_per_bucket => 2)")
    assert(spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.t_id").head() === pre)
    // rebucket rewrites the fan-out, partition dirs intact
    spark.sql(s"CALL $cat.rebucket(table => 't_id', buckets => 4)")
    assert(spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.t_id").head() === pre)
    val slots2 = GraftStore.ownersOf(dir, GraftStore.currentVersion(dir)).keySet
    assert(slots2.forall(_.matches("gpart=(eu|us)/gbucket=\\d+")))
    assert(filesPlanned(spark.sql(
      s"SELECT * FROM $cat.t_id WHERE region = 'eu'")) <
      filesPlanned(spark.sql(s"SELECT * FROM $cat.t_id")))
  }

  test("t$partitions surfaces the partition-level layout; unpartitioned reads one row") {
    val t = mkDays("t_meta_parts")
    seedDays(t)
    val rows = spark.sql(s"SELECT partition, transform, source_column, " +
      s"n_buckets, n_files, file_rows FROM $cat.`$t$$partitions` " +
      "ORDER BY partition").collect()
    // 3 seeded days = epoch days 19783..85, 8 rows each
    assert(rows.map(_.getString(0)).toSeq === Seq("19783", "19784", "19785"))
    assert(rows.forall(r => r.getString(1) == "days" && r.getString(2) == "ts"))
    assert(rows.map(_.getLong(5)).sum === 24L)
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getLong(4) >= 1L))
    // retention drops a day; the metadata table follows the manifest
    spark.sql(s"CALL $cat.expire_partitions(`table` => '$t', below => '19784')")
    assert(spark.sql(s"SELECT partition FROM $cat.`$t$$partitions` " +
      "ORDER BY partition").collect().map(_.getString(0)).toSeq ===
      Seq("19784", "19785"))
    // unpartitioned table: one null-partition row covering everything
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_meta_flat")
    spark.sql(s"""CREATE TABLE $cat.t_meta_flat
      (k BIGINT NOT NULL, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    spark.sql(s"INSERT INTO $cat.t_meta_flat SELECT id, id FROM range(0, 10)")
    val flat = spark.sql("SELECT partition, transform, file_rows FROM " +
      s"$cat.`t_meta_flat$$partitions`").collect()
    assert(flat.length === 1 && flat.head.isNullAt(0) &&
      flat.head.isNullAt(1) && flat.head.getLong(2) === 10L)
  }

  test("a tailing table stream fails loudly across an expire_partitions boundary") {
    val t = mkDays("t_stream_exp")
    seedDays(t)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_part_stream_ckpt").toString
    def runStream(): Unit = {
      val q = spark.readStream.table(s"$cat.$t")
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          { df.count(); () })
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }
    runStream() // snapshot consumed, checkpoint at the current version
    // retention drops day 1 — rows vanish with NO changelog slice; a
    // resuming tail folding past it would keep the dropped rows forever
    spark.sql(s"CALL $cat.expire_partitions(`table` => '$t', below => '19784')")
    spark.sql(s"INSERT INTO $cat.$t VALUES " +
      s"(100, timestamp'2024-03-03 12:00:00', 1)")
    val e = intercept[Exception](runStream())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("boundary") &&
        m.contains("expire_partitions")),
      s"expected a boundary failure naming expire_partitions, got: ${msgs(e)}")
  }

  test("OPTIMIZE is slot-scoped: compacting a hot day never rewrites cold partitions") {
    val t = mkDays("t_slotopt")
    seedDays(t) // v1: one file per (day, bucket) slot
    val dir = s"$warehouse/$t"
    // fragment ONLY day 2 (2024-03-02, epoch day 19784): three more
    // appends whose rows all land on that day
    (0 until 3).foreach { i =>
      spark.sql(s"""INSERT INTO $cat.$t
        SELECT 100 + $i * 10 + id AS k,
          timestamp'2024-03-02 0$i:00:00' AS ts, id AS amount
        FROM range(0, 8)""")
    }
    val before = spark.sql(s"SELECT k, amount FROM $cat.$t ORDER BY k").collect().toSeq
    val preOwners = GraftStore.ownersOf(dir, GraftStore.currentVersion(dir))
    val coldSlots = preOwners.keySet.filterNot(_.startsWith("gpart=19784/"))
    assert(coldSlots.nonEmpty)
    spark.sql(s"CALL $cat.optimize(table => 't_slotopt', max_files_per_bucket => 2)")
    val v = GraftStore.currentVersion(dir)
    val owners = GraftStore.ownersOf(dir, v)
    // cold slots carried by reference with their ORIGINAL owner versions —
    // the compaction never read or rewrote them
    coldSlots.foreach { s =>
      assert(owners.get(s) === preOwners.get(s),
        s"cold slot $s was rewritten by a hot-day compaction")
    }
    // the hot day's fragmented slots own themselves now, one file each
    val hot = owners.keys.filter(_.startsWith("gpart=19784/")).toSeq
    assert(hot.nonEmpty)
    hot.foreach { s =>
      assert(owners(s) === Seq(v), s"hot slot $s not compacted")
    }
    assert(GraftStore.slotFileCounts(dir, v)
      .filter(_._1.startsWith("gpart=19784/")).values.forall(_ == 1))
    // contents unchanged
    assert(spark.sql(s"SELECT k, amount FROM $cat.$t ORDER BY k")
      .collect().toSeq === before)
  }

  test("guards: one transform only, mor composes, partition column undropppable") {
    warehouse
    val e1 = intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.t_bad (k BIGINT NOT NULL, ts TIMESTAMP, a BIGINT)
         USING graft PARTITIONED BY (days(ts), years(ts))
         TBLPROPERTIES ('merge_key'='k')"""))
    assert(e1.getMessage.contains("at most ONE"))
    // merge_mode='mor' composes with PARTITIONED BY since r13 — the full
    // behavioral contract is PartitionedMorSpec; here just pin that the
    // CREATE is accepted
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_pmor_ok")
    spark.sql(
      s"""CREATE TABLE $cat.t_pmor_ok (k BIGINT NOT NULL, ts TIMESTAMP, a BIGINT)
         USING graft PARTITIONED BY (days(ts))
         TBLPROPERTIES ('merge_key'='k', 'merge_mode'='mor')""")
    val t = mkDays("t_guard")
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.$t DROP COLUMN ts"))
    assert(e3.getMessage.contains("partition column"))
    // RENAME of the partition column is metadata-only and keeps working
    spark.sql(s"ALTER TABLE $cat.$t RENAME COLUMN ts TO event_ts")
    seedDaysRenamed(t)
    assert(filesPlanned(spark.sql(s"SELECT * FROM $cat.$t WHERE " +
      "event_ts >= timestamp'2024-03-03 00:00:00'")) <
      filesPlanned(spark.sql(s"SELECT * FROM $cat.$t")))
  }

  test("ALTER guards: mor flip accepted on partitioned; reserved names; null/escaped partition values in retention") {
    val t = mkDays("t_alter_guard")
    // flipping a partitioned table to merge-on-read is allowed since r13
    // (behavioral contract in PartitionedMorSpec)
    spark.sql(s"ALTER TABLE $cat.$t SET TBLPROPERTIES ('merge_mode'='mor')")
    spark.sql(s"ALTER TABLE $cat.$t SET TBLPROPERTIES ('merge_mode'='cow')")
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.$t ADD COLUMNS (gpart STRING)"))
    assert(e2.getMessage.contains("reserved"))
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.$t RENAME COLUMN amount TO gbucket"))
    assert(e3.getMessage.contains("reserved"))
    // identity partitioning over a NULLABLE string with values needing
    // dir escaping: retention must compare UNESCAPED values and never
    // drop the null-partition sentinel on an ordering bound
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_nullpart")
    spark.sql(s"""CREATE TABLE $cat.t_nullpart
      (k BIGINT NOT NULL, region STRING, amount BIGINT) USING graft
      PARTITIONED BY (region)
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    spark.sql(s"INSERT INTO $cat.t_nullpart VALUES " +
      "(1, 'a b', 10), (2, 'a c', 20), (3, NULL, 30), (4, 'z', 40)")
    // below => 'a c': drops only 'a b' (unescaped compare — the dir name
    // is 'a%20b'); NULL and 'a c'/'z' survive
    spark.sql(s"CALL $cat.expire_partitions(table => 't_nullpart', " +
      "below => 'a c')")
    val got = spark.sql(s"SELECT k FROM $cat.t_nullpart ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 3L, 4L), s"got $got")
  }

  test("clone, CTAS and version expiry compose with partitioned layouts") {
    val t = mkDays("t_compose")
    seedDays(t)
    spark.sql(s"UPDATE $cat.$t SET amount = amount + 5 WHERE k % 4 = 0")
    val pre = spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.$t").head()
    // clone materializes multi-owner partitioned slots into a
    // self-contained base (gpart=/gbucket= two-level dirs)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_compose_clone")
    spark.sql(s"CALL $cat.clone(table => 't_compose', target => 't_compose_clone')")
    assert(spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.t_compose_clone")
      .head() === pre)
    val cloneDir = s"$warehouse/t_compose_clone"
    assert(GraftStore.readMeta(cloneDir).partition.exists(_._1 == "days"))
    assert(GraftStore.ownersOf(cloneDir, GraftStore.currentVersion(cloneDir))
      .keySet.forall(_.matches("gpart=\\d+/gbucket=\\d+")))
    // CTAS with PARTITIONED BY goes through the staging catalog
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_ctas_part")
    spark.sql(s"""CREATE TABLE $cat.t_ctas_part USING graft
      PARTITIONED BY (days(ts))
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')
      AS SELECT k, ts, amount FROM $cat.$t""")
    assert(spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.t_ctas_part")
      .head() === pre)
    assert(GraftStore.ownersOf(s"$warehouse/t_ctas_part", 1L)
      .keySet.forall(_.matches("gpart=\\d+/gbucket=\\d+")))
    // version expiry on the partitioned table: old version dirs referenced
    // by the kept snapshot become _expired file hosts; contents intact
    val dir = s"$warehouse/$t"
    (1 to 3).foreach(i => spark.sql(
      s"INSERT INTO $cat.$t VALUES (${200 + i}, timestamp'2024-03-0$i 06:00:00', $i)"))
    val post = spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.$t").head()
    GraftStore.expireVersions(dir, keepLast = 1)
    assert(GraftStore.listVersions(dir).size === 1)
    assert(spark.sql(s"SELECT SUM(amount), COUNT(*) FROM $cat.$t").head() === post)
  }

  private def seedDaysRenamed(t: String): Unit =
    spark.sql(s"""INSERT INTO $cat.$t
      SELECT id AS k,
        timestamp'2024-03-01 00:00:00' + make_interval(0,0,0, CAST(id / 8 AS INT), 0,0,0) AS event_ts,
        id * 10 AS amount
      FROM range(0, 24)""")
}
