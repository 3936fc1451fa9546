package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftStore}

/** `MERGE INTO ... WITH SCHEMA EVOLUTION`: a wider source auto-ADDs its
  * new columns through the catalog (metadata-only — null-backfill via the
  * physical column mapping), then the merge lands values in them. */
class MergeEvolutionSpec extends SparkTestBase {

  private lazy val cat = "graftevo"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_evo_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  test("wider merge source auto-adds columns; history null-fills; CDC intact") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_evo")
    spark.sql(s"""CREATE TABLE $cat.t_evo
      (k BIGINT NOT NULL, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.t_evo SELECT id, id * 10 FROM range(0, 6)")
    val dir = s"$warehouse/t_evo"
    val preVersion = GraftStore.currentVersion(dir)

    // source carries a column the target doesn't have
    spark.sql("""SELECT id AS k, id * 100 AS amount,
        concat('tag', id) AS label
      FROM range(4, 8)""").createOrReplaceTempView("evo_src")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t_evo t
      USING evo_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET amount = s.amount, label = s.label
      WHEN NOT MATCHED THEN INSERT (k, amount, label)
        VALUES (s.k, s.amount, s.label)""")

    // the new column exists; pre-merge rows read NULL, merged rows carry it
    val got = spark.sql(s"SELECT k, amount, label FROM $cat.t_evo ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSeq
    assert(got === Seq(
      (0L, 0L, "-"), (1L, 10L, "-"), (2L, 20L, "-"), (3L, 30L, "-"),
      (4L, 400L, "tag4"), (5L, 500L, "tag5"),
      (6L, 600L, "tag6"), (7L, 700L, "tag7")))
    // the evolution was metadata + ONE merge commit (no backfill rewrite)
    assert(GraftStore.currentVersion(dir) === preVersion + 1)
    assert(GraftStore.readMeta(dir).schema.fieldNames.contains("label"))
    // CDC: the merge's changelog carries the widened schema with
    // before-images whose label is NULL (the pre-evolution image)
    val ch = spark.sql(s"SELECT change_op, COUNT(*) FROM $cat.`t_evo$$changes` " +
      s"WHERE change_version = ${preVersion + 1} GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch === Map("U" -> 2L, "I" -> 2L))
    // time travel to the pre-merge version reads the widened schema with
    // nulls (same null-filling contract as any post-ADD history read)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.t_evo VERSION AS OF $preVersion " +
        "WHERE label IS NULL").head().getLong(0) === 6L)
    // a merge WITHOUT the clause against an even wider source still fails
    spark.sql("""SELECT id AS k, id AS amount, 'x' AS label, id AS extra2
      FROM range(0, 2)""").createOrReplaceTempView("evo_src2")
    val e = intercept[Exception](spark.sql(s"""MERGE INTO $cat.t_evo t
      USING evo_src2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET extra2 = s.extra2"""))
    assert(e.getMessage.toLowerCase.contains("extra2"))
  }

  test("evolving merge on a partitioned merge-on-read table: auto-ADD + delete slices compose") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_evo_pmor")
    spark.sql(s"""CREATE TABLE $cat.t_evo_pmor
      (k BIGINT NOT NULL, ts TIMESTAMP, amount BIGINT) USING graft
      PARTITIONED BY (days(ts))
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4', 'merge_mode'='mor')""")
    spark.sql(s"""INSERT INTO $cat.t_evo_pmor
      SELECT id, timestamp'2024-03-01 00:00:00'
        + make_interval(0,0,0, CAST(id % 3 AS INT), 0,0,0), id * 10
      FROM range(0, 12)""")
    val dir = s"$warehouse/t_evo_pmor"
    val baseFiles = GraftStore.snapshotFiles(dir, 1L).toSet
    spark.sql("""SELECT id AS k, timestamp'2024-03-02 12:00:00' AS ts,
        id * 100 AS amount, concat('v', id) AS ver
      FROM range(9, 14)""").createOrReplaceTempView("evo_pmor_src")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t_evo_pmor t
      USING evo_pmor_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET amount = s.amount, ts = s.ts, ver = s.ver
      WHEN NOT MATCHED THEN INSERT (k, ts, amount, ver)
        VALUES (s.k, s.ts, s.amount, s.ver)""")
    val vdir = GraftStore.versionDir(dir, GraftStore.currentVersion(dir))
    // the evolving merge stayed merge-on-read: slices live, base carried
    assert(GraftStore.hasLiveDv(vdir),
      "evolving merge on a mor table must still commit delete slices")
    assert(baseFiles.subsetOf(
      GraftStore.snapshotFiles(dir, GraftStore.currentVersion(dir)).toSet))
    assert(GraftStore.readMeta(dir).schema.fieldNames.contains("ver"))
    val got = spark.sql(
      s"SELECT k, amount, ver FROM $cat.t_evo_pmor ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSeq
    assert(got === ((0L until 9L).map(k => (k, k * 10, "-")) ++
      (9L until 14L).map(k => (k, k * 100, s"v$k"))))
    // updated keys MOVED to the 03-02 partition; a pruned scan of that
    // day sees them (and the widened column) while slices are live
    val day2 = spark.sql(s"SELECT k, ver FROM $cat.t_evo_pmor WHERE " +
      "ts >= timestamp'2024-03-02 00:00:00' AND " +
      "ts < timestamp'2024-03-03 00:00:00'").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"))).toSet
    assert((9L until 14L).forall(k => day2.contains((k, s"v$k"))))
    assert(!day2.exists(_._1 == 3L) || day2.contains((3L, "-")))
  }
}
