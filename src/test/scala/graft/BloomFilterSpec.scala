package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftStore}

/** `bloom_filter_columns`: per-column parquet bloom filters written by
  * every commit, so the stock reader's row-group filtering skips groups
  * proven key-absent on `=`/IN predicates — the scan-narrowing lever for
  * high-cardinality NON-KEY columns that zone maps (scattered values ⇒
  * useless min/max spans) and bucket pruning (not the merge key) can't
  * help. Presence is asserted from the parquet footers themselves. */
class BloomFilterSpec extends SparkTestBase {

  private lazy val cat = "graftbloom"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_bloom_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def dir(name: String) = s"$warehouse/$name"

  /** Physical column names with a bloom filter in `file`'s footer. */
  private def bloomedCols(file: String): Set[String] =
    graft.sources.GraftStats.bloomedColumns(java.nio.file.Paths.get(file))

  private def liveFiles(name: String): Seq[String] =
    GraftStore.snapshotFiles(dir(name),
      GraftStore.currentVersion(dir(name)))

  test("declared columns get footer bloom filters on every commit; queries unchanged") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_bloom")
    spark.sql(s"""CREATE TABLE $cat.t_bloom
      (k BIGINT NOT NULL, name STRING, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4',
        'bloom_filter_columns'='amount')""")
    spark.sql(s"INSERT INTO $cat.t_bloom " +
      "SELECT id, concat('n', id), id * 7919 FROM range(0, 2000)")
    liveFiles("t_bloom").foreach { f =>
      val b = bloomedCols(f)
      assert(b.contains("amount"), s"$f missing bloom for amount: $b")
      assert(!b.contains("name") && !b.contains("k"),
        s"$f blooms undeclared columns: $b")
    }
    // a cow delta's rewritten files carry the filters too
    spark.sql(s"UPDATE $cat.t_bloom SET amount = amount + 1 WHERE k % 5 = 0")
    liveFiles("t_bloom").foreach(f =>
      assert(bloomedCols(f).contains("amount")))
    // point equality on the bloomed column: correct (row-group skipping
    // is the reader's internal shortcut, results must be identical)
    assert(spark.sql(s"SELECT k FROM $cat.t_bloom WHERE amount = ${42 * 7919}")
      .head().getLong(0) === 42L)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.t_bloom WHERE amount = 3").head()
      .getLong(0) === 0L)
    // the property round-trips through DESCRIBE-visible properties
    assert(spark.sql(s"SHOW TBLPROPERTIES $cat.t_bloom").collect()
      .exists(r => r.getString(0) == "bloom_filter_columns" &&
        r.getString(1) == "amount"))
  }

  test("ALTER changes the set; OPTIMIZE retrofits; RENAME keeps blooming (physical names)") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_alter")
    spark.sql(s"""CREATE TABLE $cat.t_alter
      (k BIGINT NOT NULL, v BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    spark.sql(s"INSERT INTO $cat.t_alter SELECT id, id * 3 FROM range(0, 100)")
    liveFiles("t_alter").foreach(f => assert(bloomedCols(f).isEmpty))
    spark.sql(s"ALTER TABLE $cat.t_alter SET TBLPROPERTIES " +
      "('bloom_filter_columns'='v')")
    // pre-existing files keep bloom-less footers; OPTIMIZE retrofits
    spark.sql(s"CALL $cat.optimize(`table` => 't_alter', max_files_per_bucket => 0)")
    liveFiles("t_alter").foreach(f =>
      assert(bloomedCols(f).contains("v"), s"$f not retrofitted"))
    // rename the bloomed column: declaration follows (stored physical),
    // new files bloom under the ORIGINAL physical name
    spark.sql(s"ALTER TABLE $cat.t_alter RENAME COLUMN v TO val")
    assert(spark.sql(s"SHOW TBLPROPERTIES $cat.t_alter").collect()
      .exists(r => r.getString(0) == "bloom_filter_columns" &&
        r.getString(1) == "val"))
    spark.sql(s"INSERT INTO $cat.t_alter SELECT id, id * 3 FROM range(100, 200)")
    val newFiles = liveFiles("t_alter").filter(_.contains(
      f"/v${GraftStore.currentVersion(dir("t_alter"))}%010d/"))
    assert(newFiles.nonEmpty)
    newFiles.foreach(f => assert(bloomedCols(f).contains("v")))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t_alter WHERE val = 300")
      .head().getLong(0) === 1L)
  }

  test("guards: unknown column, non-atomic, and boolean types rejected") {
    warehouse
    val e1 = intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.t_bad (k BIGINT NOT NULL, v BIGINT) USING graft
         TBLPROPERTIES ('merge_key'='k', 'bloom_filter_columns'='nope')"""))
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.t_bad (k BIGINT NOT NULL, v ARRAY<INT>) USING graft
         TBLPROPERTIES ('merge_key'='k', 'bloom_filter_columns'='v')"""))
    assert(e2.getMessage.contains("atomic"))
    // parquet-mr cannot bloom-hash booleans: its read-side hash throws on
    // the first filtered scan, so CREATE/ALTER must reject them up front
    val e3 = intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.t_bad (k BIGINT NOT NULL, v BOOLEAN) USING graft
         TBLPROPERTIES ('merge_key'='k', 'bloom_filter_columns'='v')"""))
    assert(e3.getMessage.contains("boolean"))
  }

  test("RTAS remaps the declaration through rewritten physical identities") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_rtas")
    spark.sql(s"""CREATE TABLE $cat.t_rtas
      (k BIGINT NOT NULL, v BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    spark.sql(s"INSERT INTO $cat.t_rtas SELECT id, id FROM range(0, 50)")
    // rename v away so the REPLACE's redeclared 'v' is a NEW column with
    // a FRESH physical identity (v__r<stamp>) — the declaration must
    // follow it or blooms silently never get written
    spark.sql(s"ALTER TABLE $cat.t_rtas RENAME COLUMN v TO w")
    spark.sql(s"""REPLACE TABLE $cat.t_rtas USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2',
        'bloom_filter_columns'='v')
      AS SELECT k, w AS v FROM $cat.t_rtas""")
    val files = liveFiles("t_rtas")
    assert(files.nonEmpty)
    files.foreach { f =>
      val b = bloomedCols(f)
      assert(b.size == 1 && b.head.startsWith("v"),
        s"$f must bloom the rewritten physical column: $b")
    }
    // and later commits keep blooming under the remapped identity
    spark.sql(s"INSERT INTO $cat.t_rtas SELECT id, id FROM range(50, 80)")
    val dirPath = dir("t_rtas")
    val newFiles = liveFiles("t_rtas").filter(_.contains(
      f"/v${GraftStore.currentVersion(dirPath)}%010d/"))
    assert(newFiles.nonEmpty)
    newFiles.foreach(f => assert(bloomedCols(f).exists(_.startsWith("v"))))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t_rtas WHERE v = 60")
      .head().getLong(0) === 1L)
  }
}
