package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftStore}

/** SQL DML surface over the GraftCatalog DSv2 store: CREATE/INSERT/MERGE/
  * UPDATE/DELETE as SQL text, time travel, pushdown through the delegated
  * parquet scan, and bucket-scoped copy-on-write commits. */
class CatalogSpec extends SparkTestBase {

  private lazy val cat = "graftspec"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_catalog_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def mkTable(name: String, buckets: Int = 8): String = {
    warehouse // force catalog registration
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(s"""CREATE TABLE $cat.$name
      (k BIGINT NOT NULL, name STRING, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='$buckets')""")
    name
  }

  private def rows(name: String): Seq[(Long, String, Long)] =
    spark.sql(s"SELECT k, name, amount FROM $cat.$name ORDER BY k")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("create + insert + select round-trips") {
    val t = mkTable("t_basic")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    assert(rows(t) === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    // append keeps existing rows
    spark.sql(s"INSERT INTO $cat.$t VALUES (4, 'd', 40)")
    assert(rows(t).map(_._1) === Seq(1L, 2L, 3L, 4L))
  }

  test("MERGE INTO applies update, delete, and insert branches") {
    val t = mkTable("t_merge")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    import spark.implicits._
    Seq((2L, "b2", 200L, "upsert"), (3L, "c", 0L, "delete"),
      (4L, "d", 40L, "upsert"), (5L, "e", 0L, "delete"))
      .toDF("k", "name", "amount", "op").createOrReplaceTempView("merge_src")
    spark.sql(s"""MERGE INTO $cat.$t t USING merge_src s ON t.k = s.k
      WHEN MATCHED AND s.op = 'delete' THEN DELETE
      WHEN MATCHED THEN UPDATE SET name = s.name, amount = s.amount
      WHEN NOT MATCHED AND s.op <> 'delete' THEN
        INSERT (k, name, amount) VALUES (s.k, s.name, s.amount)""")
    // 1 kept, 2 updated, 3 deleted, 4 inserted, 5 unmatched-delete no-op
    assert(rows(t) === Seq((1L, "a", 10L), (2L, "b2", 200L), (4L, "d", 40L)))
  }

  test("UPDATE and DELETE statements with predicates") {
    val t = mkTable("t_dml")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30), (4, 'd', 40)")
    spark.sql(s"UPDATE $cat.$t SET amount = amount + 1 WHERE k % 2 = 0")
    assert(rows(t) === Seq((1L, "a", 10L), (2L, "b", 21L), (3L, "c", 30L), (4L, "d", 41L)))
    spark.sql(s"DELETE FROM $cat.$t WHERE amount > 30")
    assert(rows(t) === Seq((1L, "a", 10L), (2L, "b", 21L), (3L, "c", 30L)))
  }

  test("VERSION AS OF reads a pinned committed version") {
    val t = mkTable("t_tt")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10)") // v1
    spark.sql(s"INSERT INTO $cat.$t VALUES (2, 'b', 20)") // v2
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 1")         // v3
    assert(rows(t) === Seq((2L, "b", 20L)))
    val v1 = spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 1").collect().map(_.getLong(0))
    assert(v1.toSeq === Seq(1L))
    val v2 = spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 2 ORDER BY k")
      .collect().map(_.getLong(0))
    assert(v2.toSeq === Seq(1L, 2L))
    // version GC keeps the newest n, pointer intact
    GraftStore.expireVersions(s"$warehouse/t_tt", keepLast = 2)
    assert(GraftStore.listVersions(s"$warehouse/t_tt") ===
      Seq(2L, 3L))
    assert(rows(t) === Seq((2L, "b", 20L)))
  }

  test("filters push down through the delegated parquet scan") {
    val t = mkTable("t_push")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20)")
    val plan = spark.sql(s"SELECT name FROM $cat.$t WHERE amount > 15")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("amount"),
      s"expected pushed filter on amount:\n$plan")
    // and the reserved bucket column never leaks into the logical surface
    assert(!spark.table(s"$cat.$t").columns.contains(GraftStore.BucketCol))
  }

  test("INSERT OVERWRITE replaces contents") {
    val t = mkTable("t_ow")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql(s"INSERT OVERWRITE $cat.$t VALUES (9, 'z', 90)")
    assert(rows(t) === Seq((9L, "z", 90L)))
  }

  test("copy-on-write rewrites only touched buckets; others are hard-linked") {
    val t = mkTable("t_cow", buckets = 8)
    warehouse
    spark.sql(s"INSERT INTO $cat.$t SELECT id, CAST(id AS STRING), id * 10 " +
      "FROM range(0, 64)")
    val dir = s"$warehouse/t_cow"
    val v1 = GraftStore.currentVersion(dir)
    spark.sql(s"UPDATE $cat.$t SET amount = 0 WHERE k = 7")
    val v2 = GraftStore.currentVersion(dir)
    assert(v2 === v1 + 1)
    // the bucket holding k=7 was rewritten; every other bucket's files are
    // hard links to the previous version (same inode ⇒ same fileKey)
    val touched = spark.sql(
      s"SELECT pmod(xxhash64(CAST(7 AS BIGINT)), 8)").head().getLong(0).toInt
    val v1d = java.nio.file.Paths.get(GraftStore.versionDir(dir, v1))
    val v2d = java.nio.file.Paths.get(GraftStore.versionDir(dir, v2))
    import scala.jdk.CollectionConverters._
    val linked = Files.list(v2d).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(s"${GraftStore.BucketCol}="))
      .filterNot(_.getFileName.toString.endsWith(s"=$touched"))
      .flatMap(d => Files.list(d).iterator().asScala)
      .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("."))
      .toSeq
    assert(linked.nonEmpty)
    linked.foreach { f =>
      val twin = v1d.resolve(v2d.relativize(f))
      assert(Files.exists(twin), s"linked file without a v1 twin: $f")
      val k1 = Files.readAttributes(f, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      val k2 = Files.readAttributes(twin, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      assert(k1 == k2, s"untouched bucket file was copied, not linked: $f")
    }
    assert(rows(t).find(_._1 == 7L).get._3 === 0L)
  }
}
