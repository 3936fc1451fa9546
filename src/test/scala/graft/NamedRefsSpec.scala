package graft

import java.nio.file.{Files, Paths}

import graft.sources.{GraftCatalog, GraftStore}

/** Named refs (tags) over the versioned store: `CALL create_tag` /
  * `CALL drop_tag`, `VERSION AS OF '<name>'` resolution, retention
  * pinning in expireVersions (a tagged version and the owner slots its
  * snapshot references survive any keep_last), `t$versions.tags`, and
  * the loud failure modes (duplicate name, bad grammar, unknown tag,
  * tagging an expired version). */
class NamedRefsSpec extends SparkTestBase {

  private lazy val cat = "graftrefs"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_refs_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def mkTable(name: String, buckets: Int = 4): String = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(s"""CREATE TABLE $cat.$name
      (k BIGINT NOT NULL, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='$buckets')""")
    name
  }

  private def ks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("create_tag pins a version VERSION AS OF resolves by name") {
    val t = mkTable("t_tag_basic")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10), (2, 20)") // v1
    spark.sql(s"INSERT INTO $cat.$t VALUES (3, 30)")          // v2
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'rel-1', version => 1)")
    // default version = current
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'latest.good')")
    assert(ks(spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 'rel-1'")) ===
      Seq(1L, 2L))
    assert(ks(spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 'latest.good'")) ===
      Seq(1L, 2L, 3L))
    // numeric literals keep resolving as raw versions
    assert(ks(spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 1")) ===
      Seq(1L, 2L))
    // the tag keeps resolving after MORE commits move the table on
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 1") // v3
    assert(ks(spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 'rel-1'")) ===
      Seq(1L, 2L))
  }

  test("expire_versions keeps tagged versions and their referenced slots") {
    val t = mkTable("t_tag_retention")
    val dir = s"$warehouse/$t"
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10), (2, 20), (3, 30)") // v1
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'keepme', version => 1)")
    // march the table forward well past any keep_last window
    (1 to 4).foreach { i =>
      spark.sql(s"UPDATE $cat.$t SET amount = amount + $i WHERE k = 2")
    } // v2..v5
    spark.sql(s"CALL $cat.expire_versions(table => '$t', keep_last => 1)")
    // v1 survives (pinned) alongside v5 (keep_last); v2..v4 are gone
    assert(GraftStore.listVersions(dir) === Seq(1L, 5L))
    assert(ks(spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 'keepme'")) ===
      Seq(1L, 2L, 3L))
    // the pinned snapshot's CONTENT is intact, not just listed
    val amounts = spark.sql(
      s"SELECT amount FROM $cat.$t VERSION AS OF 'keepme' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(amounts === Seq(10L, 20L, 30L))
    // drop the tag: the version becomes expirable again
    spark.sql(s"CALL $cat.drop_tag(table => '$t', name => 'keepme')")
    spark.sql(s"CALL $cat.expire_versions(table => '$t', keep_last => 1)")
    assert(GraftStore.listVersions(dir) === Seq(5L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 'keepme'").collect()
    }
    assert(e.getMessage.contains("no tag"), e.getMessage)
  }

  test("t$versions surfaces tags per pinned version") {
    val t = mkTable("t_tag_versions")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10)") // v1
    spark.sql(s"INSERT INTO $cat.$t VALUES (2, 20)") // v2
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'b-tag', version => 1)")
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'a-tag', version => 1)")
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'head', version => 2)")
    val got = spark.sql(s"SELECT version, tags FROM $cat.`$t$$versions` " +
        "ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(got === List((0L, Nil), (1L, List("a-tag", "b-tag")),
      (2L, List("head"))))
  }

  test("tag failure modes are loud") {
    val t = mkTable("t_tag_errs")
    val dir = s"$warehouse/$t"
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10)") // v1
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'dup', version => 1)")
    // duplicate name
    val eDup = intercept[Exception] {
      spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'dup', version => 0)")
    }
    assert(eDup.getMessage.contains("already exists"), eDup.getMessage)
    // grammar: must start with a letter (never confusable with a number)
    val eNum = intercept[Exception] {
      GraftStore.createTag(dir, "123", 1L)
    }
    assert(eNum.getMessage.contains("invalid tag name"), eNum.getMessage)
    val eDash = intercept[Exception] { GraftStore.createTag(dir, "-x", 1L) }
    assert(eDash.getMessage.contains("invalid tag name"), eDash.getMessage)
    // unknown version
    val eVer = intercept[Exception] {
      spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'v9', version => 9)")
    }
    assert(eVer.getMessage.contains("no retained version"), eVer.getMessage)
    // unknown tag on resolve and on drop
    val eRes = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.$t VERSION AS OF 'ghost'").collect()
    }
    assert(eRes.getMessage.contains("no tag or branch 'ghost'"), eRes.getMessage)
    val eDrop = intercept[Exception] {
      spark.sql(s"CALL $cat.drop_tag(table => '$t', name => 'ghost')")
    }
    assert(eDrop.getMessage.contains("no tag"), eDrop.getMessage)
    // an expired version cannot be tagged: v0 (the empty create version)
    // is retired by keep_last=1 — v1 survives only because 'dup' pins it
    spark.sql(s"INSERT INTO $cat.$t VALUES (2, 20)") // v2
    spark.sql(s"CALL $cat.expire_versions(table => '$t', keep_last => 1)")
    assert(GraftStore.listVersions(dir) === Seq(1L, 2L))
    val eExp = intercept[Exception] { GraftStore.createTag(dir, "old", 0L) }
    assert(eExp.getMessage.contains("no retained version"), eExp.getMessage)
  }

  test("a tag landing mid-expiry either survives intact or fails loudly") {
    // deterministic replay of the create_tag x expireVersions race commit
    // points: the _expired marker is written first by expire, so a
    // create_tag verifying AFTER the marker must fail and remove its ref
    val t = mkTable("t_tag_race")
    val dir = s"$warehouse/$t"
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10)") // v1
    spark.sql(s"INSERT INTO $cat.$t VALUES (2, 20)") // v2
    // simulate expire's marker landing between createTag's ref write and
    // its verify: pre-mark v1, then the direct store call must clean up
    Files.write(Paths.get(GraftStore.versionDir(dir, 1L), "_expired"),
      Array.empty[Byte])
    val e = intercept[Exception] { GraftStore.createTag(dir, "racer", 1L) }
    assert(e.getMessage.contains("no retained version"), e.getMessage)
    assert(GraftStore.listTags(dir).isEmpty, "failed create must not leak a ref")
    Files.delete(Paths.get(GraftStore.versionDir(dir, 1L), "_expired"))
    // the other ordering: the ref lands BEFORE expire reads the tag set —
    // expire must keep the version (the normal pinning path)
    GraftStore.createTag(dir, "racer", 1L)
    GraftStore.expireVersions(dir, keepLast = 1)
    assert(GraftStore.listVersions(dir).contains(1L))
  }

  test("clone does not copy tags; restore and tags compose") {
    val t = mkTable("t_tag_clone")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10)") // v1
    spark.sql(s"CALL $cat.create_tag(table => '$t', name => 'src-only')")
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_tag_clone2")
    spark.sql(s"CALL $cat.clone(table => '$t', target => 't_tag_clone2')")
    assert(GraftStore.listTags(s"$warehouse/t_tag_clone2").isEmpty,
      "tags are refs into the SOURCE's history; a clone starts clean")
    // restore TO a tagged version works and the tag still resolves after
    spark.sql(s"INSERT INTO $cat.$t VALUES (2, 20)") // v2
    spark.sql(s"CALL $cat.restore(table => '$t', version => 1)") // v3 = v1
    assert(ks(spark.sql(s"SELECT k FROM $cat.$t VERSION AS OF 'src-only'")) ===
      Seq(1L))
    assert(ks(spark.sql(s"SELECT k FROM $cat.$t")) === Seq(1L))
  }
}
