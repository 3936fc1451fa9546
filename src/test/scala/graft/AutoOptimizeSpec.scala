package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.sources.{GraftCatalog, GraftStore}

/** `auto_optimize` (S35's closed loop): a table property that makes every
  * DML commit whose OWN slots crossed the files-per-slot cap run the
  * slot-scoped compaction inline. The spec pins the contract from the
  * r13 `--scale slotopt` lesson: hot slots stay bounded, COLD slots are
  * never rewritten (their owner dirs stay byte-identical), contents are
  * unchanged by the hook, and the property flips on and off via ALTER. */
class AutoOptimizeSpec extends SparkTestBase {

  private lazy val cat = "graftauto"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_auto_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  /** Live file count of one slot across its owner dirs. */
  private def slotFiles(dir: String, slot: String): Int = {
    val v = GraftStore.currentVersion(dir)
    GraftStore.ownersOf(dir, v).getOrElse(slot, Nil).map { o =>
      val p = java.nio.file.Paths.get(
        s"${GraftStore.versionDir(dir, o)}/$slot")
      if (!Files.isDirectory(p)) 0
      else {
        val ls = Files.list(p)
        try ls.iterator().asScala.count { f =>
            val n = f.getFileName.toString
            Files.isRegularFile(f) && !n.startsWith(".") && !n.startsWith("_")
          }
        finally ls.close()
      }
    }.sum
  }

  private def bucketOf(k: Long, buckets: Int): Int =
    spark.sql(s"SELECT pmod(xxhash64(CAST($k AS BIGINT)), $buckets)")
      .head().getLong(0).toInt

  test("hot slots stay under the cap; contents unchanged; history real") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_auto")
    spark.sql(s"""CREATE TABLE $cat.t_auto
      (k BIGINT NOT NULL, v BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4', 'auto_optimize'='3')""")
    val dir = s"$warehouse/t_auto"
    // ten same-key appends: every commit lands in ONE slot — without the
    // hook that slot would hold 10 files; with cap 3 it can never exceed
    // cap + 1 transiently and must end <= cap
    (1 to 10).foreach(i => spark.sql(s"INSERT INTO $cat.t_auto VALUES (7, $i)"))
    val slot = s"${GraftStore.BucketCol}=${bucketOf(7L, 4)}"
    assert(slotFiles(dir, slot) <= 3,
      s"hot slot holds ${slotFiles(dir, slot)} files, cap 3")
    // the hook changed LAYOUT only: all ten rows are there
    val got = spark.sql(s"SELECT v FROM $cat.t_auto ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(got === (1L to 10L))
    // compactions really happened: more versions than the 10 inserts
    assert(GraftStore.currentVersion(dir) > 10L)
  }

  test("cold slots are never rewritten by the hook") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_cold")
    spark.sql(s"""CREATE TABLE $cat.t_cold
      (k BIGINT NOT NULL, v BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4', 'auto_optimize'='2')""")
    val dir = s"$warehouse/t_cold"
    // pick two keys in DIFFERENT buckets
    val hot = 7L
    val cold = (1L to 50L).find(k => bucketOf(k, 4) != bucketOf(hot, 4)).get
    spark.sql(s"INSERT INTO $cat.t_cold VALUES ($cold, 100)") // v1: cold slot
    val coldSlot = s"${GraftStore.BucketCol}=${bucketOf(cold, 4)}"
    val coldOwnersBefore = GraftStore
      .ownersOf(dir, GraftStore.currentVersion(dir))(coldSlot)
    // hammer the hot key: hooks fire, the cold slot must keep its owners
    (1 to 8).foreach(i => spark.sql(s"INSERT INTO $cat.t_cold VALUES ($hot, $i)"))
    val coldOwnersAfter = GraftStore
      .ownersOf(dir, GraftStore.currentVersion(dir))(coldSlot)
    assert(coldOwnersAfter === coldOwnersBefore,
      "the hook must never rewrite a slot that is under the cap")
    assert(slotFiles(dir, s"${GraftStore.BucketCol}=${bucketOf(hot, 4)}") <= 2)
  }

  test("off by default; ALTER turns it on and off; report agrees") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_flip")
    spark.sql(s"""CREATE TABLE $cat.t_flip
      (k BIGINT NOT NULL, v BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    val dir = s"$warehouse/t_flip"
    (1 to 6).foreach(i => spark.sql(s"INSERT INTO $cat.t_flip VALUES (7, $i)"))
    val slot = s"${GraftStore.BucketCol}=${bucketOf(7L, 4)}"
    assert(slotFiles(dir, slot) === 6, "no hook without the property")
    // the report flags the debt; enabling the property + one commit clears it
    val flagged = spark.sql(s"CALL $cat.maintenance_report(`table` => " +
        "'t_flip', max_files_per_bucket => 4)").collect()
      .find(_.getString(0) == "fragmented_slots").get.getBoolean(1)
    assert(flagged)
    spark.sql(s"ALTER TABLE $cat.t_flip SET TBLPROPERTIES ('auto_optimize'='4')")
    spark.sql(s"INSERT INTO $cat.t_flip VALUES (7, 7)")
    assert(slotFiles(dir, slot) <= 4)
    val clear = spark.sql(s"CALL $cat.maintenance_report(`table` => " +
        "'t_flip', max_files_per_bucket => 4)").collect()
      .find(_.getString(0) == "fragmented_slots").get.getBoolean(1)
    assert(!clear)
    // off again: fragments accumulate from the compacted base
    spark.sql(s"ALTER TABLE $cat.t_flip SET TBLPROPERTIES ('auto_optimize'='false')")
    (8 to 13).foreach(i => spark.sql(s"INSERT INTO $cat.t_flip VALUES (7, $i)"))
    assert(slotFiles(dir, slot) >= 6)
    // contents survived every flip
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t_flip").head().getLong(0) === 13L)
    // bad values are loud
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_flip SET TBLPROPERTIES ('auto_optimize'='-1')")
    }
  }
}
