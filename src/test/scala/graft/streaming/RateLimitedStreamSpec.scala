package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.{GraftCatalog, GraftStore}
import org.apache.spark.sql.streaming.Trigger

/** Admission control on the store's streams (`maxVersionsPerTrigger` /
  * `maxRowsPerTrigger`): batches stay VERSION-ALIGNED (a transaction is
  * never split), the row budget admits whole versions until full (the
  * first is always admitted so an over-budget commit still flows), the
  * base-table stream emits its snapshot alone under a limit, and
  * `Trigger.AvailableNow` drains to the version pinned at start in
  * bounded batches, then terminates. */
class RateLimitedStreamSpec extends SparkTestBase {

  private lazy val cat = "graftrate"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_rate_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def mkTable(name: String): String = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(s"""CREATE TABLE $cat.$name
      (k BIGINT NOT NULL, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    name
  }

  /** Distinct change_versions per non-empty micro-batch, in batch order. */
  private def runChangesStream(table: String, ckpt: String,
      opts: Map[String, String], trigger: Option[Trigger] = None,
      drainWith: Option[org.apache.spark.sql.streaming.StreamingQuery => Unit] = None)
      : Seq[Set[Long]] = {
    val batches =
      new scala.collection.mutable.ArrayBuffer[Set[Long]]()
    var r = spark.readStream
    opts.foreach { case (k, v) => r = r.option(k, v) }
    var w = r.table(s"$cat.`$table$$changes`").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = df.select("change_version").distinct()
          .collect().map(_.getLong(0)).toSet
        if (vs.nonEmpty) batches.synchronized { batches += vs }
        ()
      }
      .option("checkpointLocation", ckpt)
    trigger.foreach(t => w = w.trigger(t))
    val q = w.start()
    try drainWith.getOrElse(
      (qq: org.apache.spark.sql.streaming.StreamingQuery) =>
        qq.processAllAvailable())(q)
    finally q.stop()
    batches.synchronized { batches.toSeq }
  }

  test("maxVersionsPerTrigger=1 drains the changelog one version per batch") {
    val t = mkTable("t_mvpt")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10), (2, 20)")  // v1
    spark.sql(s"UPDATE $cat.$t SET amount = 21 WHERE k = 2")   // v2
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 1")              // v3
    val ckpt = Files.createTempDirectory("rate_mvpt_ckpt").toString
    val batches = runChangesStream(t, ckpt,
      Map("maxVersionsPerTrigger" -> "1"))
    assert(batches === Seq(Set(1L), Set(2L), Set(3L)),
      s"each batch must carry exactly one version in order, got $batches")
    // the unlimited twin bundles the whole retained history into one batch
    val ckpt2 = Files.createTempDirectory("rate_mvpt_ckpt2").toString
    val un = runChangesStream(t, ckpt2, Map.empty)
    assert(un === Seq(Set(1L, 2L, 3L)), s"got $un")
  }

  test("maxRowsPerTrigger admits whole versions until the budget is full") {
    val t = mkTable("t_mrpt")
    // v1 = 8 rows (alone exceeds the budget of 2 — must still flow),
    // v2 = 1 row, v3 = 1 row (fit together under the budget)
    spark.sql(s"INSERT INTO $cat.$t SELECT id, id * 10 FROM range(0, 8)") // v1
    spark.sql(s"INSERT INTO $cat.$t VALUES (100, 1)")                     // v2
    spark.sql(s"INSERT INTO $cat.$t VALUES (101, 2)")                     // v3
    val ckpt = Files.createTempDirectory("rate_mrpt_ckpt").toString
    val batches = runChangesStream(t, ckpt, Map("maxRowsPerTrigger" -> "2"))
    assert(batches === Seq(Set(1L), Set(2L, 3L)),
      s"over-budget v1 flows alone, v2+v3 share the 2-row budget: $batches")
  }

  test("rate-limited base-table stream: snapshot alone, then bounded tails") {
    val t = mkTable("t_tbl_rate")
    spark.sql(s"INSERT INTO $cat.$t SELECT id, id FROM range(0, 5)") // v1
    val ckpt = Files.createTempDirectory("rate_tbl_ckpt").toString
    val sizes = new scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.option("maxVersionsPerTrigger", "1")
      .table(s"$cat.$t").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        if (n > 0) sizes.synchronized { sizes += n }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(sizes.synchronized(sizes.toSeq) === Seq(5L),
        "first batch is the snapshot alone")
      spark.sql(s"INSERT INTO $cat.$t VALUES (100, 1)") // v2
      spark.sql(s"INSERT INTO $cat.$t VALUES (101, 2)") // v3
      q.processAllAvailable()
      // each tail version arrives as its own batch — never bundled
      assert(sizes.synchronized(sizes.toSeq) === Seq(5L, 1L, 1L),
        s"got ${sizes.synchronized(sizes.toSeq)}")
    } finally q.stop()
  }

  test("Trigger.AvailableNow + rate limit drains to the pinned target and stops") {
    val t = mkTable("t_an_rate")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO $cat.$t VALUES ($i, $i)"))
    val ckpt = Files.createTempDirectory("rate_an_ckpt").toString
    val batches = runChangesStream(t, ckpt,
      Map("maxVersionsPerTrigger" -> "1"),
      trigger = Some(Trigger.AvailableNow()),
      drainWith = Some(q => assert(q.awaitTermination(120000),
        "AvailableNow run must terminate")))
    assert(batches === Seq(Set(1L), Set(2L), Set(3L), Set(4L)),
      s"bounded drain of the full retained history, got $batches")
    // a second AvailableNow run picks up exactly what landed since
    spark.sql(s"INSERT INTO $cat.$t VALUES (9, 9)") // v5
    val batches2 = runChangesStream(t, ckpt,
      Map("maxVersionsPerTrigger" -> "1"),
      trigger = Some(Trigger.AvailableNow()),
      drainWith = Some(q => assert(q.awaitTermination(120000))))
    assert(batches2 === Seq(Set(5L)), s"got $batches2")
  }

  test("invalid rate-limit options fail loudly at stream start") {
    val t = mkTable("t_bad_rate")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 1)")
    def tryOpt(k: String, v: String): Throwable = intercept[Exception] {
      val ckpt = Files.createTempDirectory("rate_bad_ckpt").toString
      val q = spark.readStream.option(k, v).table(s"$cat.`$t$$changes`")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(x: Throwable): Seq[Throwable] =
      Option(x).toSeq.flatMap(t0 => t0 +: chain(t0.getCause))
    assert(chain(tryOpt("maxVersionsPerTrigger", "0")).exists(e =>
      e.getMessage != null && e.getMessage.contains("must be positive")))
    assert(chain(tryOpt("maxRowsPerTrigger", "nope")).exists(e =>
      e.getMessage != null && e.getMessage.contains("positive integer")))
  }
}
