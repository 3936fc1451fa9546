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

  test("aggregates push down to parquet footers through the delegated scan") {
    val t = mkTable("t_aggpush")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    withConf("spark.sql.parquet.aggregatePushDown" -> "true") {
      val q = spark.sql(s"SELECT COUNT(*), MIN(amount), MAX(amount) FROM $cat.$t")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"expected footer-served aggregation:\n$plan")
      val r = q.head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 10L, 30L)))
    }
  }

  test("DML plan guards: merge prunes target to the key; delete pushes its predicate") {
    import spark.implicits._
    val t = mkTable("t_plans")
    spark.sql(s"INSERT INTO $cat.$t SELECT id, CAST(id AS STRING), id * 2 FROM range(100)")
    Seq((1L, "u", 5L)).toDF("k", "op", "amount").createOrReplaceTempView("plan_src")
    // the rewrite's target scan must column-prune to what the deltas need:
    // the merge key plus the columns CARRIED into the after-image — the
    // assigned column (amount) is replaced wholesale and must NOT be read.
    // Proves pruning survives the row-level rewrite, not only SELECTs.
    val mergePlan = spark.sql(s"""EXPLAIN FORMATTED
      MERGE INTO $cat.$t t USING plan_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET amount = s.amount""")
      .collect().map(_.getString(0)).mkString("\n")
    assert(mergePlan.contains("ReadSchema: struct<k:bigint,name:string>"),
      s"merge target scan should read key + carried cols, never the assigned one:\n$mergePlan")
    assert(mergePlan.contains("WriteDelta") && mergePlan.contains("MergeRows"),
      "merge must plan as a delta write")
    // single-table DELETE: no join, predicate pushed into the parquet scan
    val delPlan = spark.sql(
      s"EXPLAIN FORMATTED DELETE FROM $cat.$t WHERE amount > 150")
      .collect().map(_.getString(0)).mkString("\n")
    assert(delPlan.contains("PushedFilters: [IsNotNull(amount), GreaterThan(amount,150)]"),
      s"delete predicate should push into the scan:\n$delPlan")
    assert(!delPlan.contains("Join"), "single-table delete must not join")
  }

  test("INSERT OVERWRITE replaces contents") {
    val t = mkTable("t_ow")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql(s"INSERT OVERWRITE $cat.$t VALUES (9, 'z', 90)")
    assert(rows(t) === Seq((9L, "z", 90L)))
  }

  test("changelog table exposes per-version full-image changes; replay reproduces any version") {
    val t = mkTable("t_cdc")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10), (2, 'b', 20)")   // v1: I,I
    spark.sql(s"UPDATE $cat.$t SET amount = 21 WHERE k = 2")              // v2: U
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 1")                         // v3: D
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a2', 11)")                // v4: I (re-insert)
    val ops = spark.sql(
      s"SELECT change_version, change_op, k FROM $cat.`t_cdc$$changes` ORDER BY change_version, k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(ops === Seq((1L, "I", 1L), (1L, "I", 2L), (2L, "U", 2L),
      (3L, "D", 1L), (4L, "I", 1L)))
    // delete rows carry only the key: non-key columns are null
    val delRow = spark.sql(
      s"SELECT name, amount FROM $cat.`t_cdc$$changes` WHERE change_op = 'D'").head()
    assert(delRow.isNullAt(0) && delRow.isNullAt(1))
    // Debezium-shaped before-images: U/D carry the replaced row, I is null
    val before = spark.sql(s"""SELECT change_version, change_op,
        change_before.k, change_before.name, change_before.amount
        FROM $cat.`t_cdc$$changes` ORDER BY change_version, k""")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else (r.getLong(2), r.getString(3), r.getLong(4))))
    assert(before.toSeq === Seq(
      (1L, "I", null), (1L, "I", null),
      (2L, "U", (2L, "b", 20L)),
      (3L, "D", (1L, "a", 10L)),
      (4L, "I", null)))
    // a version-range predicate prunes to the matching change directories
    val plan = spark.sql(
      s"SELECT k FROM $cat.`t_cdc$$changes` WHERE change_version = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("change_version"), s"expected partition filter:\n$plan")

    val dir = s"$warehouse/t_cdc"
    val meta = GraftStore.readMeta(dir)
    // replay the full changelog from empty — last-writer-wins across the
    // delete-then-reinsert of k=1 must land on the v4 image
    val replayed = GraftStore.replayChanges(
      GraftStore.readVersion(spark, dir, 0L),
      GraftStore.readChanges(spark, dir, 1L, 4L), meta)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(replayed === Set((1L, "a2", 11L), (2L, "b", 21L)))
    // replay a PREFIX onto a mid-stream snapshot: v2 + changes(3..4) == v4
    val mid = GraftStore.replayChanges(
      GraftStore.readVersion(spark, dir, 2L),
      GraftStore.readChanges(spark, dir, 3L, 4L), meta)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(mid === replayed)
  }

  test("streaming CDC apply: foreachBatch drives MERGE INTO per micro-batch") {
    // the end-to-end shape a real changelog consumer runs: a stream of
    // (key, row, op) records applied transactionally per micro-batch
    // through the SQL MERGE surface — each batch is one store commit, so
    // a crash between batches replays from the checkpoint into a new
    // MERGE (idempotent per key: the re-applied batch lands on the same
    // final image).
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = mkTable("t_stream_merge")
    val in = MemoryStream[(Long, String, Long, String)]
    val q = in.toDS().toDF("k", "name", "amount", "op")
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.createOrReplaceTempView("cdc_batch")
        batch.sparkSession.sql(s"""MERGE INTO $cat.$t t USING cdc_batch c
          ON t.k = c.k
          WHEN MATCHED AND c.op = 'D' THEN DELETE
          WHEN MATCHED THEN UPDATE SET name = c.name, amount = c.amount
          WHEN NOT MATCHED AND c.op <> 'D' THEN
            INSERT (k, name, amount) VALUES (c.k, c.name, c.amount)""")
        ()
      }.start()
    try {
      in.addData((1L, "a", 10L, "U"), (2L, "b", 20L, "U"))
      q.processAllAvailable()
      in.addData((1L, "a2", 11L, "U"), (3L, "c", 30L, "U"))
      q.processAllAvailable()
      in.addData((2L, "", 0L, "D"), (4L, "d", 40L, "U"))
      q.processAllAvailable()
      assert(rows(t) === Seq((1L, "a2", 11L), (3L, "c", 30L), (4L, "d", 40L)))
      // one store commit per non-empty micro-batch
      assert(GraftStore.currentVersion(s"$warehouse/t_stream_merge") === 3L)
    } finally q.stop()
  }

  test("incrementalAgg: group moves, group extinction, null group keys") {
    val t = mkTable("t_mv") // schema (k, name, amount); view groups by name
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'x', 10), (2, 'x', 20), (3, 'y', 30), (4, NULL, 5)")
    spark.sql(s"UPDATE $cat.$t SET name = 'y', amount = 11 WHERE k = 1") // x→y move
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 3")
    spark.sql(s"UPDATE $cat.$t SET amount = 6 WHERE k = 4")              // null group update
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 2")                        // group x dies
    val dir = s"$warehouse/t_mv"
    val empty = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.LongType))))
    val mv = GraftStore.incrementalAgg(empty,
      GraftStore.readChanges(spark, dir, 1L, 5L), Seq("name"), "amount")
      .collect().map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0),
        r.getLong(1), r.getLong(2))).toSet
    // final table: (1,y,11), (4,null,6) → y:(1,11), null:(1,6); x extinct
    assert(mv === Set(("y", 1L, 11L), ("<null>", 1L, 6L)))
  }

  test("streaming MV: change stream + incrementalAgg tracks DML continuously") {
    // the full CDC loop on one storage layout: SQL DML commits → changelog
    // files → file-stream micro-batches → incrementalAgg folds each batch
    // into the running view. A batch may span several commits; the
    // retract/add algebra is additive, so multi-version batches fold
    // exactly like single-version ones.
    import spark.implicits._
    val t = mkTable("t_mv_stream") // (k, name, amount); view groups by name
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'x', 10), (2, 'y', 20)")
    val dir = s"$warehouse/t_mv_stream"
    val mvState = new java.util.concurrent.atomic.AtomicReference[
      Map[(String, Boolean), (Long, Long)]](Map.empty)
    def mvDf = {
      val rows = mvState.get().toSeq.map { case ((g, isNull), (n, s)) =>
        org.apache.spark.sql.Row(if (isNull) null else g, n, s)
      }
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.LongType))))
    }
    val q = GraftStore.streamChanges(spark, dir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = GraftStore.incrementalAgg(mvDf, batch, Seq("name"), "amount")
          .collect().map(r => ((if (r.isNullAt(0)) "" else r.getString(0)),
            r.isNullAt(0)) -> (r.getLong(1), r.getLong(2))).toMap
        mvState.set(next)
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(mvState.get() === Map(("x", false) -> (1L, 10L), ("y", false) -> (1L, 20L)))
      spark.sql(s"UPDATE $cat.$t SET name = 'y', amount = 11 WHERE k = 1")
      spark.sql(s"INSERT INTO $cat.$t VALUES (3, 'z', 30)")
      q.processAllAvailable()
      assert(mvState.get() === Map(("y", false) -> (2L, 31L), ("z", false) -> (1L, 30L)))
      spark.sql(s"DELETE FROM $cat.$t WHERE name = 'y'")
      q.processAllAvailable()
      assert(mvState.get() === Map(("z", false) -> (1L, 30L)))
    } finally q.stop()
  }

  test("optimize compacts fragmented buckets without touching content, history, or changelog") {
    import scala.jdk.CollectionConverters._
    val t = mkTable("t_opt", buckets = 2)
    (1L to 6L).foreach(i => spark.sql(s"INSERT INTO $cat.$t VALUES ($i, 'r$i', ${i * 10})"))
    val dir = s"$warehouse/t_opt"
    val preVersion = GraftStore.currentVersion(dir)
    val preRows = rows(t)
    def filesPerBucket(v: Long): Map[String, Int] = {
      val vd = java.nio.file.Paths.get(GraftStore.versionDir(dir, v))
      java.nio.file.Files.list(vd).iterator().asScala
        .filter(_.getFileName.toString.startsWith(s"${GraftStore.BucketCol}="))
        .map(d => d.getFileName.toString ->
          java.nio.file.Files.list(d).iterator().asScala.count(f =>
            java.nio.file.Files.isRegularFile(f) &&
              !f.getFileName.toString.startsWith(".") &&
              !f.getFileName.toString.startsWith("_")))
        .toMap
    }
    val pre = filesPerBucket(preVersion)
    assert(pre.values.exists(_ > 2), "fixture must fragment")
    val v2 = GraftStore.optimize(spark, dir, maxFilesPerBucket = 2)
    assert(v2 === preVersion + 1)
    val post = filesPerBucket(v2)
    // fragmented buckets compact to ONE file; buckets under the threshold
    // are hard-linked untouched
    pre.foreach { case (b, n) =>
      if (n > 2) assert(post(b) === 1, s"bucket $b not compacted: $post")
      else assert(post(b) === n, s"bucket $b should be untouched: $post")
    }
    assert(rows(t) === preRows)
    // time travel to the fragmented version still works, changelog untouched
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.$t VERSION AS OF $preVersion")
      .head().getLong(0) === 6L)
    assert(GraftStore.readChanges(spark, dir, 1L, v2).count() === 6L)
    // idempotent: nothing fragmented → same version back
    assert(GraftStore.optimize(spark, dir, maxFilesPerBucket = 2) === v2)
    // changelog retention: drop the first three versions' slices
    GraftStore.expireChanges(dir, keepFromVersion = 4L)
    assert(GraftStore.readChanges(spark, dir, 1L, v2)
      .select("change_version").distinct().collect().map(_.getLong(0)).toSet
      === Set(4L, 5L, 6L))
  }

  test("ALTER TABLE ADD COLUMN null-fills history; new DML writes it") {
    val t = mkTable("t_alter")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 'a', 10)")
    spark.sql(s"ALTER TABLE $cat.$t ADD COLUMNS (note STRING)")
    // history null-fills through the declared schema
    val r1 = spark.sql(s"SELECT k, note FROM $cat.$t").head()
    assert(r1.getLong(0) === 1L && r1.isNullAt(1))
    // new DML reads and writes the new column
    spark.sql(s"INSERT INTO $cat.$t VALUES (2, 'b', 20, 'fresh')")
    spark.sql(s"UPDATE $cat.$t SET note = 'patched' WHERE k = 1")
    val got = spark.sql(s"SELECT k, note FROM $cat.$t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "patched"), (2L, "fresh")))
    // pre-evolution changelog slices null-fill too
    val ch = GraftStore.readChanges(spark, s"$warehouse/t_alter", 1L, 1L).head()
    assert(ch.schema.fieldNames.contains("note"))
    assert(ch.isNullAt(ch.fieldIndex("note")))
  }

  test("writeStream.toTable appends per-epoch commits, exactly-once across restart") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = mkTable("t_stream_sink")
    val dir = s"$warehouse/t_stream_sink"
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    def start(in: MemoryStream[(Long, String, Long)]) =
      in.toDS().toDF("k", "name", "amount")
        .writeStream.option("checkpointLocation", ckpt)
        .toTable(s"$cat.$t")
    val in1 = MemoryStream[(Long, String, Long)]
    val q1 = start(in1)
    try {
      in1.addData((1L, "a", 10L)); q1.processAllAvailable()
      in1.addData((2L, "b", 20L), (3L, "c", 30L)); q1.processAllAvailable()
      assert(rows(t) === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
      // one store version per non-empty epoch, each a CDC batch of I rows
      val perVersion = spark.sql(
        s"SELECT change_version, COUNT(*) FROM $cat.`t_stream_sink$$changes` " +
          "GROUP BY change_version ORDER BY change_version")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(perVersion === Seq((1L, 1L), (2L, 2L)))
    } finally q1.stop()
    // restart from the same checkpoint: a fresh MemoryStream must carry
    // the already-committed batches so the checkpointed offsets resolve
    // (the standard MemoryStream restart pattern); any replayed epoch must
    // not double-append (epoch idempotence), new data must flow
    val in2 = MemoryStream[(Long, String, Long)]
    in2.addData((1L, "a", 10L))
    in2.addData((2L, "b", 20L), (3L, "c", 30L))
    val q2 = start(in2)
    try {
      in2.addData((4L, "d", 40L)); q2.processAllAvailable()
      assert(rows(t) ===
        Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    } finally q2.stop()
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
