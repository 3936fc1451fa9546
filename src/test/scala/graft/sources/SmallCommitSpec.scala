package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** r16 optimization guard: a keyed commit whose change batch is under the
  * broadcast bounds runs its legs as broadcasts of the batch (base never
  * shuffled); over the bounds it keeps the shuffle plans. Both paths must
  * produce byte-identical table content AND changelog slices — this spec
  * runs the same DML program down each path and diffs everything. Without
  * it the shuffle path would lose all coverage (every other suite's
  * batches are small, so they all take the broadcast path now). */
class SmallCommitSpec extends SparkTestBase {

  private lazy val cat = "smallcommit"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_smallcommit_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def run(name: String, mode: String): Unit = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(s"""CREATE TABLE $cat.$name
      (k BIGINT NOT NULL, name STRING, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4',
        'merge_mode'='$mode')""")
    spark.sql(s"INSERT INTO $cat.$name " +
      "SELECT id, concat('n', id), id * 10 FROM range(0, 300)")
    spark.sql("SELECT id AS k, concat('u', id) AS name, id AS amount " +
      "FROM range(100, 400)").createOrReplaceTempView("sc_src")
    spark.sql(s"""MERGE INTO $cat.$name t USING sc_src s ON t.k = s.k
      WHEN MATCHED AND s.k % 10 = 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET name = s.name, amount = s.amount
      WHEN NOT MATCHED THEN INSERT (k, name, amount)
        VALUES (s.k, s.name, s.amount)""")
    spark.sql(s"UPDATE $cat.$name SET amount = amount + 7 WHERE k % 3 = 1")
    spark.sql(s"DELETE FROM $cat.$name WHERE amount % 5 = 2")
  }

  private def content(name: String): Seq[String] =
    spark.sql(s"SELECT k, name, amount FROM $cat.$name ORDER BY k")
      .collect().toSeq.map(_.toString)

  private def changes(name: String): Seq[String] = {
    val d = s"$warehouse/$name"
    val v = GraftStore.currentVersion(d)
    GraftStore.readChanges(spark, d, 1, v)
      .selectExpr("k", "name", "amount", "change_op",
        "change_before.k", "change_before.name", "change_before.amount")
      .collect().toSeq.map(_.toString).sorted
  }

  for (mode <- Seq("cow", "mor"))
    test(s"broadcast and shuffle commit legs produce identical " +
        s"content and changelog ($mode)") {
      // default bounds: every batch here is small -> broadcast legs
      run(s"bc_$mode", mode)
      // rows bound 0: every batch is "large" -> shuffle legs
      withConf("spark.graft.commit.broadcastMaxRows" -> "0") {
        run(s"sh_$mode", mode)
      }
      assert(content(s"bc_$mode") == content(s"sh_$mode"))
      assert(changes(s"bc_$mode") == changes(s"sh_$mode"))
      assert(content(s"bc_$mode").nonEmpty)
    }

  test("mor over-cap escalation under broadcast legs matches the " +
      "shuffle path (cowRewrite over touched+DV buckets, small batch)") {
    // a tiny delete cap forces every mor DML to escalate into the
    // copy-on-write rewrite over (touched ∪ DV buckets) while the batch
    // still satisfies the broadcast bounds — the r16 ADVICE gap: the
    // undistincted broadcast removes build composed with DV-applied
    // base reads had no coverage
    sys.props("graft.store.morMaxLiveDeletes") = "1"
    try {
      run("esc_bc", "mor")
      withConf("spark.graft.commit.broadcastMaxRows" -> "0") {
        run("esc_sh", "mor")
      }
      assert(content("esc_bc") == content("esc_sh"))
      assert(changes("esc_bc") == changes("esc_sh"))
      assert(content("esc_bc").nonEmpty)
    } finally sys.props.remove("graft.store.morMaxLiveDeletes")
  }
}
