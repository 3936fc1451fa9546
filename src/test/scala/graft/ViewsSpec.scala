package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftStore}

/** Persisted SQL views over the graft catalog (DSv2 ViewCatalog, S38):
  * CREATE [OR REPLACE] VIEW / DROP VIEW / ALTER VIEW SET-UNSET
  * TBLPROPERTIES / SHOW VIEWS as plain SQL, definitions stored as one
  * JSON file each under `<warehouse>/_views/`, resolved under the
  * definer's catalog + namespace context. Views compose with the store:
  * a view over a store table tracks DML, view-on-view nests, time travel
  * inside the text pins, and tables/views share one namespace with loud
  * cross-creation failures. */
class ViewsSpec extends SparkTestBase {

  private lazy val cat = "graftviews"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_views_spec")
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

  private def chain(x: Throwable): Seq[Throwable] =
    Option(x).toSeq.flatMap(t => t +: chain(t.getCause))

  test("CREATE VIEW over a store table; the view tracks DML") {
    val t = mkTable("t_v_base")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql(s"CREATE VIEW $cat.v_big AS " +
      s"SELECT k, amount * 2 AS dbl FROM $cat.$t WHERE amount >= 20")
    val got = spark.sql(s"SELECT k, dbl FROM $cat.v_big ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 40L), (3L, 60L)))
    // a view is a definition, not a snapshot: later DML shows through
    spark.sql(s"UPDATE $cat.$t SET amount = 25 WHERE k = 1")
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 3")
    val got2 = spark.sql(s"SELECT k, dbl FROM $cat.v_big ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 === Seq((1L, 50L), (2L, 40L)))
    // the definition is on disk, one JSON per view
    assert(Files.exists(java.nio.file.Paths.get(warehouse, "_views",
      "v_big.json")))
  }

  test("view-on-view, OR REPLACE, column aliases and SHOW VIEWS") {
    val t = mkTable("t_v_nest")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 5), (2, 15), (3, 25)")
    spark.sql(s"CREATE VIEW $cat.v_lvl1 AS SELECT k, amount FROM $cat.$t " +
      "WHERE amount > 10")
    spark.sql(s"CREATE VIEW $cat.v_lvl2 (kk, aa) AS " +
      s"SELECT k, amount FROM $cat.v_lvl1 WHERE amount < 20")
    val got = spark.sql(s"SELECT kk, aa FROM $cat.v_lvl2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 15L)))
    // OR REPLACE swaps the definition atomically
    spark.sql(s"CREATE OR REPLACE VIEW $cat.v_lvl2 (kk, aa) AS " +
      s"SELECT k, amount FROM $cat.v_lvl1 WHERE amount >= 20")
    assert(spark.sql(s"SELECT kk FROM $cat.v_lvl2").collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    val shown = spark.sql(s"SHOW VIEWS IN $cat").collect()
      .map(_.getString(1)).toSet
    assert(Set("v_lvl1", "v_lvl2").subsetOf(shown), s"got $shown")
  }

  test("ALTER VIEW properties, RENAME, DROP") {
    val t = mkTable("t_v_alter")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 1)")
    spark.sql(s"CREATE VIEW $cat.v_props AS SELECT k FROM $cat.$t")
    spark.sql(s"ALTER VIEW $cat.v_props SET TBLPROPERTIES ('team'='data')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.v_props").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("team").contains("data"), s"got $props")
    spark.sql(s"ALTER VIEW $cat.v_props UNSET TBLPROPERTIES ('team')")
    val props2 = spark.sql(s"SHOW TBLPROPERTIES $cat.v_props").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(!props2.contains("team"), s"got $props2")
    spark.sql(s"ALTER VIEW $cat.v_props RENAME TO v_renamed")
    assert(spark.sql(s"SELECT k FROM $cat.v_renamed").count() === 1)
    spark.sql(s"DROP VIEW $cat.v_renamed")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.v_renamed").collect()
    }
    assert(chain(e).exists(x => x.getMessage != null &&
      (x.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        x.getMessage.contains("cannot be found"))), s"got $e")
  }

  test("views and tables share one namespace; duplicates fail loudly") {
    val t = mkTable("t_v_ns")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 1)")
    // view over an existing TABLE name
    val eT = intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.$t AS SELECT 1 AS x")
    }
    assert(chain(eT).exists(x => x.getMessage != null &&
      (x.getMessage.contains("share one namespace") ||
        x.getMessage.toUpperCase.contains("ALREADY_EXISTS") ||
        x.getMessage.contains("already exists"))), s"got $eT")
    // duplicate view
    spark.sql(s"CREATE VIEW $cat.v_dup AS SELECT k FROM $cat.$t")
    val eV = intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.v_dup AS SELECT amount FROM $cat.$t")
    }
    assert(chain(eV).exists(x => x.getMessage != null &&
      (x.getMessage.toUpperCase.contains("ALREADY_EXISTS") ||
        x.getMessage.contains("already exists"))), s"got $eV")
    // TABLE over an existing VIEW name
    val eTab = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.v_dup (k BIGINT NOT NULL) USING graft
        TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    }
    assert(chain(eTab).exists(x => x.getMessage != null &&
      (x.getMessage.contains("share one namespace") ||
        x.getMessage.contains("already exists") ||
        x.getMessage.toUpperCase.contains("ALREADY_EXISTS"))), s"got $eTab")
  }

  test("definition cycles and self-references fail loudly, never loop") {
    val t = mkTable("t_v_cyc")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 1)")
    // direct self-reference via OR REPLACE: the new text reads the view
    // being replaced — rejected at CREATE (expansion seeds the guard
    // with the view's own name)
    spark.sql(s"CREATE VIEW $cat.v_self AS SELECT k FROM $cat.$t")
    val eSelf = intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE VIEW $cat.v_self AS " +
        s"SELECT k FROM $cat.v_self")
    }
    assert(chain(eSelf).exists(x => x.getMessage != null &&
      x.getMessage.contains("cycle")), s"got $eSelf")
    // mutual cycle built by replacing a leaf after the fact: a -> b,
    // then b -> a; the READ must fail with the cycle path
    spark.sql(s"CREATE VIEW $cat.v_leaf AS SELECT k FROM $cat.$t")
    spark.sql(s"CREATE VIEW $cat.v_top AS SELECT k FROM $cat.v_leaf")
    val eRep = intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE VIEW $cat.v_leaf AS " +
        s"SELECT k FROM $cat.v_top")
    }
    assert(chain(eRep).exists(x => x.getMessage != null &&
      x.getMessage.contains("cycle")), s"got $eRep")
  }

  test("unqualified names in a view body resolve in the definer's catalog") {
    val t = mkTable("t_v_defctx")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 7)")
    val prevCat = spark.catalog.currentCatalog()
    spark.catalog.setCurrentCatalog(cat)
    try
      // body references the table UNQUALIFIED; the definer context (the
      // current catalog at CREATE) is stored and re-applied at read
      spark.sql(s"CREATE VIEW $cat.v_defctx AS SELECT k, amount FROM $t")
    finally spark.catalog.setCurrentCatalog(prevCat)
    // read from a DIFFERENT current catalog: the unqualified name must
    // still mean the definer's table, not the reader's namespace
    assert(spark.sql(s"SELECT amount FROM $cat.v_defctx").collect()
      .map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("ALTER VIEW ... AS swaps the definition and keeps properties") {
    val t = mkTable("t_v_alteras")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10), (2, 20)")
    spark.sql(s"CREATE VIEW $cat.v_swap AS SELECT k FROM $cat.$t")
    spark.sql(s"ALTER VIEW $cat.v_swap SET TBLPROPERTIES ('keep'='me')")
    spark.sql(s"ALTER VIEW $cat.v_swap AS SELECT amount FROM $cat.$t " +
      "WHERE amount > 15")
    assert(spark.sql(s"SELECT amount FROM $cat.v_swap").collect()
      .map(_.getLong(0)).toSeq === Seq(20L))
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.v_swap").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("keep").contains("me"), s"got $props")
    // ALTER ... AS on a missing view fails (it is not CREATE)
    val e = intercept[Exception] {
      spark.sql(s"ALTER VIEW $cat.v_ghost AS SELECT 1 AS x")
    }
    assert(chain(e).exists(x => x.getMessage != null &&
      (x.getMessage.contains("cannot be found") ||
        x.getMessage.toUpperCase.contains("NOT_FOUND"))), s"got $e")
  }

  test("definer context qualifies 2-part names and respects CTE scope") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.t_q")
    spark.sql(s"""CREATE TABLE $cat.ns.t_q
      (k BIGINT NOT NULL, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='2')""")
    spark.sql(s"INSERT INTO $cat.ns.t_q VALUES (1, 11)")
    val t = mkTable("t_q_flat")
    spark.sql(s"INSERT INTO $cat.$t VALUES (2, 22)")
    val prevCat = spark.catalog.currentCatalog()
    spark.catalog.setCurrentCatalog(cat)
    try {
      // 2-part name (namespace-relative at CREATE time) + a CTE that
      // SHADOWS the flat table's name in one subtree only
      spark.sql(s"CREATE VIEW $cat.v_q AS " +
        s"SELECT amount FROM ns.t_q UNION ALL SELECT amount FROM $t")
      spark.sql(s"CREATE VIEW $cat.v_cte AS " +
        s"SELECT amount FROM $t UNION ALL " +
        s"SELECT * FROM (WITH $t AS (SELECT 99 AS a) SELECT a FROM $t)")
    } finally spark.catalog.setCurrentCatalog(prevCat)
    // read from a DIFFERENT current catalog: both the 2-part and 1-part
    // body names must resolve in the DEFINER's catalog, while the
    // CTE-shadowed inner reference stays a CTE
    assert(spark.sql(s"SELECT amount FROM $cat.v_q").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(11L, 22L))
    assert(spark.sql(s"SELECT * FROM $cat.v_cte").collect()
      .map(r => r.getLong(0)).sorted.toSeq === Seq(22L, 99L))
  }

  test("REPLACE TABLE over a view name fails loudly") {
    val t = mkTable("t_v_rtas")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 1)")
    spark.sql(s"CREATE VIEW $cat.v_rtas AS SELECT k FROM $cat.$t")
    val e = intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE TABLE $cat.v_rtas USING graft " +
        s"TBLPROPERTIES ('merge_key'='k', 'buckets'='2') " +
        s"AS SELECT k FROM $cat.$t")
    }
    assert(chain(e).exists(x => x.getMessage != null &&
      x.getMessage.contains("share one namespace")), s"got $e")
  }

  test("writes to a view fail with a clear read-only error") {
    val t = mkTable("t_v_wr")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 1)")
    spark.sql(s"CREATE VIEW $cat.v_wr AS SELECT k, amount FROM $cat.$t")
    def loud(sql: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      assert(chain(e).exists(x => x.getMessage != null &&
        x.getMessage.contains("read-only")), s"for [$sql] got $e")
    }
    loud(s"INSERT INTO $cat.v_wr VALUES (2, 2)")
    loud(s"DELETE FROM $cat.v_wr WHERE k = 1")
    loud(s"UPDATE $cat.v_wr SET amount = 9 WHERE k = 1")
    loud(s"MERGE INTO $cat.v_wr t USING (SELECT 1 AS k) s ON t.k = s.k " +
      "WHEN MATCHED THEN DELETE")
    // a view in the MERGE SOURCE is a read — still works
    spark.sql(s"MERGE INTO $cat.$t t USING $cat.v_wr s ON t.k = s.k + 1 " +
      "WHEN NOT MATCHED THEN INSERT (k, amount) VALUES (s.k + 1, s.amount)")
    assert(spark.table(s"$cat.$t").count() === 2)
    // rename of a TABLE onto a view name is the namespace guard too
    val eRen = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.$t RENAME TO v_wr")
    }
    assert(chain(eRen).exists(x => x.getMessage != null &&
      x.getMessage.contains("share one namespace")), s"got $eRen")
  }

  test("view names with dots are rejected (the flattening separator)") {
    val e = intercept[Exception] {
      warehouse
      spark.sql(s"CREATE VIEW $cat.`a.b` AS SELECT 1 AS x")
    }
    assert(chain(e).exists(x => x.getMessage != null &&
      x.getMessage.contains("illegal view identifier")), s"got $e")
    // PROBES on an illegal name must not throw: no view can have it
    spark.sql(s"DROP VIEW IF EXISTS $cat.`a.b`") // no-op, not an error
    val eLoad = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.`a.b`").collect()
    }
    assert(chain(eLoad).exists(x => x.getMessage != null &&
      (x.getMessage.contains("cannot be found") ||
        x.getMessage.toUpperCase.contains("NOT_FOUND"))), s"got $eLoad")
  }

  test("nested write targets and writeTo hit the read-only guard too") {
    import spark.implicits._
    val t = mkTable("t_v_wr2")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 1)")
    spark.sql(s"CREATE VIEW $cat.v_wr2 AS SELECT k, amount FROM $cat.$t")
    // Hive-style multi-insert: the write statements sit BELOW the root
    val eMulti = intercept[Exception] {
      spark.sql(s"FROM $cat.$t " +
        s"INSERT INTO $cat.v_wr2 SELECT k, amount " +
        s"INSERT INTO $cat.$t SELECT k + 100, amount")
    }
    assert(chain(eMulti).exists(x => x.getMessage != null &&
      x.getMessage.contains("read-only")), s"got $eMulti")
    // DataFrameWriterV2 arrives as v2 write nodes, not InsertIntoStatement
    val eV2 = intercept[Exception] {
      Seq((9L, 9L)).toDF("k", "amount").writeTo(s"$cat.v_wr2").append()
    }
    assert(chain(eV2).exists(x => x.getMessage != null &&
      (x.getMessage.contains("read-only") ||
        x.getMessage.toUpperCase.contains("NOT_FOUND") ||
        x.getMessage.contains("cannot be found"))), s"got $eV2")
    assert(spark.table(s"$cat.$t").count() === 1, "nothing landed")
  }

  test("time travel pinned inside a view definition") {
    val t = mkTable("t_v_tt")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 10), (2, 20)") // v1
    GraftStore.createTag(s"$warehouse/$t", "vday", 1L)
    spark.sql(s"CREATE VIEW $cat.v_pinned AS " +
      s"SELECT k, amount FROM $cat.$t VERSION AS OF 'vday'")
    spark.sql(s"DELETE FROM $cat.$t WHERE k = 1") // v2
    // the live table moved; the pinned view did not
    assert(spark.sql(s"SELECT k FROM $cat.v_pinned ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(spark.sql(s"SELECT k FROM $cat.$t").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
  }
}
