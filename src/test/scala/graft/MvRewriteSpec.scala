package graft

import java.nio.file.Files

import graft.sources.GraftCatalog
import org.apache.spark.sql.DataFrame

/** Transparent materialized-view rewrite (S39c): a resolved aggregate
  * that is semantically the body of a FRESH MV is answered from the MV's
  * state table without naming it; a stale MV, a non-matching shape, a
  * time-travel read, or the kill switch leave the query untouched. The
  * spec pins both the substitution (state scanned, base absent) and the
  * guarantee that a rewrite can never change results. */
class MvRewriteSpec extends SparkTestBase {

  private lazy val cat = "graftmvr"
  private lazy val warehouse: String = {
    val p = Files.createTempDirectory("graft_mvr_spec")
    p.toFile.deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", p.toString)
    p.toString
  }

  private def mkTable(name: String): String = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(s"""CREATE TABLE $cat.$name
      (k BIGINT NOT NULL, grp BIGINT, amount BIGINT) USING graft
      TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
    name
  }

  private def scanned(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.name()
    }.toSet

  private def readsState(df: DataFrame, t: String): Boolean = {
    val s = scanned(df)
    s.exists(_.contains("__mv_state_")) && !s.exists(_.endsWith(t))
  }

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("a fresh MV answers a matching aggregate from its state") {
    val t = mkTable("mvr_base")
    spark.sql(s"INSERT INTO $cat.$t VALUES " +
      "(1, 0, 10), (2, 0, 20), (3, 1, 30), (4, 2, 40)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_agg AS " +
      s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    val q = s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s FROM $cat.$t GROUP BY grp"
    val rewritten = spark.sql(q)
    assert(readsState(rewritten, t), s"expected state scan, got ${scanned(rewritten)}")
    val direct = withConf("spark.graft.mv.rewrite.enabled" -> "false") {
      val d = spark.sql(q)
      assert(!readsState(d, t), "kill switch must disable the rewrite")
      sorted(d)
    }
    assert(sorted(rewritten) === direct)
    // alias names and COUNT(1)-vs-COUNT(*) are canonicalization noise
    val aliased = spark.sql(s"SELECT grp, COUNT(1) AS cnt, SUM(amount) AS total " +
      s"FROM $cat.$t GROUP BY grp")
    assert(readsState(aliased, t), s"got ${scanned(aliased)}")
    assert(sorted(aliased) === direct)
    // ORDER BY above the aggregate: the Sort stays, the scan substitutes
    val ordered = spark.sql(q + " ORDER BY grp")
    assert(readsState(ordered, t))
    assert(ordered.collect().map(_.getLong(0)).toSeq ===
      direct.map(_.head.asInstanceOf[Long]).sorted)
  }

  test("a stale MV does not rewrite; refresh re-enables it") {
    val t = mkTable("mvr_stale")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 0, 10), (2, 1, 20)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_sagg AS " +
      s"SELECT grp, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    val q = s"SELECT grp, SUM(amount) AS s FROM $cat.$t GROUP BY grp"
    assert(readsState(spark.sql(q), t), "fresh right after create")
    spark.sql(s"INSERT INTO $cat.$t VALUES (3, 1, 30)")
    val stale = spark.sql(q)
    assert(!readsState(stale, t), "stale MV must not substitute")
    // and the un-rewritten query serves the LATEST data
    assert(sorted(stale) === Seq(Seq(0L, 10L), Seq(1L, 50L)))
    spark.sql(s"CALL $cat.refresh_mv(view => 'mvr_sagg')")
    val fresh = spark.sql(q)
    assert(readsState(fresh, t), "refresh re-enables the rewrite")
    assert(sorted(fresh) === Seq(Seq(0L, 10L), Seq(1L, 50L)))
  }

  test("non-matching shapes and time-travel reads never rewrite") {
    val t = mkTable("mvr_shape")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 0, 10), (2, 1, 20)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_magg AS " +
      s"SELECT grp, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    // extra predicate on a GROUPING column → σ over the state (S39e)
    val filtered = spark.sql(
      s"SELECT grp, SUM(amount) AS s FROM $cat.$t WHERE grp = 1 GROUP BY grp")
    assert(readsState(filtered, t),
      s"group-column predicate must rewrite, got ${scanned(filtered)}")
    assert(sorted(filtered) === Seq(Seq(1L, 20L)))
    // predicate on a NON-grouping column → different semantics → direct
    val nonGroup = spark.sql(
      s"SELECT grp, SUM(amount) AS s FROM $cat.$t WHERE k = 1 GROUP BY grp")
    assert(!readsState(nonGroup, t))
    // different aggregate function
    val other = spark.sql(
      s"SELECT grp, MAX(amount) AS s FROM $cat.$t GROUP BY grp")
    assert(!readsState(other, t))
    // time travel pins a version: history, never the state
    val v = sources.GraftStore.currentVersion(s"$warehouse/$t")
    val tt = spark.sql(s"SELECT grp, SUM(amount) AS s FROM $cat.$t " +
      s"VERSION AS OF $v GROUP BY grp")
    assert(!readsState(tt, t))
  }

  test("a star-join MV rewrites the equivalent join aggregate") {
    val f = mkTable("mvr_fact")
    spark.sql(s"DROP TABLE IF EXISTS $cat.mvr_dim")
    spark.sql(s"""CREATE TABLE $cat.mvr_dim
      (dk BIGINT NOT NULL, nm STRING) USING graft
      TBLPROPERTIES ('merge_key'='dk', 'buckets'='2')""")
    spark.sql(s"INSERT INTO $cat.mvr_dim VALUES (0, 'a'), (1, 'b')")
    spark.sql(s"INSERT INTO $cat.$f VALUES (1, 0, 10), (2, 1, 20), (3, 1, 30)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_star AS " +
      s"SELECT d.nm AS nm, SUM(f.amount) AS s FROM $cat.$f f " +
      s"JOIN $cat.mvr_dim d ON f.grp = d.dk GROUP BY d.nm")
    val q = s"SELECT d.nm AS nm, SUM(f.amount) AS s FROM $cat.$f f " +
      s"JOIN $cat.mvr_dim d ON f.grp = d.dk GROUP BY d.nm"
    val rewritten = spark.sql(q)
    assert(readsState(rewritten, f), s"got ${scanned(rewritten)}")
    val direct = withConf("spark.graft.mv.rewrite.enabled" -> "false") {
      sorted(spark.sql(q))
    }
    assert(sorted(rewritten) === direct)
    // fact DML → stale → no rewrite until refreshed
    spark.sql(s"INSERT INTO $cat.$f VALUES (4, 0, 40)")
    assert(!readsState(spark.sql(q), f))
    spark.sql(s"CALL $cat.refresh_mv(view => 'mvr_star')")
    assert(readsState(spark.sql(q), f))
  }

  test("rollup derivation: coarser grains answer from the finer MV") {
    val t = mkTable("mvr_roll")
    spark.sql(s"INSERT INTO $cat.$t VALUES " +
      "(1, 0, 10), (2, 0, 20), (3, 1, 30), (4, 1, NULL), (5, 2, 50)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_fine AS " +
      s"SELECT grp, k % 2 AS odd, COUNT(*) AS n, SUM(amount) AS s, " +
      s"MIN(amount) AS mn, MAX(amount) AS mx FROM $cat.$t GROUP BY grp, k % 2")
    def check(q: String): Unit = {
      val rolled = spark.sql(q)
      assert(readsState(rolled, t), s"expected rollup for [$q], got ${scanned(rolled)}")
      val direct = withConf("spark.graft.mv.rewrite.enabled" -> "false") {
        sorted(spark.sql(q))
      }
      assert(sorted(rolled) === direct, s"rollup values diverge for [$q]")
    }
    // subset grain: group by grp alone, every derivable aggregate
    check(s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s, MIN(amount) AS mn, " +
      s"MAX(amount) AS mx FROM $cat.$t GROUP BY grp")
    // the other subset: group by the projected expression
    check(s"SELECT k % 2 AS odd, SUM(amount) AS s FROM $cat.$t GROUP BY k % 2")
    // GLOBAL rollup (no grouping at all)
    check(s"SELECT COUNT(*) AS n, SUM(amount) AS s FROM $cat.$t")
    // AVG is not derivable from public columns — runs as written
    val avg = spark.sql(s"SELECT grp, AVG(amount) AS a FROM $cat.$t GROUP BY grp")
    assert(!readsState(avg, t))
    // stale MV: no rollup either
    spark.sql(s"INSERT INTO $cat.$t VALUES (6, 0, 60)")
    assert(!readsState(
      spark.sql(s"SELECT grp, COUNT(*) AS n FROM $cat.$t GROUP BY grp"), t))
    spark.sql(s"CALL $cat.refresh_mv(view => 'mvr_fine')")
    check(s"SELECT grp, COUNT(*) AS n FROM $cat.$t GROUP BY grp")
  }

  test("predicate containment: WHERE on grouping columns filters the state") {
    val t = mkTable("mvr_filt")
    spark.sql(s"INSERT INTO $cat.$t VALUES " +
      "(1, 0, 10), (2, 0, 20), (3, 1, 30), (4, 1, 40), (5, 2, 50)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_filt_mv AS " +
      s"SELECT grp, k % 2 AS odd, COUNT(*) AS n, SUM(amount) AS s " +
      s"FROM $cat.$t GROUP BY grp, k % 2")
    def check(q: String): Unit = {
      val rewritten = spark.sql(q)
      assert(readsState(rewritten, t),
        s"expected filtered rewrite for [$q], got ${scanned(rewritten)}")
      val direct = withConf("spark.graft.mv.rewrite.enabled" -> "false") {
        sorted(spark.sql(q))
      }
      assert(sorted(rewritten) === direct, s"filtered values diverge for [$q]")
    }
    // exact grain + filter on a projected grouping column
    check(s"SELECT grp, k % 2 AS odd, COUNT(*) AS n, SUM(amount) AS s " +
      s"FROM $cat.$t WHERE grp IN (0, 2) GROUP BY grp, k % 2")
    // filter through the grouping EXPRESSION (k % 2 = 1 never sees k)
    check(s"SELECT grp, k % 2 AS odd, SUM(amount) AS s " +
      s"FROM $cat.$t WHERE k % 2 = 1 GROUP BY grp, k % 2")
    // filter + ROLLUP composition: coarser grain over the filtered state
    check(s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s " +
      s"FROM $cat.$t WHERE grp >= 1 GROUP BY grp")
    // filter + GLOBAL rollup
    check(s"SELECT COUNT(*) AS n FROM $cat.$t WHERE grp = 0")
    // a predicate needing the raw k (not a grouping expr) → direct
    val raw = spark.sql(s"SELECT grp, SUM(amount) AS s FROM $cat.$t " +
      s"WHERE k > 2 GROUP BY grp")
    assert(!readsState(raw, t))
    // HAVING (a Filter ABOVE the aggregate) composes for free: the inner
    // aggregate substitutes, the having-filter evaluates over its output
    check(s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s " +
      s"FROM $cat.$t GROUP BY grp HAVING SUM(amount) > 25")
    // WHERE + HAVING together: σ(state) under, HAVING over
    check(s"SELECT grp, SUM(amount) AS s FROM $cat.$t " +
      s"WHERE grp >= 1 GROUP BY grp HAVING COUNT(*) > 1")
    // a filter that empties a group: the group must VANISH, not zero out
    val vanish = spark.sql(s"SELECT grp, COUNT(*) AS n FROM $cat.$t " +
      s"WHERE grp = 7 GROUP BY grp")
    assert(readsState(vanish, t))
    assert(vanish.collect().isEmpty)
    // stale MV: no filtered rewrite either
    spark.sql(s"INSERT INTO $cat.$t VALUES (6, 0, 60)")
    assert(!readsState(spark.sql(s"SELECT grp, SUM(amount) AS s " +
      s"FROM $cat.$t WHERE grp = 0 GROUP BY grp"), t))
  }

  test("AVG rolls up from co-projected SUM(x) and COUNT(x)") {
    val t = mkTable("mvr_avg")
    spark.sql(s"INSERT INTO $cat.$t VALUES " +
      "(1, 0, 10), (2, 0, 20), (3, 1, 30), (4, 1, NULL), (5, 2, NULL)")
    // COUNT(amount) — the non-null operand count AVG needs (COUNT(*)
    // would silently count the NULLs AVG ignores)
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_avg_mv AS " +
      s"SELECT grp, k % 2 AS odd, SUM(amount) AS s, COUNT(amount) AS nn " +
      s"FROM $cat.$t GROUP BY grp, k % 2")
    def check(q: String): Unit = {
      val rolled = spark.sql(q)
      assert(readsState(rolled, t),
        s"expected AVG rollup for [$q], got ${scanned(rolled)}")
      val direct = withConf("spark.graft.mv.rewrite.enabled" -> "false") {
        sorted(spark.sql(q))
      }
      assert(sorted(rolled) === direct, s"AVG rollup diverges for [$q]")
    }
    check(s"SELECT grp, AVG(amount) AS a FROM $cat.$t GROUP BY grp")
    // grp=2 has only a NULL amount: its AVG must be null, not 0/0
    check(s"SELECT grp, AVG(amount) AS a, SUM(amount) AS s FROM $cat.$t " +
      s"GROUP BY grp")
    check(s"SELECT AVG(amount) AS a FROM $cat.$t") // global
    // an MV projecting COUNT(*) instead of COUNT(amount) cannot serve AVG
    spark.sql(s"DROP MATERIALIZED VIEW $cat.mvr_avg_mv")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_avg_mv2 AS " +
      s"SELECT grp, SUM(amount) AS s, COUNT(*) AS n " +
      s"FROM $cat.$t GROUP BY grp, k % 2")
    val star = spark.sql(s"SELECT AVG(amount) AS a FROM $cat.$t")
    assert(!readsState(star, t), "COUNT(*) must not stand in for COUNT(x)")
  }

  test("the candidate listing is cached until an MV create/drop") {
    val t = mkTable("mvr_cachet")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 0, 10), (2, 1, 20)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_cache_mv AS " +
      s"SELECT grp, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    val q = s"SELECT grp, SUM(amount) AS s FROM $cat.$t GROUP BY grp"
    assert(readsState(spark.sql(q), t)) // warm the cache
    val scans0 = GraftCatalog.mvListingScans.get()
    (1 to 5).foreach(_ => assert(readsState(spark.sql(q), t)))
    assert(GraftCatalog.mvListingScans.get() === scans0,
      "steady-state planning must not re-list _mvs/")
    // a create invalidates: the NEW exact-grain MV becomes visible
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_cache_mv2 AS " +
      s"SELECT grp, COUNT(*) AS n FROM $cat.$t GROUP BY grp")
    val q2 = spark.sql(s"SELECT grp, COUNT(*) AS n FROM $cat.$t GROUP BY grp")
    assert(scanned(q2).exists(_.contains("__mv_state_mvr_cache_mv2")),
      s"create must invalidate the listing cache, got ${scanned(q2)}")
    // a drop invalidates: the candidate disappears and the query runs direct
    spark.sql(s"DROP MATERIALIZED VIEW $cat.mvr_cache_mv2")
    assert(!scanned(spark.sql(s"SELECT grp, COUNT(*) AS n FROM $cat.$t " +
      s"GROUP BY grp")).exists(_.contains("__mv_state_mvr_cache_mv2")))
  }

  test("an exact-grain MV wins over a finer MV's rollup") {
    val t = mkTable("mvr_pref")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 0, 10), (2, 0, 20), (3, 1, 30)")
    // alphabetically the FINE one lists first — the preference must not
    // ride the directory order
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_a_fine AS " +
      s"SELECT grp, k % 2 AS odd, COUNT(*) AS n, SUM(amount) AS s " +
      s"FROM $cat.$t GROUP BY grp, k % 2")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_b_exact AS " +
      s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    val q = spark.sql(
      s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    val sc = scanned(q)
    assert(sc.exists(_.contains("__mv_state_mvr_b_exact")),
      s"expected the exact-grain state, got $sc")
    assert(!sc.exists(_.contains("__mv_state_mvr_a_fine")))
    assert(sorted(q) === withConf("spark.graft.mv.rewrite.enabled" -> "false") {
      sorted(spark.sql(s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s " +
        s"FROM $cat.$t GROUP BY grp"))
    })
  }

  test("global rollup of an EMPTY state returns 0 counts, not null") {
    val t = mkTable("mvr_empty")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_eagg AS " +
      s"SELECT grp, COUNT(*) AS n, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    val q = s"SELECT COUNT(*) AS n FROM $cat.$t"
    val rolled = spark.sql(q)
    assert(readsState(rolled, t), s"got ${scanned(rolled)}")
    val row = rolled.collect()
    assert(row.length === 1 && row(0).getLong(0) === 0L,
      "COUNT over the empty rollup must be 0, never null")
  }

  test("the MV machinery never rewrites against its own state") {
    val t = mkTable("mvr_selfref")
    spark.sql(s"INSERT INTO $cat.$t VALUES (1, 0, 10), (2, 1, 20)")
    // a NON-shape body (DISTINCT agg) always recomputes — if the rewrite
    // fired inside that recompute it would read the MV's own stale state
    // and freeze it forever; the inMaintenance guard prevents exactly that
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_self AS " +
      s"SELECT grp, COUNT(DISTINCT amount) AS nd FROM $cat.$t GROUP BY grp")
    spark.sql(s"INSERT INTO $cat.$t VALUES (3, 1, 30), (4, 1, 30)")
    spark.sql(s"CALL $cat.refresh_mv(view => 'mvr_self')")
    assert(sorted(spark.sql(s"SELECT * FROM $cat.mvr_self")) ===
      Seq(Seq(0L, 1L), Seq(1L, 2L)))
    // and a maintainable MV's recompute lane (boundary-poisoned) also
    // stays guarded: RESTORE forces the full lane through the analyzer
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvr_self2 AS " +
      s"SELECT grp, SUM(amount) AS s FROM $cat.$t GROUP BY grp")
    val dir = s"$warehouse/$t"
    val v = sources.GraftStore.currentVersion(dir)
    spark.sql(s"INSERT INTO $cat.$t VALUES (5, 0, 50)")
    spark.sql(s"CALL $cat.restore(table => '$t', version => $v)")
    spark.sql(s"INSERT INTO $cat.$t VALUES (6, 2, 60)")
    val r = spark.sql(s"CALL $cat.refresh_mv(view => 'mvr_self2')").head()
    assert(r.getString(1) === "full")
    assert(sorted(spark.sql(s"SELECT * FROM $cat.mvr_self2")) ===
      Seq(Seq(0L, 10L), Seq(1L, 80L), Seq(2L, 60L)))
  }
}
