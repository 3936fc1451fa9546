package graft.operators

import graft.{GraftQuery, Tables => T}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-profiling / diagnostics operators — the ANALYZE-style passes a
  * 100 TB corpus pipeline runs before and after every transformation batch
  * (column health, co-occurrence structure, value distribution). Reference
  * analogue: the executor's introspection surface (getgenv/gettables walks,
  * env.cpp:159-195) is a "profile everything in scope" pass; here that
  * becomes columnar statistics over the warehouse tables.
  */
object ProfileQueries {

  /** The profiled projection of events shared by d1 and d1_sketch_profile. */
  def profileInput(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(
      col("user_id"), col("event_type"), vcents(col("value")).as("cents"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"))

  /** One-pass sketch-only profile — d1's 100 TB path: per-column
    * n / HLL-distinct / min / max in a SINGLE aggregate with no exact
    * COUNT(DISTINCT), so the plan has no Expand (input rows stay ×1
    * instead of ×4) and map-side partials stay one sketch per column.
    * Shared by the d1_sketch_profile gate (which proves the no-Expand
    * plan and the 5% sketch band) and Bench's d1_sketch_only row (which
    * measures this path alone, the way a 100 TB profile would run). */
  def sketchProfile(ev: DataFrame): DataFrame = {
    val perCol = Seq("user_id", "event_type", "cents", "prop_k").flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        approx_count_distinct(col(c), 0.02).as(s"${c}_approx"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    ev.agg(count(lit(1)).as("n_rows"), perCol: _*)
  }

  val queries: Seq[GraftQuery] = Seq(

    // ----- d1: one-pass multi-column profile over events. One aggregate
    // computes per-column n/nulls/distinct/min/max plus an HLL estimate of
    // each distinct count; the result is then pivoted to one row per
    // column. Exact multi-column COUNT(DISTINCT) goes through Spark's
    // Expand (rows ×4) — the 100 TB path drops the exact counts and keeps
    // the HLL sketches, so the gate also asserts every sketch lands within
    // 5% of its exact count (the same contract as a3/a10). min/max are
    // emitted as strings so heterogeneous column types share one schema.
    GraftQuery("d1_profile", (s, d) => {
      import s.implicits._
      val ev = profileInput(s, d)
      val agg = ev.agg(
        count(lit(1)).as("n_rows"),
        // user_id
        count($"user_id").as("user_id_n"),
        countDistinct($"user_id").as("user_id_distinct"),
        approx_count_distinct($"user_id", 0.02).as("user_id_approx"),
        min($"user_id").cast("string").as("user_id_min"),
        max($"user_id").cast("string").as("user_id_max"),
        // event_type
        count($"event_type").as("event_type_n"),
        countDistinct($"event_type").as("event_type_distinct"),
        approx_count_distinct($"event_type", 0.02).as("event_type_approx"),
        min($"event_type").as("event_type_min"),
        max($"event_type").as("event_type_max"),
        // cents
        count($"cents").as("cents_n"),
        countDistinct($"cents").as("cents_distinct"),
        approx_count_distinct($"cents", 0.02).as("cents_approx"),
        min($"cents").cast("string").as("cents_min"),
        max($"cents").cast("string").as("cents_max"),
        // prop_k (null when props lacks the key — real null fraction)
        count($"prop_k").as("prop_k_n"),
        countDistinct($"prop_k").as("prop_k_distinct"),
        approx_count_distinct($"prop_k", 0.02).as("prop_k_approx"),
        min($"prop_k").cast("string").as("prop_k_min"),
        max($"prop_k").cast("string").as("prop_k_max"))
      val cols = Seq("user_id", "event_type", "cents", "prop_k")
      val perCol = cols.map { c =>
        agg.select(
          lit(c).as("col_name"),
          $"n_rows",
          col(s"${c}_n").as("n_present"),
          ($"n_rows" - col(s"${c}_n")).as("n_null"),
          col(s"${c}_distinct").as("n_distinct"),
          (abs(col(s"${c}_approx") - col(s"${c}_distinct")) * 100 <=
            col(s"${c}_distinct") * 5).as("sketch_ok"),
          col(s"${c}_min").as("min_s"),
          col(s"${c}_max").as("max_s"))
      }.reduce(_ unionAll _)
      perCol.orderBy($"col_name")
    }, Some(s"""
      WITH ev AS (SELECT user_id, event_type,
                    ${sql.vcents("value")} AS cents,
                    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS prop_k
                  FROM events),
      n AS (SELECT COUNT(*) AS n_rows FROM ev)
      SELECT col_name, n_rows, n_present, n_null, n_distinct, TRUE AS sketch_ok, min_s, max_s
      FROM (
        SELECT 'user_id' AS col_name, n.n_rows, COUNT(user_id) AS n_present,
          n.n_rows - COUNT(user_id) AS n_null, COUNT(DISTINCT user_id) AS n_distinct,
          CAST(MIN(user_id) AS VARCHAR) AS min_s, CAST(MAX(user_id) AS VARCHAR) AS max_s
        FROM ev CROSS JOIN n GROUP BY n.n_rows
        UNION ALL
        SELECT 'event_type', n.n_rows, COUNT(event_type),
          n.n_rows - COUNT(event_type), COUNT(DISTINCT event_type),
          MIN(event_type), MAX(event_type)
        FROM ev CROSS JOIN n GROUP BY n.n_rows
        UNION ALL
        SELECT 'cents', n.n_rows, COUNT(cents),
          n.n_rows - COUNT(cents), COUNT(DISTINCT cents),
          CAST(MIN(cents) AS VARCHAR), CAST(MAX(cents) AS VARCHAR)
        FROM ev CROSS JOIN n GROUP BY n.n_rows
        UNION ALL
        SELECT 'prop_k', n.n_rows, COUNT(prop_k),
          n.n_rows - COUNT(prop_k), COUNT(DISTINCT prop_k),
          CAST(MIN(prop_k) AS VARCHAR), CAST(MAX(prop_k) AS VARCHAR)
        FROM ev CROSS JOIN n GROUP BY n.n_rows) t
      ORDER BY col_name""")),

    // ----- d1 (sketch path): the profile as it would actually run at
    // 100 TB — sketchProfile's single no-Expand aggregate. The gate pins
    // two things the bench row alone can't: (a) a plan proof that the
    // sketch path really avoids Expand (lit'd like s8's zero-Exchange
    // booleans), and (b) the 5% HLL band vs exact distincts, where the
    // exacts are computed OUTSIDE the measured path (a separate
    // verification aggregate, collected as one row — at scale you'd run
    // only the sketch side). Oracle recomputes n/nulls/min/max exactly
    // and asserts both booleans TRUE.
    GraftQuery("d1_sketch_profile", (s, d) => {
      import s.implicits._
      val ev = profileInput(s, d)
      val sketch = sketchProfile(ev)
      val noExpand = !sketch.queryExecution.executedPlan.toString.contains("Expand")
      val sk = sketch.head()
      val exact = ev.agg(
        countDistinct($"user_id").as("user_id"),
        countDistinct($"event_type").as("event_type"),
        countDistinct($"cents").as("cents"),
        countDistinct($"prop_k").as("prop_k")).head()
      val nRows = sk.getAs[Long]("n_rows")
      val rows = Seq("user_id", "event_type", "cents", "prop_k").map { c =>
        val n = sk.getAs[Long](s"${c}_n")
        val apx = sk.getAs[Long](s"${c}_approx")
        val ex = exact.getAs[Long](c)
        (c, nRows, n, nRows - n, math.abs(apx - ex) * 100 <= ex * 5, noExpand,
          sk.getAs[String](s"${c}_min"), sk.getAs[String](s"${c}_max"))
      }
      rows.toDF("col_name", "n_rows", "n_present", "n_null",
          "sketch_ok", "no_expand", "min_s", "max_s")
        .orderBy($"col_name")
    }, Some(s"""
      WITH ev AS (SELECT user_id, event_type,
                    ${sql.vcents("value")} AS cents,
                    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS prop_k
                  FROM events),
      n AS (SELECT COUNT(*) AS n_rows FROM ev)
      SELECT col_name, n_rows, n_present, n_null,
             TRUE AS sketch_ok, TRUE AS no_expand, min_s, max_s
      FROM (
        SELECT 'user_id' AS col_name, n.n_rows, COUNT(user_id) AS n_present,
          n.n_rows - COUNT(user_id) AS n_null,
          CAST(MIN(user_id) AS VARCHAR) AS min_s, CAST(MAX(user_id) AS VARCHAR) AS max_s
        FROM ev CROSS JOIN n GROUP BY n.n_rows
        UNION ALL
        SELECT 'event_type', n.n_rows, COUNT(event_type),
          n.n_rows - COUNT(event_type), MIN(event_type), MAX(event_type)
        FROM ev CROSS JOIN n GROUP BY n.n_rows
        UNION ALL
        SELECT 'cents', n.n_rows, COUNT(cents),
          n.n_rows - COUNT(cents),
          CAST(MIN(cents) AS VARCHAR), CAST(MAX(cents) AS VARCHAR)
        FROM ev CROSS JOIN n GROUP BY n.n_rows
        UNION ALL
        SELECT 'prop_k', n.n_rows, COUNT(prop_k),
          n.n_rows - COUNT(prop_k),
          CAST(MIN(prop_k) AS VARCHAR), CAST(MAX(prop_k) AS VARCHAR)
        FROM ev CROSS JOIN n GROUP BY n.n_rows) t
      ORDER BY col_name""")),

    // ----- d2: frequent pairs (market-basket 2-itemsets) over order
    // baskets. Pair generation is the lineitem self-join on l_orderkey —
    // co-partitioned shuffle, and per-basket fan-out is bounded by the
    // basket's line count (<= 7), so the candidate stream is linear in
    // lineitem, never |parts|². Support filter + top-k by (count, pair).
    // This is the a-priori L2 pass; the L1 prune (frequent singletons
    // first) is unnecessary here because the pair stream is already
    // basket-bounded — at 100 TB with deep baskets you'd broadcast the
    // frequent-singleton set and semi-join both sides before pairing.
    GraftQuery("d2_frequent_pairs", (s, d) => {
      import s.implicits._
      GraphQueries.coOccurrencePairs(T.lineitem(s, d))
        .select($"u".as("p1"), $"v".as("p2"), $"n_orders")
        .filter($"n_orders" >= 2)
        .orderBy($"n_orders".desc, $"p1", $"p2").limit(50)
    }, Some("""
      WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ORDER BY n_orders DESC, p1, p2 LIMIT 50""")),

    // ----- d3: equi-depth histogram of lineitem price cents — the
    // optimizer/statistics primitive (equi-depth buckets are what engines
    // keep for selectivity estimation). NOT a global window: rows get a
    // global rank via the two-pass SkewUtils.rangedRowNumber (sample range
    // boundaries → per-range local ranks + offsets); the bucket assignment
    // then reproduces NTILE's exact tie-free contract — the first
    // (n mod k) buckets take ceil(n/k) rows, the rest floor(n/k) — so the
    // DuckDB NTILE mirror over the identical unique order assigns
    // bit-identical buckets and the edges/counts hash-match.
    GraftQuery("d3_equidepth_histogram", (s, d) => {
      import s.implicits._
      val k = 8
      val rows = T.lineitem(s, d).select(
        round($"l_extendedprice" * 100).cast("long").as("cents"),
        $"l_orderkey", $"l_linenumber")
      val total = rows.count() // one cheap pre-pass over the scan
      val ranked = SkewUtils.rangedRowNumber(rows, Seq.empty,
        Seq("cents", "l_orderkey", "l_linenumber"), 32, "rank")
      // NTILE's exact contract: first (n mod k) buckets take ceil(n/k).
      // When n < k every row is its own bucket (rank-1) — the clamped-q
      // formula would wrongly double rows up
      val bucketExpr =
        if (total < k) "rank - 1"
        else {
          val q = total / k
          val m = total % k
          s"CASE WHEN rank <= ${m * (q + 1)} THEN (rank - 1) div ${q + 1} " +
            s"ELSE $m + (rank - 1 - ${m * (q + 1)}) div $q END"
        }
      ranked
        .withColumn("bucket", expr(bucketExpr).cast("long"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_rows"), min($"cents").as("lo"), max($"cents").as("hi"))
        .orderBy($"bucket")
    }, Some("""
      WITH r AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                   NTILE(8) OVER (ORDER BY round(l_extendedprice * 100),
                                  l_orderkey, l_linenumber) - 1 AS bucket
                 FROM lineitem)
      SELECT bucket, COUNT(*) AS n_rows, MIN(cents) AS lo, MAX(cents) AS hi
      FROM r GROUP BY bucket ORDER BY bucket""")),

    // ----- d4: join-cardinality estimation via Count-Min inner product
    // (Cormode & Muthukrishnan '05 §4.2) — the optimizer pass that prices
    // a join WITHOUT running it. Target: the o_custkey self-join of
    // orders, whose true size is Σ_c n_c² (exact companion computed
    // in-query; the FK joins an optimizer usually faces are the same
    // estimate with two different sketches). The sketch is built as plain
    // dataframes — explode each row into its 4 (depth, bucket) cells,
    // partial+final count per cell (4·W cells total, shuffle bounded by
    // the sketch not the data), est = min over depths of Σ_b cnt². The
    // two oracle-asserted invariants are the CMS contract: sound
    // (Σ(Σa_k)² >= Σa_k² termwise, so every depth over-estimates and so
    // does the min) and tight w.h.p. (excess ≤ 4·N²/W for the min of 4
    // independent depths; W=65536 puts that at ~0.9× exact here). The
    // estimate itself is hash-dependent so only its bounds are gated.
    GraftQuery("d4_join_cardinality", (s, d) => {
      import s.implicits._
      val W = 65536
      val keys = T.orders(s, d).select($"o_custkey".as("k"))
      val exact = keys.groupBy($"k").agg(count(lit(1)).as("n"))
        .agg(sum($"n" * $"n").as("exact_pairs"))
      val cells = keys.select(explode(expr(
        s"transform(sequence(0, 3), j -> struct(j AS depth, pmod(xxhash64(k, j), $W) AS bucket))"))
        .as("c"))
        .groupBy($"c.depth", $"c.bucket").agg(count(lit(1)).as("cnt"))
      val est = cells.groupBy($"depth").agg(sum($"cnt" * $"cnt").as("ip"))
        .agg(min($"ip").as("est"))
      val n = keys.count()
      est.crossJoin(exact).select(
        $"exact_pairs",
        ($"est" >= $"exact_pairs").as("sound"),
        (($"est" - $"exact_pairs") * W <= lit(4L) * n * n).as("tight"))
    }, Some("""
      SELECT CAST(SUM(n * n) AS BIGINT) AS exact_pairs,
        TRUE AS sound, TRUE AS tight
      FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_custkey) t""")),

    // ----- d5: join-key skew report — the diagnostic that decides whether
    // a key needs SkewUtils treatment (salting, ranged windows, AQE skew
    // hints) BEFORE the join runs: per candidate key column, group-size
    // max vs mean in integer ppm. Two hash aggs per column (groupBy key →
    // agg over the bounded group-size table); the row stream is scanned
    // once per column and nothing wider than (key, count) ever shuffles.
    GraftQuery("d5_skew_report", (s, d) => {
      import s.implicits._
      def stats(c: String) = {
        val g = T.lineitem(s, d).groupBy(col(c).as("k"))
          .agg(count(lit(1)).as("n"))
        g.agg(
          lit(c).as("key_col"),
          sum($"n").as("n_rows"),
          count(lit(1)).as("n_keys"),
          max($"n").as("max_n"))
          .select($"key_col", $"n_rows", $"n_keys", $"max_n",
            expr("(1000 * n_rows) div n_keys").as("mean_milli"),
            expr("(1000000 * max_n * n_keys) div n_rows").as("skew_ppm"))
      }
      Seq("l_orderkey", "l_partkey", "l_suppkey").map(stats)
        .reduce(_ unionAll _).orderBy($"key_col")
    }, Some("""
      SELECT key_col, n_rows, n_keys, max_n,
        (1000 * n_rows) // n_keys AS mean_milli,
        (1000000 * max_n * n_keys) // n_rows AS skew_ppm
      FROM (
        SELECT 'l_orderkey' AS key_col, CAST(SUM(n) AS BIGINT) AS n_rows,
          COUNT(*) AS n_keys, CAST(MAX(n) AS BIGINT) AS max_n
        FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey) g1
        UNION ALL
        SELECT 'l_partkey', CAST(SUM(n) AS BIGINT), COUNT(*), CAST(MAX(n) AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_partkey) g2
        UNION ALL
        SELECT 'l_suppkey', CAST(SUM(n) AS BIGINT), COUNT(*), CAST(MAX(n) AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_suppkey) g3) t
      ORDER BY key_col""")),

    // ----- D6: declarative data-quality expectations — validate a batch
    // against named constraints and emit exact violation counts (the
    // promote/quarantine decision input). The fixture poisons lineitem
    // deterministically so every check class has a closed-form non-zero
    // answer: nulled return flags (%97 orders), out-of-range quantities
    // (%89), negated part keys breaking the FK (%83), and duplicated
    // (%101) order lines breaking the (orderkey, linenumber) key; the
    // in_set check is the passing case (zero violations is information
    // too). Plan shape under test: the four row-level checks share ONE
    // scan (single conditional-sum aggregate), unique is one key
    // aggregation, ref-integrity one anti-join vs the distinct dimension
    // keys — the same three jobs it would be at 100 TB.
    GraftQuery("d6_dq_expectations", (s, d) => {
      import s.implicits._
      import QualityChecks.Check._
      val base = T.lineitem(s, d)
        .select($"l_orderkey", $"l_partkey", $"l_linenumber",
          $"l_quantity", $"l_returnflag", $"l_linestatus")
        .withColumn("l_returnflag",
          when($"l_orderkey" % 97 === 0, lit(null)).otherwise($"l_returnflag"))
        .withColumn("l_quantity",
          when($"l_orderkey" % 89 === 0, $"l_quantity" + 100).otherwise($"l_quantity"))
        .withColumn("l_partkey",
          when($"l_orderkey" % 83 === 0, -$"l_partkey").otherwise($"l_partkey"))
      val poisoned = base.unionAll(base.filter($"l_orderkey" % 101 === 0))
      QualityChecks.validate(poisoned, Seq(
        NotNull("l_returnflag"),
        InRange("l_quantity", 1, 50),
        InSet("l_linestatus", Seq("O", "F")),
        Unique(Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("l_partkey", T.part(s, d), "p_partkey")))
        .withColumn("n_rows", lit(poisoned.count()))
        .orderBy($"check")
    }, Some("""
      WITH base AS (
        SELECT l_orderkey,
          CASE WHEN l_orderkey % 83 = 0 THEN -l_partkey ELSE l_partkey END AS l_partkey,
          l_linenumber,
          CASE WHEN l_orderkey % 89 = 0 THEN l_quantity + 100 ELSE l_quantity END AS l_quantity,
          CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_returnflag END AS l_returnflag,
          l_linestatus
        FROM lineitem),
      poisoned AS (SELECT * FROM base
                   UNION ALL SELECT * FROM base WHERE l_orderkey % 101 = 0),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM poisoned),
      checks AS (
        SELECT 'not_null(l_returnflag)' AS check,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM poisoned WHERE l_returnflag IS NULL)
            AS violations
        UNION ALL
        SELECT 'in_range(l_quantity,1.0,50.0)',
          (SELECT CAST(COUNT(*) AS BIGINT) FROM poisoned
           WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50))
        UNION ALL
        SELECT 'in_set(l_linestatus)',
          (SELECT CAST(COUNT(*) AS BIGINT) FROM poisoned
           WHERE l_linestatus IS NOT NULL AND l_linestatus NOT IN ('O', 'F'))
        UNION ALL
        SELECT 'unique(l_orderkey,l_linenumber)',
          (SELECT COALESCE(CAST(SUM(cnt - 1) AS BIGINT), 0) FROM
            (SELECT COUNT(*) AS cnt FROM poisoned
             GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1) g)
        UNION ALL
        SELECT 'ref(l_partkey)',
          (SELECT CAST(COUNT(*) AS BIGINT) FROM poisoned p
           WHERE p.l_partkey IS NOT NULL AND NOT EXISTS
             (SELECT 1 FROM part WHERE p_partkey = p.l_partkey)))
      SELECT c.check, c.violations, c.violations = 0 AS pass, n.n_rows
      FROM checks c CROSS JOIN n
      ORDER BY c.check"""))
  )
}
