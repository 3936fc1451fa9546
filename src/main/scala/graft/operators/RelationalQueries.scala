package graft.operators

import graft.{Det, GraftQuery, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.2 core relational inventory: P1–P7, J1–J5, A1–A4, W1.
  *
  * Everything here is declarative DataFrame API — Catalyst handles pushdown,
  * pruning and join selection; tiny dimensions are broadcast explicitly where
  * the star shape makes that the right plan at 100 TB (region/nation/supplier
  * stay small while lineitem scales).
  */
object RelationalQueries {
  import Det._

  /** Dialect-identical LATERAL top-n text shared by j11's Spark run and
    * its DuckDB oracle (the TpchShapes same-text contract). */
  val lateralTopnSql: String = """
    SELECT c.c_custkey, l.o_orderkey, l.price
    FROM customer c, LATERAL (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, price DESC, o_orderkey"""

  val queries: Seq[GraftQuery] = Seq(

    // ----- q1: TPC-H Q1-shaped pricing summary (P1 P2 A1 P4; the M1 slice)
    GraftQuery("q1_pricing_summary", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val disc = discPrice($"l_extendedprice", $"l_discount")
      val charge = disc * (one + dec($"l_tax"))
      li.filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          moneySum($"l_extendedprice").as("sum_base_price"),
          sum(disc).cast(DoubleType).as("sum_disc_price"),
          sum(charge).cast(DoubleType).as("sum_charge"),
          (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
          (moneySum($"l_extendedprice") / count(lit(1))).as("avg_price"),
          (moneySum($"l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        ${sql.moneySum("l_extendedprice")} AS sum_base_price,
        CAST(SUM(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(${sql.discPrice("l_extendedprice", "l_discount")} * (1 + ${sql.dec("l_tax")})) AS DOUBLE) AS sum_charge,
        SUM(l_quantity) / COUNT(*) AS avg_qty,
        ${sql.moneySum("l_extendedprice")} / COUNT(*) AS avg_price,
        ${sql.moneySum("l_discount")} / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), bench = true),

    // ----- P1: projection, per-row arithmetic, aliasing
    GraftQuery("p1_projection", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select(
          $"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("disc_price"),
          concat($"l_returnflag", lit("/"), $"l_linestatus").as("flag_status"),
          ($"l_quantity" + lit(5)).as("qty_plus5"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1.0 - l_discount) AS disc_price,
        l_returnflag || '/' || l_linestatus AS flag_status,
        l_quantity + 5 AS qty_plus5
      FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ----- P2: complex predicate (AND/OR/IN/BETWEEN/LIKE/IS NULL)
    GraftQuery("p2_filter_complex", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .filter(
          ($"o_orderstatus".isin("F", "P") &&
            $"o_totalprice".between(10000, 150000) &&
            $"o_orderpriority".like("%HIGH%")) ||
          $"o_orderpriority".isNull ||
          ($"o_orderstatus" === "O" && $"o_totalprice" < 2000))
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE (o_orderstatus IN ('F','P') AND o_totalprice BETWEEN 10000 AND 150000
             AND o_orderpriority LIKE '%HIGH%')
         OR o_orderpriority IS NULL
         OR (o_orderstatus = 'O' AND o_totalprice < 2000)
      ORDER BY o_orderkey""")),

    // ----- P3: distinct
    GraftQuery("p3_distinct", (s, d) => {
      import s.implicits._
      T.customer(s, d)
        .select($"c_mktsegment", $"c_nationkey").distinct()
        .orderBy($"c_mktsegment", $"c_nationkey")
    }, Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      ORDER BY c_mktsegment, c_nationkey""")),

    // ----- P4: multi-key sort with explicit null placement
    GraftQuery("p4_sort_multi", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .withColumn("status_or_null", expr("nullif(o_orderstatus, 'O')"))
        .select($"o_orderkey", $"status_or_null", $"o_totalprice")
        .orderBy($"status_or_null".asc_nulls_first, $"o_totalprice".desc, $"o_orderkey".asc)
    }, Some("""
      SELECT o_orderkey, nullif(o_orderstatus,'O') AS status_or_null, o_totalprice
      FROM orders
      ORDER BY status_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC""")),

    // ----- P5: top-k
    GraftQuery("p5_topk", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ----- P6: union all / union distinct / intersect / except
    GraftQuery("p6_setops", (s, d) => {
      import s.implicits._
      val c = T.customer(s, d)
      val a = c.filter($"c_acctbal" > 5000).select($"c_custkey")
      val b = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val u  = a.union(b).select(lit("union_all").as("tag"), $"c_custkey")
      val ud = a.union(b).distinct().select(lit("union_distinct").as("tag"), $"c_custkey")
      val i  = a.intersect(b).select(lit("intersect").as("tag"), $"c_custkey")
      val e  = a.except(b).select(lit("except").as("tag"), $"c_custkey")
      u.union(ud).union(i).union(e).orderBy($"tag", $"c_custkey")
    }, Some("""
      WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
           b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT 'union_all' AS tag, c_custkey FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
      UNION ALL SELECT 'union_distinct', c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
      UNION ALL SELECT 'intersect', c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      UNION ALL SELECT 'except', c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      ORDER BY tag, c_custkey""")),

    // ----- P7: deterministic key-sampled aggregate (df.sample is seeded
    // differently per engine, so the oracle-checked variant samples by key)
    GraftQuery("p7_sample_det", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter(pmod($"l_orderkey", lit(10)) === 0)
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity").as("sum_qty"),
          moneySum($"l_extendedprice").as("sum_price"))
    }, Some(s"""
      SELECT COUNT(*) AS n, SUM(l_quantity) AS sum_qty,
        ${sql.moneySum("l_extendedprice")} AS sum_price
      FROM lineitem WHERE l_orderkey % 10 = 0""")),

    // ----- P7b: deterministic stratified sample — N rows per stratum,
    // selected by hash order (reproducible across engines and runs, unlike
    // RNG sampleBy; the hash makes the pick pseudo-random but stable)
    GraftQuery("p7_stratified_sample", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type")
        .orderBy(md5($"event_id".cast(StringType)), $"event_id")
      T.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 20)
        .select($"event_type", $"event_id")
        .orderBy($"event_type", $"event_id")
    }, Some("""
      SELECT event_type, event_id
      FROM (SELECT event_type, event_id,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
            FROM events) t
      WHERE rn <= 20 ORDER BY event_type, event_id""")),

    // Bernoulli sample: the draw is engine-seeded so the exact count can't
    // be mirrored, but the sampler's contract can — the sample size of a
    // p=0.1 Bernoulli over N rows is Binomial(N, p), so the oracle asserts
    // |n - Np| <= 6*sqrt(Np(1-p)) (probability of a false failure < 1e-9).
    GraftQuery("p7_sample_rand", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val total = li.agg(count(lit(1)).cast(DoubleType).as("total"))
      li.sample(withReplacement = false, 0.1, 42L)
        .agg(count(lit(1)).cast(DoubleType).as("n"))
        .crossJoin(total)
        .select(
          (abs($"n" - $"total" * 0.1) <= sqrt($"total" * 0.1 * 0.9) * 6)
            .as("binomial_ok"))
    }, Some("SELECT TRUE AS binomial_ok")),

    // ----- J1: equi join + aggregate (TPC-H Q3 shape)
    GraftQuery("j1_join_topk", (s, d) => {
      import s.implicits._
      val cut = lit("1996-03-15").cast(TimestampType)
      val c = T.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val o = T.orders(s, d).filter($"o_orderdate" < cut)
      val l = T.lineitem(s, d).filter($"l_shipdate" > cut)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast(DoubleType).as("revenue"))
        .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"), $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }, Some(s"""
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        CAST(SUM(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""), bench = true),

    // ----- J2: left outer join with per-key aggregate
    GraftQuery("j2_left_outer", (s, d) => {
      import s.implicits._
      // aggregate below the join: orders collapses to one row per custkey
      // before joining, so the outer join's build side shrinks by the
      // orders-per-customer factor — the right shape at fact-table scale
      val c = T.customer(s, d)
      val oAgg = T.orders(s, d).groupBy($"o_custkey")
        .agg(count($"o_orderkey").as("n_orders0"), moneySum($"o_totalprice").as("spend0"))
      c.join(oAgg, $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey",
          coalesce($"n_orders0", lit(0L)).as("n_orders"),
          coalesce($"spend0", lit(0.0)).as("total_spend"))
        .orderBy($"c_custkey")
    }, Some(s"""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(${sql.moneySum("o_totalprice")}, 0.0) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    // ----- J2b: full outer join
    GraftQuery("j2_full_outer", (s, d) => {
      import s.implicits._
      val n = T.nation(s, d)
      val cc = T.customer(s, d).groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      n.join(cc, $"n_nationkey" === $"c_nationkey", "full")
        .select(
          coalesce($"n_nationkey", $"c_nationkey").as("nk"),
          $"n_name",
          coalesce($"n_cust", lit(0L)).as("n_cust"))
        .orderBy($"nk")
    }, Some("""
      SELECT COALESCE(n_nationkey, c_nationkey) AS nk, n_name,
        COALESCE(n_cust, 0) AS n_cust
      FROM nation FULL JOIN
        (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cc
        ON n_nationkey = c_nationkey
      ORDER BY nk""")),

    // ----- J3: left semi / left anti (EXISTS / NOT EXISTS)
    GraftQuery("j3_semi_anti", (s, d) => {
      import s.implicits._
      val c = T.customer(s, d)
      val o = T.orders(s, d)
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(lit("with_orders").as("tag"), $"c_custkey")
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(lit("no_orders").as("tag"), $"c_custkey")
      semi.union(anti).orderBy($"tag", $"c_custkey")
    }, Some("""
      SELECT 'with_orders' AS tag, c_custkey FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT 'no_orders', c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY tag, c_custkey""")),

    // ----- J4: star join, dimensions broadcast (the 100 TB plan: fact
    // scales, dims don't — broadcast avoids shuffling the fact table twice)
    GraftQuery("j4_broadcast_star", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(broadcast(T.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    }, Some(s"""
      SELECT r_name, n_name,
        CAST(SUM(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""), bench = true),

    // ----- J4b: the full TPC-H Q5 shape — six relations, the
    // customer-and-supplier-share-a-nation equality that forces the
    // optimizer to pick a join order through two paths to nation
    GraftQuery("q5_local_supplier", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(T.supplier(s, d)), $"l_suppkey" === $"s_suppkey" &&
          $"c_nationkey" === $"s_nationkey")
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-01-01").cast(TimestampType))
        .groupBy($"n_name")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    }, Some(s"""
      SELECT n_name,
        CAST(SUM(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY n_name"""), bench = true),

    // ----- J5: theta/band join (acctbal within 100 of a richer supplier).
    // The naive form (`a_bal < b_bal && b_bal - a_bal < 100`) is a pure
    // theta join Spark can only run as a broadcast-nested-loop — quadratic
    // when both sides are fact tables. SkewUtils.bandJoin buckets each value
    // into floor(v/width) cells, explodes the left side to its three
    // candidate cells, and equi-joins on the cell id before re-applying the
    // exact predicate — identical result, one well-distributed shuffle.
    // The oracle runs the naive inequality form; a no-BNLJ plan guard plus
    // a naive-equivalence check live in PipelineSpec (the j9 treatment).
    GraftQuery("j5_band_join", (s, d) => {
      import s.implicits._
      val s1 = T.supplier(s, d).select($"s_suppkey".as("a_key"), $"s_acctbal".as("a_bal"))
      val s2 = T.supplier(s, d).select($"s_suppkey".as("b_key"), $"s_acctbal".as("b_bal"))
      SkewUtils.bandJoin(s1, "a_bal", s2, "b_bal", 100.0)
        .select($"a_key", $"b_key")
        .orderBy($"a_key", $"b_key")
    }, Some("""
      SELECT s1.s_suppkey AS a_key, s2.s_suppkey AS b_key
      FROM supplier s1 JOIN supplier s2
        ON s1.s_acctbal < s2.s_acctbal AND s2.s_acctbal - s1.s_acctbal < 100
      ORDER BY a_key, b_key""")),

    // ----- J9: point-in-interval join — lineitems shipped inside each
    // urgent order's first week. The naive form (`l_shipdate BETWEEN
    // o_orderdate AND o_orderdate + 7d`) is a theta join Spark executes as
    // a broadcast-nested-loop — quadratic when both sides are fact tables.
    // SkewUtils.pointInIntervalJoin decomposes time into week buckets and
    // equi-joins on the bucket id (interval side explodes ×2, exact
    // predicate re-applied), so both sides shuffle once on a
    // well-distributed key. The oracle runs the naive inequality form;
    // results are identical.
    // The order set is scoped to one quarter: an interval join's true
    // cardinality is |points in window| × |overlapping intervals|, so an
    // unscoped year-spanning probe would measure output volume (~50M pairs
    // at sf0.1), not the join machinery.
    GraftQuery("j9_interval_join", (s, d) => {
      import s.implicits._
      val urgent = T.orders(s, d)
        .filter($"o_orderpriority" === "1-URGENT" &&
          $"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1996-04-01").cast(TimestampType))
        .select($"o_orderkey", $"o_orderdate".as("__start"),
          ($"o_orderdate" + expr("INTERVAL 7 DAYS")).as("__end"))
      val points = T.lineitem(s, d).select($"l_shipdate", $"l_quantity")
      SkewUtils.pointInIntervalJoin(points, "l_shipdate", urgent,
          "__start", "__end", 7L * 86400)
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_shipped"),
          sum(dec($"l_quantity")).cast(DoubleType).as("sum_qty"))
        .orderBy($"o_orderkey")
    }, Some(s"""
      SELECT o_orderkey, COUNT(*) AS n_shipped,
        CAST(SUM(${sql.dec("l_quantity")}) AS DOUBLE) AS sum_qty
      FROM orders JOIN lineitem
        ON l_shipdate >= o_orderdate
        AND l_shipdate < o_orderdate + INTERVAL 7 DAY
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY o_orderkey ORDER BY o_orderkey"""), bench = true),

    // ----- A10: mergeable-sketch rollup — the 100 TB distinct-count
    // pattern: HLL sketches aggregate once per fine group (nation), then
    // roll up to coarse groups (region) by sketch UNION, never rescanning
    // the fact table. At scale this is the only way to serve distinct
    // counts at multiple granularities from one pass. The gate emits the
    // exact distinct count (cross-checkable: custkeys are unique, so
    // per-nation distincts sum to per-region) plus a boolean binding the
    // merged sketch estimate within 5% of exact.
    GraftQuery("a10_sketch_merge", (s, d) => {
      import s.implicits._
      val perNation = T.customer(s, d)
        .join(broadcast(T.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_regionkey", $"n_nationkey")
        .agg(hll_sketch_agg($"c_custkey").as("sk"),
          countDistinct($"c_custkey").as("nd"))
      perNation.groupBy($"n_regionkey")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
          sum($"nd").as("n_exact"))
        .select($"n_regionkey", $"n_exact",
          (abs($"est" - $"n_exact").cast(DoubleType) / $"n_exact" <= 0.05).as("merge_ok"))
        .orderBy($"n_regionkey")
    }, Some("""
      SELECT n_regionkey, COUNT(DISTINCT c_custkey) AS n_exact, TRUE AS merge_ok
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ----- A12: mergeable QUANTILE sketch rollup (DDSketch-style,
    // Masson et al. 2019) — the quantile companion of A10's HLL rollup.
    // Values land in log-scale bins (bin = floor(ln x / ln γ), γ=1.02 →
    // ≤1% relative error by construction), and the "sketch" is nothing
    // but RELATIONAL ROWS of (scope, bin, count): the Spark-first move is
    // that bin-wise ADDITION is the sketch merge, so rolling per-type
    // sketches up to the global one is a plain groupBy-sum — codegen'd,
    // map-side-combined, no UDAF, no binary blobs, mergeable across any
    // granularity or time range for free. Quantile extraction walks the
    // cumulative bin counts (bounded: ≤~1.2k bins per scope, the d3
    // bounded-window pattern). The driver-checkable contract is the
    // INVARIANT, not the float: the estimate must sit within the γ-bound
    // of the EXACT order statistic at rank ceil(q·n) — exacts computed
    // distributed via the two-pass SkewUtils.rangedRowNumber (keyed for
    // per-type, global for ALL) and recomputed independently by the
    // oracle; integer ceil-div rank arithmetic is shared bit-for-bit.
    GraftQuery("a12_ddsketch_rollup", (s, d) => {
      import s.implicits._
      val gamma = 1.02
      val relBound = (gamma - 1) / 2 * 1.05 // + slack for ln boundary ulps
      val ev = T.events(s, d)
        .select($"event_type", vcents($"value").as("cents"), $"event_id")
        .filter($"cents" > 0)
      val binned = ev.withColumn("bin",
        floor(log($"cents".cast(DoubleType)) / math.log(gamma)).cast(LongType))
      val typeSketch = binned.groupBy($"event_type", $"bin")
        .agg(count(lit(1)).as("c"))
      val allSketch = typeSketch.groupBy($"bin") // the MERGE: bin-wise add
        .agg(sum($"c").as("c")).withColumn("event_type", lit("ALL"))
      val sketches = typeSketch.unionByName(allSketch.select($"event_type", $"bin", $"c"))
      val ranks = sketches.groupBy($"event_type").agg(sum($"c").as("n"))
        .withColumn("q", explode(array(lit(50L), lit(95L), lit(99L))))
        .withColumn("rank", expr("(n * q + 99) div 100"))
      val cum = sketches.withColumn("cum", sum($"c").over(
        Window.partitionBy($"event_type").orderBy($"bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val est = cum.join(ranks, Seq("event_type"))
        .filter($"cum" >= $"rank")
        .groupBy($"event_type", $"q", $"rank", $"n").agg(min($"bin").as("ebin"))
        .withColumn("est", pow(lit(gamma), $"ebin") * ((1 + gamma) / 2))
      val rankedTyped = SkewUtils.rangedRowNumber(
        ev, Seq("event_type"), Seq("cents", "event_id"), 32, "rn")
      val rankedAll = SkewUtils.rangedRowNumber(
        ev.drop("event_type"), Seq.empty, Seq("cents", "event_id"), 32, "rn")
        .withColumn("event_type", lit("ALL"))
      val exact = rankedTyped.select($"event_type", $"cents", $"rn")
        .unionByName(rankedAll.select($"event_type", $"cents", $"rn"))
        .join(ranks.select($"event_type", $"q", $"rank"), Seq("event_type"))
        .filter($"rn" === $"rank")
        .select($"event_type", $"q", $"cents".as("exact_cents"))
      est.join(exact, Seq("event_type", "q"))
        .select($"event_type".as("scope"), concat(lit("p"), $"q").as("q_label"),
          $"n", $"rank", $"exact_cents",
          (abs($"est" - $"exact_cents") <= $"exact_cents" * relBound)
            .as("within_gamma_bound"))
        .orderBy($"scope", $"q_label")
    }, Some(s"""
      WITH e AS (SELECT event_type, ${sql.vcents("value")} AS cents, event_id
                 FROM events WHERE ${sql.vcents("value")} > 0),
      a AS (SELECT event_type, cents, event_id FROM e
            UNION ALL SELECT 'ALL', cents, event_id FROM e),
      t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY event_type),
      r AS (SELECT event_type, n, q, (n * q + 99) // 100 AS rank
            FROM t CROSS JOIN (VALUES (CAST(50 AS BIGINT)), (CAST(95 AS BIGINT)),
              (CAST(99 AS BIGINT))) qs(q)),
      o AS (SELECT event_type, cents,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn
            FROM a)
      SELECT r.event_type AS scope, 'p' || q AS q_label, n, rank,
        o.cents AS exact_cents, TRUE AS within_gamma_bound
      FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rank
      ORDER BY scope, q_label""")),

    // ----- composite: conditional aggregation (TPC-H Q12 shape) — CASE
    // inside SUM, one pass over the join
    GraftQuery("q12_conditional_agg", (s, d) => {
      import s.implicits._
      val l = T.lineitem(s, d).filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType))
      l.join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----- A11: heavy hitters via Count-Min sketch — the one-pass frequency
    // estimator that replaces exact groupBy counting when the key space is
    // unbounded (at 100 TB the sketch is a fixed-size mergeable aggregate;
    // the exact companion here exists only to emit the invariant booleans:
    // CMS never under-estimates, and with eps=0.001/seed=42 the
    // over-estimate stays within 10·eps·N). The estimate step probes the
    // sketch through the native CountMinEstimate expression over the 10
    // result rows — post-aggregation, never in the scan path.
    GraftQuery("a11_heavy_hitters", (s, d) => {
      import s.implicits._
      val terms = T.documents(s, d)
        .select(explode(split(trim($"text"), " ")).as("term"))
      val exact = terms.groupBy($"term").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"term").limit(10)
      val sk = terms.agg(
        expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_total"))
      exact.crossJoin(broadcast(sk))
        // native codegen'd probe (CountMinEstimate); the per-thread sketch
        // cache in CmsProbe deserializes once per task, not once per row
        .withColumn("__est",
          graft.functions.GraftFunctions.count_min_estimate($"sk", $"term"))
        .select($"term", $"freq",
          ($"__est" >= $"freq").as("no_underestimate"),
          ($"__est" <= $"freq" + ceil($"n_total" * 0.01)).as("bounded_overestimate"))
        .orderBy($"freq".desc, $"term")
    }, Some("""
      WITH t AS (SELECT unnest(str_split(trim(text), ' ')) AS term FROM documents),
      f AS (SELECT term, COUNT(*) AS freq FROM t
            GROUP BY term ORDER BY freq DESC, term LIMIT 10)
      SELECT term, CAST(freq AS BIGINT) AS freq,
        TRUE AS no_underestimate, TRUE AS bounded_overestimate
      FROM f ORDER BY freq DESC, term""")),

    // ----- composite: shipping-priority revenue (TPC-H Q3 shape) — segment
    // filter below the join, both date filters pushed to the scans, top-10
    // by exact-decimal revenue (cast to double only at the end)
    GraftQuery("q3_shipping_priority", (s, d) => {
      import s.implicits._
      val cutoff = lit("1998-06-30").cast(TimestampType)
      val cust = T.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val o = T.orders(s, d).filter($"o_orderdate" < cutoff)
      val l = T.lineitem(s, d).filter($"l_shipdate" > cutoff)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast(DoubleType).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", tsFmt($"o_orderdate").as("order_date"), $"revenue")
    }, Some(s"""
      SELECT o_orderkey, ${sql.tsFmt("o_orderdate")} AS order_date,
        CAST(SUM(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ----- composite: large-volume orders (TPC-H Q18 shape) — an
    // aggregate-derived key set (orders whose total quantity clears a
    // threshold) semi-joined back into the fact/dim chain. The key set is
    // produced by a partial+final aggregate and AQE decides whether it
    // broadcasts; no correlated subquery survives the plan.
    GraftQuery("q18_large_orders", (s, d) => {
      import s.implicits._
      val l = T.lineitem(s, d)
      val bigKeys = l.groupBy($"l_orderkey")
        .agg(sum(dec($"l_quantity")).as("q"))
        .filter($"q" > 150)
        .select($"l_orderkey".as("__k"))
      l.join(bigKeys, $"l_orderkey" === $"__k", "left_semi")
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name", $"o_orderkey",
          $"o_orderdate", $"o_totalprice")
        .agg(sum(dec($"l_quantity")).cast(DoubleType).as("total_qty"))
        .select($"c_custkey", $"c_name", $"o_orderkey",
          tsFmt($"o_orderdate").as("order_date"),
          dec($"o_totalprice").cast(DoubleType).as("total_price"), $"total_qty")
        .orderBy($"total_price".desc, $"o_orderkey")
        .limit(100)
    }, Some(s"""
      SELECT c_custkey, c_name, o_orderkey, ${sql.tsFmt("o_orderdate")} AS order_date,
        CAST(${sql.dec("o_totalprice")} AS DOUBLE) AS total_price,
        CAST(SUM(${sql.dec("l_quantity")}) AS DOUBLE) AS total_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(${sql.dec("l_quantity")}) > 150)
      GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      ORDER BY total_price DESC, o_orderkey LIMIT 100""")),

    // ----- composite: revenue ranking per customer (TPC-H Q10 shape)
    GraftQuery("q10_revenue_ranking", (s, d) => {
      import s.implicits._
      val l = T.lineitem(s, d).filter($"l_returnflag" === "R")
      val o = T.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1997-01-01").cast(TimestampType))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(T.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast(DoubleType).as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }, Some(s"""
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""), bench = true),

    // ----- A1: count distinct (exact) + grouped sums
    GraftQuery("a1_count_distinct", (s, d) => {
      import s.implicits._
      T.events(s, d).groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"),
          count(lit(1)).as("n_events"),
          sum(vcents($"value")).as("sum_cents"))
        .orderBy($"event_type")
    }, Some(s"""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
        CAST(SUM(${sql.vcents("value")}) AS BIGINT) AS sum_cents
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ----- Q16 shape: distinct-supplier variety per part brand/type
    GraftQuery("q16_supplier_variety", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(broadcast(T.part(s, d)), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type")
    }, Some("""
      SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_type
      ORDER BY supplier_cnt DESC, p_brand, p_type""")),

    // ----- string aggregation (listagg) with deterministic order
    GraftQuery("a4_string_agg", (s, d) => {
      import s.implicits._
      T.customer(s, d)
        .select($"c_nationkey", $"c_mktsegment").distinct()
        .groupBy($"c_nationkey")
        .agg(array_join(array_sort(collect_list($"c_mktsegment")), ",").as("segments"))
        .orderBy($"c_nationkey")
    }, Some("""
      SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
      FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) t
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ----- explicit cross join (bounded: two dimension tables)
    GraftQuery("j8_cross_join", (s, d) => {
      import s.implicits._
      T.region(s, d).crossJoin(T.nation(s, d))
        .select($"r_name", $"n_name", ($"r_regionkey" === $"n_regionkey").as("is_home"))
        .orderBy($"r_name", $"n_name")
    }, Some("""
      SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
      FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""")),

    // ----- J13: null-safe equi join (<=> / IS NOT DISTINCT FROM) — the
    // semantics corner plain equality silently drops: NULL keys match each
    // other. Keys are deterministically nulled (prop k >= 90 → NULL,
    // ~10% of the domain), both sides DISTINCT before the join so the
    // null-group match stays set-sized. The query runs the SAME join both
    // ways in one plan — null-safe and plain — and emits the per-type
    // difference; <=> is a hashable equi-key in Spark, so this stays a
    // hash/sort-merge join, never a BNLJ.
    GraftQuery("j13_nullsafe_join", (s, d) => {
      import s.implicits._
      def side(parity: Int) = T.events(s, d)
        .filter($"event_id" % 2 === parity)
        .select($"event_type",
          when(get_json_object($"props", "$.k").cast("long") >= 90, lit(null))
            .otherwise(get_json_object($"props", "$.k").cast("long")).as("k"))
        .distinct()
      val a = side(0)
      val b = side(1).withColumnRenamed("k", "bk")
      val ns = a.join(b, a("event_type") === b("event_type") && $"k" <=> $"bk")
        .groupBy(a("event_type").as("event_type"))
        .agg(count(lit(1)).as("n_nullsafe"))
      val pl = a.join(b, a("event_type") === b("event_type") && $"k" === $"bk")
        .groupBy(a("event_type").as("event_type"))
        .agg(count(lit(1)).as("n_plain"))
      ns.join(pl, "event_type")
        .select($"event_type", $"n_nullsafe", $"n_plain",
          ($"n_nullsafe" - $"n_plain").as("null_matches"))
        .orderBy($"event_type")
    }, Some("""
      WITH a AS (SELECT DISTINCT event_type,
                   CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
                        THEN NULL
                        ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
                 FROM events WHERE event_id % 2 = 0),
      b AS (SELECT DISTINCT event_type,
              CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
                   THEN NULL
                   ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
            FROM events WHERE event_id % 2 = 1),
      ns AS (SELECT a.event_type, COUNT(*) AS n_nullsafe
             FROM a JOIN b ON a.event_type = b.event_type
               AND a.k IS NOT DISTINCT FROM b.k
             GROUP BY a.event_type),
      pl AS (SELECT a.event_type, COUNT(*) AS n_plain
             FROM a JOIN b ON a.event_type = b.event_type AND a.k = b.k
             GROUP BY a.event_type)
      SELECT ns.event_type, n_nullsafe, n_plain,
        n_nullsafe - n_plain AS null_matches
      FROM ns JOIN pl ON ns.event_type = pl.event_type
      ORDER BY ns.event_type""")),

    // ----- A1b: HAVING (post-aggregation filter)
    GraftQuery("a1_having", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), moneySum($"o_totalprice").as("total"))
        .filter($"n_orders" >= 15)
        .orderBy($"o_custkey")
    }, Some(s"""
      SELECT o_custkey, COUNT(*) AS n_orders, ${sql.moneySum("o_totalprice")} AS total
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
      ORDER BY o_custkey""")),

    // ----- A9: fixed-width histogram (exact integer bucketing)
    GraftQuery("a9_histogram", (s, d) => {
      import s.implicits._
      T.events(s, d)
        .withColumn("bucket", floor($"value" / 25).cast(IntegerType))
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type", $"bucket")
    }, Some("""
      SELECT event_type, CAST(floor(value / 25) AS INT) AS bucket, COUNT(*) AS n
      FROM events GROUP BY event_type, bucket
      ORDER BY event_type, bucket""")),

    // ----- three-valued logic and null-safe equality
    GraftQuery("f_null_logic", (s, d) => {
      import s.implicits._
      val maybe = expr("nullif(o_orderstatus, 'P')")
      T.orders(s, d).select(
        $"o_orderkey",
        ($"o_orderstatus" <=> lit("P")).as("nse_p"),
        (maybe <=> lit(null)).as("nse_null"),
        (maybe === lit("O")).as("eq_three_valued"),
        (maybe.isNull && $"o_totalprice" > 0).as("and_with_null"),
        (maybe.isNotNull || $"o_totalprice" < 0).as("or_with_null"),
        expr("ifnull(nullif(o_orderstatus, 'P'), 'replaced')").as("ifnulled"))
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey,
        o_orderstatus IS NOT DISTINCT FROM 'P' AS nse_p,
        nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL AS nse_null,
        nullif(o_orderstatus, 'P') = 'O' AS eq_three_valued,
        nullif(o_orderstatus, 'P') IS NULL AND o_totalprice > 0 AS and_with_null,
        nullif(o_orderstatus, 'P') IS NOT NULL OR o_totalprice < 0 AS or_with_null,
        ifnull(nullif(o_orderstatus, 'P'), 'replaced') AS ifnulled
      FROM orders ORDER BY o_orderkey""")),

    // ----- A2: rollup
    GraftQuery("a2_rollup", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val c = T.customer(s, d)
      val n = T.nation(s, d)
      o.join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .rollup($"n_name", $"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), moneySum($"o_totalprice").as("total"),
          (grouping($"n_name") * 2 + grouping($"c_mktsegment")).cast(IntegerType).as("gid"))
        .select($"gid", $"n_name", $"c_mktsegment", $"n_orders", $"total")
        .orderBy($"gid", $"n_name".asc_nulls_first, $"c_mktsegment".asc_nulls_first)
    }, Some(s"""
      SELECT CAST(GROUPING(n_name)*2 + GROUPING(c_mktsegment) AS INT) AS gid,
        n_name, c_mktsegment, COUNT(*) AS n_orders,
        ${sql.moneySum("o_totalprice")} AS total
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""")),

    // ----- A2b: cube
    GraftQuery("a2_cube", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), moneySum($"o_totalprice").as("total"),
          (grouping($"o_orderstatus") * 2 + grouping($"o_orderpriority")).cast(IntegerType).as("gid"))
        .select($"gid", $"o_orderstatus", $"o_orderpriority", $"n", $"total")
        .orderBy($"gid", $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }, Some(s"""
      SELECT CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid,
        o_orderstatus, o_orderpriority, COUNT(*) AS n,
        ${sql.moneySum("o_totalprice")} AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ----- A2c: grouping sets (SQL surface; Catalyst plans the expand)
    GraftQuery("a2_grouping_sets", (s, d) => {
      T.registerAll(s, d)
      s.sql(s"""
        SELECT CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid,
          o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    }, Some("""
      SELECT CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid,
        o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ----- A3: exact quantiles (linear interpolation, exact on int-valued
    // qty). The quantile array is split into scalar columns so the driver's
    // pandas comparator can sort/hash the output (top-level arrays crash it).
    GraftQuery("a3_quantiles", (s, d) => {
      import s.implicits._
      T.lineitem(s, d).groupBy($"l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qs"),
          min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"))
        .select($"l_returnflag",
          element_at($"qs", 1).as("q25"),
          element_at($"qs", 2).as("q50"),
          element_at($"qs", 3).as("q75"),
          $"min_qty", $"max_qty")
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS q25,
        quantile_cont(l_quantity, 0.5) AS q50,
        quantile_cont(l_quantity, 0.75) AS q75,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----- A3b: approx sketches. Sketch internals (HLL / KLL) differ across
    // engines, so the oracle checks an *invariant* instead of raw values: the
    // Spark query computes both the sketch and the exact answer and emits
    // pass/fail booleans; the oracle asserts they are all TRUE.
    GraftQuery("a3_approx_sketch", (s, d) => {
      import s.implicits._
      T.lineitem(s, d).agg(
        approx_count_distinct($"l_partkey").as("apx_parts"),
        countDistinct($"l_partkey").as("ex_parts"),
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)").as("apx_q"),
        expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("ex_q"))
      .select(
        (abs($"apx_parts" - $"ex_parts") <= $"ex_parts" * 0.05).as("parts_ok"),
        (abs(element_at($"apx_q", 1) - element_at($"ex_q", 1))
          <= element_at($"ex_q", 1) * 0.05).as("q50_ok"),
        (abs(element_at($"apx_q", 2) - element_at($"ex_q", 2))
          <= element_at($"ex_q", 2) * 0.05).as("q95_ok"))
    }, Some("""
      SELECT TRUE AS parts_ok, TRUE AS q50_ok, TRUE AS q95_ok"""),
      bench = true),

    // ----- A4: collect_list / collect_set (sorted for determinism, joined
    // to a single string so the driver comparator can hash the row)
    GraftQuery("a4_collect", (s, d) => {
      import s.implicits._
      T.customer(s, d).groupBy($"c_nationkey")
        .agg(
          array_join(array_sort(collect_list($"c_mktsegment")), ",").as("segments_all"),
          array_join(array_sort(collect_set($"c_mktsegment")), ",").as("segments_distinct"))
        .orderBy($"c_nationkey")
    }, Some("""
      SELECT c_nationkey,
        array_to_string(list_sort(list(c_mktsegment)), ',') AS segments_all,
        array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments_distinct
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ----- subqueries: correlated scalar + IN (Catalyst decorrelates both
    // into joins — the SQL front door of the J3 semi-join surface)
    GraftQuery("p8_subqueries", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice >= (SELECT MAX(o2.o_totalprice) FROM orders o2
                               WHERE o2.o_custkey = o.o_custkey)
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 1000)
        ORDER BY o_orderkey""")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice >= (SELECT MAX(o2.o_totalprice) FROM orders o2
                             WHERE o2.o_custkey = o.o_custkey)
        AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 1000)
      ORDER BY o_orderkey""")),

    // ----- Q17 shape: correlated AGGREGATE subquery — revenue from
    // small-quantity (< 0.2 × per-part average) lineitems of one brand.
    // Catalyst decorrelates the per-part average into an Aggregate + join
    // (no per-row subquery execution) — pinned by a plan guard in
    // OperatorsSpec. Quantities are integer-valued doubles, so the per-part
    // avg is exact and order-independent; the revenue sum goes through
    // DECIMAL(18,2) for a bit-stable double.
    GraftQuery("q17_small_quantity", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
          COUNT(*) AS n_small
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)""")
    }, Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        COUNT(*) AS n_small
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#13'
        AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)""")),

    // ----- Q21 shape: EXISTS + NOT EXISTS chain on the same fact —
    // suppliers who were the ONLY late shipper on a finished multi-supplier
    // order ("late" = shipped >30 days after order date; this testdata has
    // no receipt/commit dates). Catalyst turns the chain into a left-semi
    // plus left-anti join against the shared lateness-flagged CTE — pinned
    // by a plan guard in OperatorsSpec.
    GraftQuery("q21_waiting_suppliers", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        WITH li AS (
          SELECT l_orderkey, l_suppkey,
            l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'
        )
        SELECT s_name, n_name, COUNT(*) AS numwait
        FROM li l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY s_name, n_name
        ORDER BY numwait DESC, s_name""")
    }, Some("""
      WITH li AS (
        SELECT l_orderkey, l_suppkey,
          l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
      )
      SELECT s_name, n_name, COUNT(*) AS numwait
      FROM li l1
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM li l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      GROUP BY s_name, n_name
      ORDER BY numwait DESC, s_name""")),

    // ----- Q13 shape: outer-join-below-aggregate — order count per
    // customer INCLUDING zero-order customers (the join filter lives in the
    // ON clause, so unmatched customers survive as NULLs and COUNT(col)
    // gives them 0), then the distribution of those counts. The classic
    // null-preserving planner surface: pushing the priority filter to WHERE
    // would silently drop the zero bucket.
    GraftQuery("q13_customer_distribution", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) cc
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")
    }, Some("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) cc
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")),

    // ----- Q15 shape: aggregate-then-argmax via CTE reuse — quarterly
    // revenue per supplier, keep the supplier(s) hitting the global max.
    // The revenue CTE is referenced twice (join side + scalar MAX); both
    // totals come off the same exact decimal sum, so the equality join on
    // DOUBLE is bit-stable in both engines. At scale: one shuffle to
    // suppkey for the agg, the 1-row MAX broadcasts.
    GraftQuery("q15_top_supplier", (s, d) => {
      T.registerAll(s, d)
      s.sql(s"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey""")
    }, Some("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey""")),

    // ----- Q20 shape: nested IN subqueries with a grouped HAVING inside —
    // suppliers who moved serious volume (> 1660 units, the corpus median)
    // of red parts since 1996. The inner IN prunes lineitem to red parts,
    // the grouped HAVING aggregates per supplier, the outer IN semi-joins
    // suppliers — Catalyst flattens both INs to left-semi joins (plan guard
    // in OperatorsSpec). Quantities are integer-valued doubles, so the sum
    // is exact and the threshold deterministic.
    GraftQuery("q20_volume_suppliers", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > 1660.0)
        ORDER BY s_suppkey""")
    }, Some("""
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 1660.0)
      ORDER BY s_suppkey""")),

    // ----- Q22 shape: uncorrelated scalar subquery + NOT EXISTS — rich
    // customers (balance above the positive-balance average of the same
    // nation group) who never placed an urgent order, grouped by nation
    // ("country code"; this testdata has no phone column). The average is
    // an exact decimal sum over one division, so the threshold compare is
    // bit-stable; the scalar runs once and broadcasts, the NOT EXISTS
    // becomes a left-anti join (plan guard in OperatorsSpec).
    GraftQuery("q22_global_sales", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 2, 3, 11, 17, 21)
          AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer c2
                           WHERE c2.c_acctbal > 0.0
                             AND c2.c_nationkey IN (1, 2, 3, 11, 17, 21))
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        ORDER BY cntrycode""")
    }, Some("""
      SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer
      WHERE c_nationkey IN (1, 2, 3, 11, 17, 21)
        AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / COUNT(*)
                         FROM customer c2
                         WHERE c2.c_acctbal > 0.0
                           AND c2.c_nationkey IN (1, 2, 3, 11, 17, 21))
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey
      ORDER BY cntrycode""")),

    // ----- pivot: per-user event-type counts as columns
    GraftQuery("a6_pivot", (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy($"user_id")
    }, Some("""
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // ----- unpivot (melt): the inverse of a6_pivot — wide per-user counts
    // back to (user_id, event_type, n) long form
    GraftQuery("a6_unpivot", (s, d) => {
      import s.implicits._
      val wide = T.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count().na.fill(0L)
      wide.unpivot(
          Array($"user_id"),
          Array($"click", $"error", $"purchase", $"signup", $"view"),
          "etype", "n")
        .filter($"n" > 0)
        .orderBy($"user_id", $"etype")
    }, Some("""
      SELECT user_id, event_type AS etype, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, etype""")),

    // ----- A4b: map aggregation — per-nation segment→count map, built from
    // a sorted entry array so key order (and the JSON rendering) is stable
    GraftQuery("a4_map_agg", (s, d) => {
      import s.implicits._
      T.customer(s, d)
        .groupBy($"c_nationkey", $"c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"c_nationkey")
        .agg(to_json(map_from_entries(
          array_sort(collect_list(struct($"c_mktsegment", $"cnt"))))).as("seg_counts"))
        .orderBy($"c_nationkey")
    }, Some("""
      WITH c AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
                 FROM customer GROUP BY c_nationkey, c_mktsegment),
      m AS (SELECT c_nationkey,
              list_sort(list(c_mktsegment)) AS ks,
              list_sort(list(c_mktsegment || ':' || cnt)) AS kvs
            FROM c GROUP BY c_nationkey)
      SELECT c_nationkey,
        '{' || array_to_string(list_transform(kvs,
          kv -> '"' || str_split(kv, ':')[1] || '":' || str_split(kv, ':')[2]), ',') || '}' AS seg_counts
      FROM m ORDER BY c_nationkey""")),

    // ----- W1: ranking window functions
    GraftQuery("w1_ranking", (s, d) => {
      import s.implicits._
      val unique = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      val byBal = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc)
      T.customer(s, d).select(
        $"c_nationkey", $"c_custkey", $"c_acctbal",
        row_number().over(unique).cast(LongType).as("rn"),
        rank().over(byBal).cast(LongType).as("rk"),
        dense_rank().over(byBal).cast(LongType).as("drk"),
        ntile(4).over(unique).cast(LongType).as("quartile"))
        .orderBy($"c_nationkey", $"c_custkey")
    }, Some("""
      SELECT c_nationkey, c_custkey, c_acctbal,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
        RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rk,
        DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drk,
        NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer ORDER BY c_nationkey, c_custkey""")),

    // ----- P9: recursive CTE — iterative self-referencing query (Spark 4
    // WITH RECURSIVE, executed as UnionLoop). The fixture walks each
    // customer key up a derived binary tree (parent = key div 2) and
    // aggregates the path — the hierarchy/transitive-closure surface
    // (org charts, BOM explosion, graph reachability) that previously
    // needed a driver-side loop. Scale: each of the O(log maxKey)
    // iterations is one distributed filter+project over the previous
    // level's rows; no step ever holds the closure on one task, and the
    // final aggregate is an ordinary partial/final hash agg. Plan guard
    // (OperatorsSpec): the plan contains UnionLoop, proving real
    // recursion rather than a rewritten union.
    GraftQuery("p9_recursive_cte", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS custkey, c_custkey AS node, 0 AS depth FROM customer
          UNION ALL
          SELECT custkey, node div 2, depth + 1 FROM chain WHERE node > 1)
        SELECT custkey, MAX(depth) AS root_depth, CAST(SUM(node) AS BIGINT) AS path_sum
        FROM chain GROUP BY custkey ORDER BY custkey""")
    }, Some("""
      WITH RECURSIVE chain AS (
        SELECT c_custkey AS custkey, c_custkey AS node, 0 AS depth FROM customer
        UNION ALL
        SELECT custkey, node // 2, depth + 1 FROM chain WHERE node > 1)
      SELECT custkey, MAX(depth) AS root_depth, CAST(SUM(node) AS BIGINT) AS path_sum
      FROM chain GROUP BY custkey ORDER BY custkey""")),

    // ----- J11: lateral correlated subquery with ORDER BY + LIMIT — the
    // "top-n per outer row" join surface. Dialect-identical text runs on
    // both engines. Spark decorrelates the per-customer LIMIT into a
    // row_number window + rank filter joined back to customer (probed:
    // Window + BroadcastHashJoin, no nested loop) — but keeps the lateral
    // ORDER BY as a GLOBAL range sort of orders before the window, an
    // extra linear exchange the hand-written form avoids. At 100 TB prefer
    // the explicit W1 idiom (row_number over partitionBy(custkey)) for hot
    // paths; this gate pins the LATERAL API surface and that its plan
    // stays join+window shaped (guard in OperatorsSpec: no BNLJ).
    GraftQuery("j11_lateral_topn", (s, d) => {
      T.registerAll(s, d)
      s.sql(RelationalQueries.lateralTopnSql)
    }, Some(RelationalQueries.lateralTopnSql)),

    // ----- J12: interval-overlap join — two interval sets, pairs that
    // overlap in time. The naive form is a two-sided theta join (BNLJ,
    // quadratic when both sides are fact tables); the scale path is
    // SkewUtils.intervalOverlapJoin bucket decomposition: both sides
    // explode to covered fixed-width buckets, pairs match exactly once in
    // the first shared bucket (greatest-start rule), exact predicate
    // re-applied. The fixture overlaps urgent-vs-high-priority order
    // fulfilment windows in one quarter (scoped like j9 so the bench
    // measures join machinery, not output volume); the oracle is the
    // naive theta form in DuckDB. Plan guard: no BNLJ/CartesianProduct.
    GraftQuery("j12_interval_overlap", (s, d) => {
      import s.implicits._
      def windows(prio: String, keyName: String) = T.orders(s, d)
        .filter($"o_orderpriority" === prio &&
          $"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1996-04-01").cast(TimestampType))
        .select($"o_orderkey".as(keyName), $"o_orderdate".as(s"${keyName}_s"),
          ($"o_orderdate" + expr("INTERVAL 7 DAYS")).as(s"${keyName}_e"))
      val a = windows("1-URGENT", "a_key")
      val b = windows("2-HIGH", "b_key")
      SkewUtils.intervalOverlapJoin(a, "a_key_s", "a_key_e", b, "b_key_s", "b_key_e", 7L * 86400)
        .withColumn("ov_sec",
          (unix_micros(least($"a_key_e", $"b_key_e").cast(TimestampType)) -
            unix_micros(greatest($"a_key_s", $"b_key_s").cast(TimestampType))) / lit(1000000L))
        .groupBy($"a_key")
        .agg(count(lit(1)).as("n_overlaps"),
          max($"ov_sec").cast(LongType).as("max_ov_sec"),
          sum($"ov_sec").cast(LongType).as("sum_ov_sec"))
        .orderBy($"a_key")
    }, Some("""
      WITH a AS (SELECT o_orderkey AS a_key, o_orderdate AS s, o_orderdate + INTERVAL 7 DAY AS e
                 FROM orders WHERE o_orderpriority = '1-URGENT'
                   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'),
      b AS (SELECT o_orderkey AS b_key, o_orderdate AS s, o_orderdate + INTERVAL 7 DAY AS e
            FROM orders WHERE o_orderpriority = '2-HIGH'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00')
      SELECT a_key, COUNT(*) AS n_overlaps,
        CAST(MAX(epoch(least(a.e, b.e) - greatest(a.s, b.s))) AS BIGINT) AS max_ov_sec,
        CAST(SUM(epoch(least(a.e, b.e) - greatest(a.s, b.s))) AS BIGINT) AS sum_ov_sec
      FROM a JOIN b ON a.s < b.e AND b.s < a.e
      GROUP BY a_key ORDER BY a_key""")),

    // ----- P10: 2-D skyline (Pareto frontier) — orders in one quarter
    // that no other order beats on BOTH price and date (lower price AND
    // earlier date, strictly better in at least one). The naive form is a
    // quadratic NOT EXISTS self-theta-join (that IS the DuckDB oracle);
    // the scale path exploits the 2-D structure: sorted by (price, date),
    // a distinct point is on the frontier iff its EXCLUSIVE prefix-min of
    // date is null or later than its own date. That prefix-min runs as
    // the two-pass SkewUtils.rangedPrefixMin (range partition + local
    // window + broadcast partition offsets) — two bounded linear shuffles,
    // never a single-reducer global sort. Exact duplicates (same price
    // AND date — mutually non-dominating) are handled by computing the
    // frontier over distinct points, then joining back to re-emit every
    // order on a frontier point (the frontier is tiny → broadcast).
    GraftQuery("p10_skyline", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1995-04-01").cast(TimestampType))
        .select($"o_orderkey", $"o_totalprice".as("price"), $"o_orderdate".as("odate"))
      val pts = o.select($"price", $"odate").distinct()
      val sky = SkewUtils.rangedPrefixMin(pts, Seq("price", "odate"), "odate", 32, "__pm")
        .filter($"__pm".isNull || $"__pm" > $"odate")
        .select($"price", $"odate")
      o.join(broadcast(sky), Seq("price", "odate"))
        .select($"o_orderkey", $"price",
          date_format($"odate", "yyyy-MM-dd").as("odate"))
        .orderBy($"o_orderkey")
    }, Some("""
      WITH o AS (SELECT o_orderkey, o_totalprice AS price, o_orderdate AS odate
                 FROM orders
                 WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01')
      SELECT o_orderkey, price, strftime(odate, '%Y-%m-%d') AS odate
      FROM o p
      WHERE NOT EXISTS (
        SELECT 1 FROM o q
        WHERE q.price <= p.price AND q.odate <= p.odate
          AND (q.price < p.price OR q.odate < p.odate))
      ORDER BY o_orderkey"""))
  ) ++ TpchShapes.queries
}
