package graft.operators

import graft.{GraftQuery, Tables => T}

/** The nine TPC-H planner shapes not yet covered elsewhere (Q2 Q4 Q6 Q7 Q8
  * Q9 Q11 Q14 Q19) — with this module every one of the 22 TPC-H query
  * shapes is oracle-pinned somewhere in the registry. Shapes, not ports:
  * the testdata has no `partsupp` table and no commit/receipt dates, so
  *  - Q2/Q11 derive the supply relation from lineitem (min/sum of line
  *    price per (part, supplier)) — the planner shape (correlated scalar
  *    MIN over a 4-way join / uncorrelated scalar threshold) is identical;
  *  - Q4's "late line" EXISTS predicate becomes l_shipdate > o_orderdate +
  *    30 days (same orders→lineitem correlated EXISTS, different column);
  *  - Q9's supply cost becomes p_retailprice * l_quantity (part-derived
  *    cost model), keeping the two-fact five-way join + year/nation rollup.
  *
  * The SQL is dialect-identical between Spark and DuckDB, so each query
  * passes the SAME string to both engines — the strongest possible form of
  * the oracle contract (no transliteration gap to hide a semantic drift).
  *
  * Determinism: all money math in DECIMAL(18,2)-derived exact arithmetic,
  * cast to DOUBLE only at the output boundary; ratios are a single IEEE
  * double division of two exact sums (bit-identical across engines); every
  * output is totally ordered.
  *
  * Scale notes (100 TB): every shape is a declarative multi-join Catalyst
  * reorders freely; region/nation/supplier/part are broadcast-size dims,
  * lineitem/orders shuffle on their join keys once; the correlated
  * subqueries (q2/q4) decorrelate to aggregate+join (plan guards in
  * OperatorsSpec); q19's OR-of-ANDs stays one join with a residual
  * disjunction — never a union of three scans.
  */
object TpchShapes {

  /** Register views, run the same SQL Spark-side that DuckDB runs. */
  private def sqlShape(name: String, text: String): GraftQuery =
    GraftQuery(name, (s, d) => { T.registerAll(s, d); s.sql(text) }, Some(text))

  // ----- Q2 shape: min-cost supplier — correlated scalar MIN subquery over
  // a join chain, re-joined to the same chain in the outer query. The
  // correlated MIN decorrelates to a per-part aggregate joined back on
  // p_partkey (plan guard in OperatorsSpec). Known cost of the shared-text
  // form: Spark inlines the `supply` CTE, so the lineitem aggregation
  // plans twice (the two consumers prune different columns, defeating
  // ReuseExchange). The production form computes `supply` once and
  // localCheckpoints it before the two joins — the CTE-materialization
  // idiom used by Graft.kmeansCentroids / dedupClusters.
  private val q2 = """
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_suppkey AS s_suppkey,
      CAST(ps_cost AS DOUBLE) AS cost
    FROM part, supply, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      AND ps_cost = (SELECT MIN(ps2.ps_cost)
                     FROM supply ps2, supplier s2, nation n2, region r2
                     WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
                       AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
                       AND r2.r_name = 'EUROPE')
    ORDER BY p_partkey, s_suppkey"""

  // ----- Q4 shape: order-priority checking — correlated EXISTS from orders
  // into lineitem with a non-equi correlate (shipdate vs orderdate+30d);
  // decorrelates to a left-semi join on l_orderkey with the date predicate
  // as the residual.
  private val q4 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ----- Q6 shape: forecasting revenue change — the pure scan-filter-agg
  // query. Everything pushes to the parquet scan (shipdate range, discount
  // band, quantity cap); one exact decimal sum, no shuffle beyond the
  // single-row partial-agg gather.
  private val q6 = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0"""

  // ----- Q7 shape: volume shipping between two nations — the double-nation
  // role join (nation joined twice under different roles) with an OR pair
  // predicate, grouped by both roles and ship year.
  private val q7 = """
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(disc) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
        CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS disc
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  // ----- Q8 shape: national market share — eight-relation join, CASE-
  // weighted share of one nation's supplier revenue within a region's
  // customer market, per order year. The share is one double division of
  // two exact decimal sums.
  private val q8 = """
    SELECT o_year,
      CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
      CAST(SUM(volume) AS DOUBLE) AS total_rev,
      CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
        n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year ORDER BY o_year"""

  // ----- Q9 shape: product-type profit — part-name LIKE filter driving a
  // two-fact (lineitem+orders) five-way join, profit = revenue minus a
  // part-derived cost, rolled up by supplier nation and order year. Mixed-
  // scale decimal subtraction stays exact (scale-4 both engines).
  private val q9 = """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
          - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey AND p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year ORDER BY nation, o_year"""

  // ----- Q11 shape: important supply — grouped value with an uncorrelated
  // scalar-subquery threshold (fraction of the global total). The scalar
  // runs once and broadcasts; the threshold compare is double*literal on
  // both sides (same IEEE result).
  private val q11 = """
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT ps_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM supply
    WHERE CAST(part_value AS DOUBLE) > (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.002
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
    ORDER BY part_value DESC, ps_partkey"""

  // ----- Q14 shape: promotion effect — conditional-aggregate ratio over a
  // fact-dim join, per ship year. Numerator/denominator emitted alongside
  // the ratio so the oracle pins the exact sums, not just the quotient.
  private val q14 = """
    SELECT l_year,
      CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_rev,
      CAST(SUM(disc) AS DOUBLE) AS total_rev,
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(disc) AS DOUBLE) AS promo_pct
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year, p_type,
        CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS disc
      FROM lineitem, part WHERE l_partkey = p_partkey) x
    GROUP BY l_year ORDER BY l_year"""

  // ----- Q19 shape: discounted revenue — the disjunctive-predicate join.
  // Three (brand, size-range, quantity-range) conjuncts OR'd together over
  // one lineitem⨝part equi-join; the planner must keep a single join with
  // the disjunction as a residual filter (and push the derivable
  // brand-membership part filter below the join), never expand to a union
  // of three scans. Plan guard in OperatorsSpec.
  private val q19 = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))"""

  val queries: Seq[GraftQuery] = Seq(
    sqlShape("q2_min_cost_supplier", q2),
    sqlShape("q4_priority_check", q4),
    sqlShape("q6_forecast_revenue", q6),
    sqlShape("q7_volume_shipping", q7),
    sqlShape("q8_market_share", q8),
    sqlShape("q9_product_profit", q9),
    sqlShape("q11_important_supply", q11),
    sqlShape("q14_promo_effect", q14),
    sqlShape("q19_disjunctive_join", q19))
}
