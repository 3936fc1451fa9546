package graft.operators

import graft.{GraftQuery, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over derived link graphs — the authority-ranking /
  * reachability passes a corpus pipeline runs over its domain/document link
  * graph to produce quality weights and crawl frontiers (classic
  * pretraining-data curation signals), here exercised on the
  * supplier↔customer bipartite graph derived from lineitem⋈orders.
  *
  * Spark-first shape: each iteration is one equi join of the edge list with
  * the current per-node vector plus a partial/final hash agg on the
  * destination key (the Pregel-as-join pattern). No driver state, no
  * collect; the edge list partitions on src and the node vector on node, so
  * at 100 TB each iteration is one shuffle of the (bounded) node vector,
  * not the edges (AQE broadcasts the vector side when it fits).
  *
  * Determinism contract (g1): all arithmetic is integer micro-units with
  * floor division (rank starts at 1e6; contribution = r div outdeg;
  * damping = 150000 + (85·Σ) div 100) — float summation order can differ
  * between engines and between retries, integer sums cannot. Same device
  * as the IVF k-means trainer (Graft.kmeansCentroids). g2's labels are
  * hop counts — already integers.
  */
object GraphQueries {

  /** Symmetric (src, dst) edge list of the supplier↔customer bipartite
    * graph: nodes are s_suppkey and o_custkey + 100000 (disjoint id
    * spaces), one undirected edge per distinct trading pair. */
  private def bipartiteEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = T.lineitem(s, d)
      .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".as("sk"), $"o_custkey".as("ck")).distinct()
    pairs.select($"sk".as("src"), ($"ck" + 100000L).as("dst"))
      .union(pairs.select(($"ck" + 100000L).as("src"), $"sk".as("dst")))
  }

  val queries: Seq[GraftQuery] = Seq(

    // ----- g1: PageRank, 3 synchronous iterations, damping 0.85. The
    // bipartite edge set is made symmetric (both directions) so every node
    // has in- and out-degree — no dangling-mass redistribution term needed.
    GraftQuery("g1_pagerank", (s, d) => {
      import s.implicits._
      val edges = bipartiteEdges(s, d)
      val withDeg = edges.join(
        edges.groupBy($"src").agg(count(lit(1)).as("deg")), "src")
      var rank = edges.select($"src".as("node")).distinct()
        .withColumn("r", lit(1000000L))
      for (_ <- 1 to 3) {
        rank = withDeg.join(rank.withColumnRenamed("node", "src"), "src")
          .select($"dst", expr("r div deg").as("c"))
          .groupBy($"dst")
          .agg(sum($"c").as("sc"))
          .select($"dst".as("node"), (lit(150000L) + expr("(85 * sc) div 100")).as("r"))
      }
      rank.select($"node", $"r".as("rank")).orderBy($"node")
    }, Some("""
      WITH pairs AS (SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
                     FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT sk AS src, ck + 100000 AS dst FROM pairs
                UNION ALL SELECT ck + 100000, sk FROM pairs),
      deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
      r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r
             FROM (SELECT DISTINCT src FROM edges)),
      r1 AS (SELECT e.dst AS node, 150000 + (85 * SUM(r.r // d.deg)) // 100 AS r
             FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r2 AS (SELECT e.dst AS node, 150000 + (85 * SUM(r.r // d.deg)) // 100 AS r
             FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r3 AS (SELECT e.dst AS node, 150000 + (85 * SUM(r.r // d.deg)) // 100 AS r
             FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst)
      SELECT node, CAST(r AS BIGINT) AS rank FROM r3 ORDER BY node""")),

    // ----- g2: multi-source BFS hop counts, 3 synchronous rounds — the
    // bounded-radius reachability pass (crawl frontier expansion, blast-
    // radius queries). Seeds are every-5th supplier at distance 0 (non-empty
    // at every test SF, so the gate never passes vacuously);
    // each round expands the whole current label set through the edge
    // list and re-minimizes per node, so after round i every node holds
    // its exact shortest distance over paths of length <= i. The edge
    // list is localCheckpoint'd once (it is re-joined every round — at
    // scale this is the cached/materialized edge table every graph engine
    // keeps); per-round work is one equi join + one hash agg, no driver
    // state. The DuckDB oracle is a recursive CTE over the same edges
    // with UNION (per-level dedup) and MIN(dist) per node.
    GraftQuery("g2_bfs_levels", (s, d) => {
      import s.implicits._
      val edges = bipartiteEdges(s, d).localCheckpoint(true)
      var dist = T.supplier(s, d).filter($"s_suppkey" % 5 === 0)
        .select($"s_suppkey".as("node"), lit(0L).as("dist"))
      for (_ <- 1 to 3) {
        val next = edges.join(dist.withColumnRenamed("node", "src"), "src")
          .select($"dst".as("node"), ($"dist" + 1L).as("dist"))
        dist = dist.union(next).groupBy($"node").agg(min($"dist").as("dist"))
      }
      dist.orderBy($"node")
    }, Some("""
      WITH pairs AS (SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
                     FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT sk AS src, ck + 100000 AS dst FROM pairs
                UNION ALL SELECT ck + 100000, sk FROM pairs),
      rec AS (
        WITH RECURSIVE bfs(node, dist) AS (
          SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey % 5 = 0
          UNION
          SELECT e.dst, bfs.dist + 1 FROM edges e JOIN bfs ON e.src = bfs.node
          WHERE bfs.dist < 3)
        SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node)
      SELECT node, CAST(dist AS BIGINT) AS dist FROM rec ORDER BY node"""))
  )
}
