package graft.operators

import graft.{GraftQuery, Tables => T}
import org.apache.spark.sql.functions._

/** Graph analytics over derived link graphs — the authority-ranking pass a
  * corpus pipeline runs over its domain/document link graph to produce
  * quality weights (the classic pretraining-data curation signal), here
  * exercised on the supplier↔customer bipartite graph derived from
  * lineitem⋈orders.
  *
  * Spark-first shape: PageRank as the Pregel-as-join pattern — each
  * iteration is one equi join of the edge list with the current rank
  * vector plus a partial/final hash agg on the destination key. No driver
  * state, no collect; the edge list partitions on src and the rank vector
  * on node, so at 100 TB each iteration is one shuffle of the (bounded)
  * rank vector, not the edges (AQE broadcasts the rank side when it fits).
  *
  * Determinism contract: all arithmetic is integer micro-units with floor
  * division (rank starts at 1e6; contribution = r div outdeg; damping =
  * 150000 + (85·Σ) div 100) — float summation order can differ between
  * engines and between retries, integer sums cannot. Same device as the
  * IVF k-means trainer (Graft.kmeansCentroids).
  */
object GraphQueries {

  val queries: Seq[GraftQuery] = Seq(

    // ----- g1: PageRank, 3 synchronous iterations, damping 0.85. The
    // bipartite edge set is made symmetric (both directions) so every node
    // has in- and out-degree — no dangling-mass redistribution term needed.
    GraftQuery("g1_pagerank", (s, d) => {
      import s.implicits._
      val pairs = T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select($"l_suppkey".as("sk"), $"o_custkey".as("ck")).distinct()
      val edges = pairs.select($"sk".as("src"), ($"ck" + 100000L).as("dst"))
        .union(pairs.select(($"ck" + 100000L).as("src"), $"sk".as("dst")))
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
      SELECT node, CAST(r AS BIGINT) AS rank FROM r3 ORDER BY node"""))
  )
}
