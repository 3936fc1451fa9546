package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Edge-case coverage for the graph operators the gate queries exercise on
  * derived graphs only: [[GraphQueries.ccLargeSmallStar]] (g3) and the
  * degree-oriented triangle shape (g4). The gate pins real-data answers via
  * DuckDB; these cases pin the algorithmic contracts the gate cannot reach
  * (log-round convergence on a path, isolated components, no triangles on a
  * bipartite graph).
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]) = {
    val (labels, converged) =
      GraphQueries.ccLargeSmallStar(edges.toDF("u", "v"))
    assert(converged, "large-star/small-star did not reach its fixpoint")
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("ccLargeSmallStar: a 64-node path collapses to one component") {
    // worst case for plain neighbor-min propagation (needs 63 rounds);
    // the star rewriting must converge within the 25-round cap
    val path = (0L until 63L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.size == 64 && labels.values.forall(_ == 0L))
  }

  test("ccLargeSmallStar: disjoint components keep distinct min labels") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L))
    val labels = cc(edges)
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("ccLargeSmallStar: a star already at fixpoint converges immediately") {
    val labels = cc(Seq((1L, 5L), (1L, 6L), (1L, 7L)))
    assert(labels == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("ccLargeSmallStar matches propagateMinLabels on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val viaStars = cc(edges)
    val e = edges.toDF("a", "b")
    val sym = e.union(e.select($"b".as("a"), $"a".as("b")))
    val nodes = sym.select($"a".as("__id")).distinct()
      .withColumn("__lbl", col("__id"))
    val viaLabels = graft.Graft.propagateMinLabels(nodes, sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars == viaLabels)
  }

  test("triangleCounts: shuffle fallback matches the broadcast plan") {
    // K5 plus a pendant: every K5 node sits in C(4,2)=6 triangles, the
    // pendant in none (and is absent from the output)
    val edges = ((for (u <- 0L until 5L; v <- u + 1 until 5L) yield (u, v))
      :+ (4L, 99L)).toDF("u", "v")
    def counts(b: Option[Boolean]) =
      GraphQueries.triangleCounts(edges, broadcastEdges = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBroadcast = counts(Some(true))
    val viaShuffle = counts(Some(false))
    assert(viaBroadcast == viaShuffle)
    assert(viaShuffle == (0L until 5L).map(n =>
      (n, 6L, if (n == 4L) 5L else 4L)).toSet)
  }

  test("triangleCounts: broadcast decision follows the size cap") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    def hints(b: Option[Boolean]): Int =
      "ResolvedHint".r.findAllIn(
        GraphQueries.triangleCounts(edges, broadcastEdges = b)
          .queryExecution.analyzed.toString).length
    // 3 hinted builds VISIBLE in the returned plan: the two adjacency
    // attaches and the final per-node degree join (the two degree-attach
    // hints sit behind the `oriented` checkpoint boundary)
    assert(hints(Some(true)) == 3, "broadcast branch must hint every join")
    assert(hints(Some(false)) == 0, "fallback branch must carry no hints")
    // auto decision: 3 edges is far under any sane cap -> broadcasts...
    assert(hints(None) == 3)
    // ...and a squeezed cap flips the same input to the shuffle form
    withConf("spark.graft.graph.broadcastEdgeBytes" -> "1") {
      assert(hints(None) == 0)
    }
    // the cluster-wide "no broadcasts" policy spellings must not crash
    // (JavaUtils can't parse negatives; the sign is stripped first) and
    // must select the shuffle form
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(hints(None) == 0)
    }
    withConf("spark.graft.graph.broadcastEdgeBytes" -> "-1") {
      assert(hints(None) == 0)
    }
  }

  test("bipartite graphs have zero triangles (orientation sanity)") {
    // any odd cycle is impossible in a bipartite graph; the oriented wedge
    // closure must find nothing
    val e = (for (l <- 0L until 6L; r <- 100L until 104L) yield (l, r)).toDF("u", "v")
    val deg = e.select($"u".as("n")).union(e.select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val ew = e
      .join(deg.select($"n".as("u"), $"deg".as("du")), "u")
      .join(deg.select($"n".as("v"), $"deg".as("dv")), "v")
    val oriented = ew.select(
      when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u").otherwise($"v").as("src"),
      when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v").otherwise($"u").as("dst"),
      when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"dv").otherwise($"du").as("ddst"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        $"x.src" === $"y.src" &&
        ($"x.ddst" < $"y.ddst" || ($"x.ddst" === $"y.ddst" && $"x.dst" < $"y.dst")))
      .select($"x.dst".as("b"), $"y.dst".as("c"))
    val tri = wedges.join(oriented.select($"src".as("b"), $"dst".as("c")), Seq("b", "c"))
    assert(tri.count() == 0L)
  }
}
