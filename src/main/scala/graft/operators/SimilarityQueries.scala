package graft.operators

import graft.{GraftQuery, Tables => T}
import graft.functions.GraftCodec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N3 similarity search over `embeddings` (vec_id, embedding float[64],
  * label): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100 TB scale path (buckets
  * shrink the candidate set ~2^planes-fold; the rescore is exact cosine).
  */
object SimilarityQueries {

  /** Deterministic pseudo-random hyperplanes: plane(j)(k) derived from
    * FNV-1a of (j,k) — no RNG, identical across runs and executors. */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (j, k) =>
      val h = GraftCodec.fnv1a64(s"plane:$j:$k".getBytes("UTF-8"))
      // map to [-1, 1)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  val queries: Seq[GraftQuery] = Seq(

    // ----- brute-force exact top-5 cosine neighbors for the first 10 vectors
    GraftQuery("n5_ann_bruteforce", (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d)
      val q = e.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding".as("qe"))
      val c = e.select($"vec_id".as("cid"), $"embedding".as("ce"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
      c.crossJoin(broadcast(q))
        .filter($"qid" =!= $"cid")
        .withColumn("cos", cosine_sim($"qe", $"ce"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"qid", $"cid", round($"cos", 6).as("cos"))
        .orderBy($"qid", $"cid")
    }, Some("""
      WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
      sc AS (SELECT qid, cid,
               list_sum(list_transform(range(1, 65), i -> qe[i] * ce[i])) /
               sqrt(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) *
                    list_sum(list_transform(range(1, 65), i -> ce[i] * ce[i]))) AS cos
             FROM q, c WHERE qid <> cid),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM sc)
      SELECT qid, cid, round(cos, 6) AS cos FROM r WHERE rn <= 5
      ORDER BY qid, cid"""), bench = true),

    // ----- embedding near-dup pairs above a cosine threshold
    GraftQuery("n4_embedding_neardup", (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d)
      val a = e.select($"vec_id".as("a"), $"embedding".as("ea"))
      val b = e.select($"vec_id".as("b"), $"embedding".as("eb"))
      a.crossJoin(b).filter($"a" < $"b")
        .withColumn("cos", cosine_sim($"ea", $"eb"))
        .filter($"cos" >= 0.45)
        .select($"a", $"b", round($"cos", 6).as("cos"))
        .orderBy($"a", $"b")
    }, Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      sc AS (SELECT x.vec_id AS a, y.vec_id AS b,
               list_sum(list_transform(range(1, 65), i -> x.v[i] * y.v[i])) /
               sqrt(list_sum(list_transform(range(1, 65), i -> x.v[i] * x.v[i])) *
                    list_sum(list_transform(range(1, 65), i -> y.v[i] * y.v[i]))) AS cos
             FROM e x JOIN e y ON x.vec_id < y.vec_id)
      SELECT a, b, round(cos, 6) AS cos FROM sc WHERE cos >= 0.45 ORDER BY a, b""")),

    // ----- IVF ANN (the other scale path): coarse quantizer over K fixed
    // centroids (the first K vectors — deterministic, no RNG), each vector
    // assigned to its nearest centroid cell; queries probe the nprobe
    // nearest cells and rescore exact cosine inside them. At 100 TB the
    // cell assignment is a narrow groupBy key and the probe join touches
    // nprobe/K of the corpus. Probabilistic recall: rows-only (recall floor
    // asserted against brute force in SimilaritySpec).
    GraftQuery("n5_ann_ivf", (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d)
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cv"))
      // assign: nearest centroid per vector (broadcast 16 centroids)
      val wAssign = Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cent_id")
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("csim", cosine_sim($"embedding", $"cv"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1)
        .select($"vec_id", $"embedding", $"cent_id".as("cell"))
      // probe: each query probes its 4 nearest cells
      val wProbe = Window.partitionBy($"qid").orderBy($"csim".desc, $"cent_id")
      val probes = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qe"))
        .crossJoin(broadcast(cents))
        .withColumn("csim", cosine_sim($"qe", $"cv"))
        .withColumn("rn", row_number().over(wProbe))
        .filter($"rn" <= 4)
        .select($"qid", $"qe", $"cent_id".as("cell"))
      val wTop = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
      assigned.join(probes, "cell")
        .filter($"qid" =!= $"vec_id")
        .withColumn("cos", cosine_sim($"qe", $"embedding"))
        .withColumn("rn", row_number().over(wTop))
        .filter($"rn" <= 5)
        .select($"qid", $"vec_id".as("cid"), round($"cos", 6).as("cos"))
        .orderBy($"qid", $"cid")
    }, None),

    // ----- LSH-bucketed ANN (the scale path): 8 hyperplane sign bits →
    // bucket join → exact cosine rescore, top-3 per query among candidates.
    // Probabilistic recall: rows-only check; bucketing correctness is
    // covered by SimilaritySpec.
    GraftQuery("n5_ann_lsh", (s, d) => {
      import s.implicits._
      val pl = planes(8, 64)
      val planeCols = pl.map(p => typedLit(p.toSeq))
      // sign-bit bucket of a float[64] embedding against the 8 planes
      def bucket(e: org.apache.spark.sql.Column) = {
        val bits = planeCols.zipWithIndex.map { case (p, j) =>
          val dot = aggregate(
            zip_with(e, p, (x, y) => x.cast(DoubleType) * y),
            lit(0.0), (acc, v) => acc + v)
          when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
        }
        bits.reduce(_ + _)
      }
      val e = T.embeddings(s, d)
      val q = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qe"), bucket($"embedding").as("bk"))
      val c = e.select($"vec_id".as("cid"), $"embedding".as("ce"), bucket($"embedding").as("bk"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
      c.join(broadcast(q), "bk")
        .filter($"qid" =!= $"cid")
        .withColumn("cos", cosine_sim($"qe", $"ce"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"qid", $"cid", round($"cos", 6).as("cos"))
        .orderBy($"qid", $"cid")
    }, None)
  )
}
