package graft.operators

import graft.{SparkTestBase, SparkEntry}
import org.apache.spark.sql.functions._

class SimilarityAndSkewSpec extends SparkTestBase {

  test("IVF ANN recall vs brute force is usable (nprobe=4 of 16 cells)") {
    val exact = SparkEntry.queries("n5_ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("n5_ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall collapsed (found ${ivf.size}, exact ${exact.size})")
  }

  test("LSH ANN returns a subset-quality result per query") {
    val lsh = SparkEntry.queries("n5_ann_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty)
    // every query returns at most 3, all cos in [-1, 1]
    val perQ = lsh.groupBy(_.getLong(0)).map(_._2.length)
    assert(perQ.forall(_ <= 3))
    assert(lsh.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("salted aggregate equals plain aggregate (count and sum)") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", (round($"value" * 100)).cast("long").as("cents"))
    val plain = ev.groupBy($"user_id").agg(sum($"cents").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewUtils.saltedAggregate(ev, $"user_id", 8, sum, $"cents", sum)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed band join equals the naive theta join") {
    import spark.implicits._
    val s1 = graft.Tables.supplier(spark, sf).select($"s_suppkey".as("a_key"), $"s_acctbal".as("a_bal"))
    val s2 = graft.Tables.supplier(spark, sf).select($"s_suppkey".as("b_key"), $"s_acctbal".as("b_bal"))
    val naive = s1.join(s2, $"a_bal" < $"b_bal" && $"b_bal" - $"a_bal" < lit(100.0))
      .select($"a_key", $"b_key").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = SkewUtils.bandJoin(s1, "a_bal", s2, "b_bal", 100.0)
      .select($"a_key", $"b_key").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive, s"missing=${naive -- bucketed}, extra=${bucketed -- naive}")
  }

  test("salted join equals plain join on a skewed fact") {
    import spark.implicits._
    // skewed fact: 90% of rows on one key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 10).toLong, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 10L).map(k => (k, s"dim$k")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk").count()
    val salted = SkewUtils.saltedJoin(fact, "k", dim, "dk", 4).count()
    assert(salted == plain, s"salted $salted vs plain $plain")
  }
}
