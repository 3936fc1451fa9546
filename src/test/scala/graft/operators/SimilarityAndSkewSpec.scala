package graft.operators

import graft.{Graft, SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

class SimilarityAndSkewSpec extends SparkTestBase {

  test("IVF ANN recall vs brute force clears the invariant floor (k-means cells, nprobe=8 of 16)") {
    // floor 0.65: the synthetic embeddings are near-uniform on the sphere,
    // so recall ≈ probed fraction × ~1.5 (see Graft.annIvfTopK scaladoc);
    // measured 0.76-0.88 across sfs with honest (non-query-seeded) centroids
    val e = graft.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val exact = SparkEntry.queries("n5_ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Graft.annIvfTopK(e, q, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.65, s"IVF recall $recall below floor (found ${ivf.size}, exact ${exact.size})")
  }

  test("kmeansCentroids is deterministic and bit-stable across invocations") {
    val e = graft.Tables.embeddings(spark, sf)
    val a = Graft.kmeansCentroids(e, "vec_id", "embedding", 16, 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val b = Graft.kmeansCentroids(e, "vec_id", "embedding", 16, 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(a.length == 16)
    assert(a.map(_._1).sameElements(b.map(_._1)))
    a.zip(b).foreach { case ((_, va), (_, vb)) =>
      assert(va == vb, "centroid vectors differ between identical runs")
    }
  }

  test("LSH ANN top-3: per-query size, score range, recall floor") {
    val e = graft.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val lsh = Graft.annLshTopK(e, q, "vec_id", "embedding", 3).collect()
    assert(lsh.nonEmpty)
    val perQ = lsh.groupBy(_.getLong(0)).map(_._2.length)
    assert(perQ.forall(_ <= 3))
    assert(lsh.forall(r => math.abs(r.getDouble(2)) <= 1.0))
    val exact3 = Graft.annTopK(e, q, "vec_id", "embedding", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact3).size.toDouble / exact3.size
    assert(recall >= 0.70, s"LSH recall@3 $recall below floor")
  }

  test("cosineNearDupPairs is a subset of the exact pairs with recall floor") {
    val e = graft.Tables.embeddings(spark, sf)
    val exact = SparkEntry.queries("n4_embedding_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Graft.cosineNearDupPairs(e, "vec_id", "embedding", 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"rescore let false positives through: ${lsh -- exact}")
    val recall = if (exact.isEmpty) 1.0 else (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.70, s"near-dup recall $recall below floor (${lsh.size}/${exact.size})")
  }

  test("int8 quantization: range bound, scale cancellation, top-k recall") {
    val e = graft.Tables.embeddings(spark, sf)
    // every quantized element lies in [-127, 127]
    val qz = e.select(Graft.int8Quantize(col("embedding")).as("q"))
      .select(explode(col("q")).as("v"))
      .agg(min(col("v")), max(col("v"))).head()
    assert(qz.getInt(0) >= -127 && qz.getInt(1) <= 127, s"int8 range violated: $qz")
    // the scales cancel: quantized cosine tracks exact cosine within the
    // per-element rounding budget (~1/127 per axis over 64 dims)
    val q = e.filter(col("vec_id") < 10)
    val apx = Graft.annQuantizedTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Graft.annTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (apx & exact).size.toDouble / exact.size
    assert(recall >= 0.90, s"quantized recall@5 $recall below floor")
    // returned scores are the exact float cosines (rescore pass), so every
    // (pair, score) must match the brute-force companion bit-for-bit
    val bfScores = Graft.annTopK(e, q, "vec_id", "embedding", 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    Graft.annQuantizedTopK(e, q, "vec_id", "embedding", 5).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bfScores.get(key).foreach(exactCos =>
        assert(r.getDouble(2) == exactCos, s"rescored cosine drifted for $key"))
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // 60k-row side where 99% of rows share one join key vs a tiny dim —
    // with the skew thresholds lowered to test scale, AQE's
    // OptimizeSkewedJoin must split the hot partition instead of letting
    // one task process ~the whole fact side (the 100 TB failure mode)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = md5(concat_ws("-", $"l_orderkey", $"l_linenumber"))
      val fact = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
        .select(when($"l_linenumber" > 1, lit(0L)).otherwise($"l_orderkey").as("k"),
          concat(pad, pad, pad, pad).as("pad")) // ~128 B/row so the hot partition is MBs
        .repartition(16) // many mappers: AQE splits a skewed partition by
                         // mapper block, and a single-file scan gives just one
      val dim = spark.range(0, 2000).select($"id".as("k"), md5($"id".cast("string")).as("tag"))
      // global (ungrouped) aggregate: a groupBy(k) here would pin the join
      // output to hashpartitioning(k) and AQE would refuse to split the
      // skewed partition rather than add a recovery shuffle
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), max(length($"pad")).as("w"))
      joined.collect() // AQE finalizes the plan only on execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANN + simhash gate queries emit all-true invariant rows") {
    for (name <- Seq("n5_ann_lsh", "n5_ann_ivf", "n5_ann_quantized", "n2_simhash")) {
      val rows = SparkEntry.queries(name)(spark, sf).collect()
      assert(rows.length == 1, s"$name should emit one invariant row")
      val r = rows.head
      val bools = (0 until r.length).filter(i => r.get(i).isInstanceOf[Boolean])
      assert(bools.nonEmpty && bools.forall(r.getBoolean), s"$name invariants failed: $r")
    }
  }

  test("salted aggregate equals plain aggregate (count and sum)") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", (round($"value" * 100)).cast("long").as("cents"))
    val plain = ev.groupBy($"user_id").agg(sum($"cents").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewUtils.saltedAggregate(ev, $"user_id", 8, sum, $"cents", sum, $"cents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salts are content-derived: identical across recomputation and repartitioning (retry safety)") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf).select($"event_id", (round($"value" * 100)).cast("long").as("cents"))
    def salts(parts: Int): Map[Long, Long] =
      ev.repartition(parts)
        .withColumn("__salt", pmod(xxhash64($"cents"), lit(8)))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // a partition-id- or monotonic-id-derived salt changes with physical
    // layout; the content hash must not
    assert(salts(3) == salts(11))
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
    val salted = SkewUtils.saltedJoin(fact, "k", dim, "dk", 4, $"v").count()
    assert(salted == plain, s"salted $salted vs plain $plain")
  }

  test("rangedCumSum equals the single-reducer windowed running sum") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"event_id", (round($"value" * 100)).cast("long").as("cents"))
    val windowed = ev.withColumn("cs",
        sum($"cents").over(org.apache.spark.sql.expressions.Window
          .orderBy($"event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ranged = SkewUtils.rangedCumSum(ev, Seq("event_id"), "cents", 8, "cs")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ranged == windowed)
  }

  test("rangedPrefixMin equals the single-reducer exclusive running min") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"event_id", (round($"value" * 100)).cast("long").as("cents"))
    val windowed = ev.withColumn("pm",
        min($"cents").over(org.apache.spark.sql.expressions.Window
          .orderBy($"event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val ranged = SkewUtils.rangedPrefixMin(ev, Seq("event_id"), "cents", 8, "pm")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(ranged == windowed)
    // the one row with no predecessor is null, and only that one
    assert(ranged.count(_._2.isEmpty) == 1)
  }

  test("rangedRowNumber equals the windowed row_number") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf).select($"event_type", $"event_id", $"value")
    val windowed = ev.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"value", $"event_id")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    val ranged = SkewUtils.rangedRowNumber(ev, Seq("event_type"), Seq("value", "event_id"), 8, "rn")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3).toInt).toMap
    assert(ranged == windowed)
  }
}
