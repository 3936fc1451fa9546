package graft.operators

import graft.{SparkTestBase, SparkEntry, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 primitives: keyed two-pass prefix sum, bucketed interval join,
  * and the plan shapes of the dataset-construction queries built on them.
  * Exact values are the oracle's job; these pin equivalence to the naive
  * forms and the absence of scale anti-patterns in the physical plans. */
class PipelineSpec extends SparkTestBase {

  test("rangedCumSumByKey equals the naive keyed window cumsum") {
    import spark.implicits._
    val df = T.events(spark, sf).select($"event_id", $"event_type",
      graft.Det.vcents($"value").as("v"))
    val naive = df.withColumn("cum",
      sum($"v").over(Window.partitionBy($"event_type").orderBy($"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val twoPass = SkewUtils.rangedCumSumByKey(
      df, Seq("event_type"), Seq("event_id"), "v", 8, "cum")
    assert(twoPass.select("event_id", "event_type", "v", "cum")
      .exceptAll(naive.select("event_id", "event_type", "v", "cum")).isEmpty,
      "two-pass keyed cumsum diverged from the window form")
    assert(naive.count() == twoPass.count())
  }

  test("pointInIntervalJoin equals the naive theta join") {
    import spark.implicits._
    val intervals = T.orders(spark, sf).limit(200)
      .select($"o_orderkey", $"o_orderdate".as("start"),
        ($"o_orderdate" + expr("INTERVAL 3 DAYS")).as("end"))
    val points = T.lineitem(spark, sf).select($"l_orderkey", $"l_shipdate")
    val naive = points.join(intervals,
      $"l_shipdate" >= $"start" && $"l_shipdate" < $"end")
      .select($"o_orderkey", $"l_orderkey", $"l_shipdate")
    val bucketed = SkewUtils.pointInIntervalJoin(
      points, "l_shipdate", intervals, "start", "end", 86400)
      .select($"o_orderkey", $"l_orderkey", $"l_shipdate")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed interval join diverged from the theta join")
    assert(naive.count() > 0, "degenerate fixture: no interval matches")
  }

  test("j9 plan is an equi join on buckets, not a broadcast nested loop") {
    val plan = SparkEntry.queries("j9_interval_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degraded to a quadratic join:\n$plan")
  }

  test("j5 gate runs the bucketed band join and equals the naive theta form") {
    import spark.implicits._
    val plan = SparkEntry.queries("j5_band_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band join degraded to a quadratic join:\n$plan")
    val s1 = T.supplier(spark, sf).select($"s_suppkey".as("a_key"), $"s_acctbal".as("a_bal"))
    val s2 = T.supplier(spark, sf).select($"s_suppkey".as("b_key"), $"s_acctbal".as("b_bal"))
    val naive = s1.join(s2, $"a_bal" < $"b_bal" && $"b_bal" - $"a_bal" < lit(100.0))
      .select($"a_key", $"b_key")
    val gate = SparkEntry.queries("j5_band_join")(spark, sf)
    assert(gate.exceptAll(naive).isEmpty && naive.exceptAll(gate).isEmpty,
      "bucketed band join diverged from the naive theta join")
    assert(naive.count() > 0, "degenerate fixture: no band matches")
  }

  test("intervalOverlapJoin equals the naive theta join, exactly once per pair") {
    import spark.implicits._
    val a = T.orders(spark, sf).limit(300)
      .select($"o_orderkey".as("a_key"), $"o_orderdate".as("a_s"),
        ($"o_orderdate" + expr("INTERVAL 5 DAYS")).as("a_e"))
    val b = T.orders(spark, sf).limit(500)
      .select($"o_orderkey".as("b_key"),
        ($"o_orderdate" + expr("INTERVAL 2 DAYS")).as("b_s"),
        ($"o_orderdate" + expr("INTERVAL 9 DAYS")).as("b_e"))
    val naive = a.join(b, $"a_s" < $"b_e" && $"b_s" < $"a_e")
      .select($"a_key", $"b_key")
    val bucketed = SkewUtils.intervalOverlapJoin(
      a, "a_s", "a_e", b, "b_s", "b_e", 3L * 86400)
      .select($"a_key", $"b_key")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed overlap join diverged from the naive theta join")
    // greatest-start bucket rule: each overlapping pair emitted exactly once
    assert(naive.count() == bucketed.count(),
      "overlap pairs duplicated or dropped by the bucket decomposition")
    assert(naive.count() > 0, "degenerate fixture: no overlaps")
  }

  test("r6 plan shapes: p9 recursion, j11 lateral, j12 overlap, x27 top-k") {
    // p9: a real iterative recursion (UnionLoop), not a flattened union
    val p9 = SparkEntry.queries("p9_recursive_cte")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p9.contains("UnionLoop"), s"recursive CTE lost its loop:\n$p9")
    // j11: the lateral LIMIT must decorrelate to a window rank + equi
    // join — never a per-outer-row nested loop
    val j11 = SparkEntry.queries("j11_lateral_topn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!j11.contains("BroadcastNestedLoopJoin") && !j11.contains("CartesianProduct"),
      s"lateral top-n degraded to a nested loop:\n$j11")
    assert(j11.contains("Window"), s"lateral top-n lost its window rewrite:\n$j11")
    // j12: bucket decomposition keeps the overlap join equi-shaped
    val j12 = SparkEntry.queries("j12_interval_overlap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!j12.contains("BroadcastNestedLoopJoin") && !j12.contains("CartesianProduct"),
      s"overlap join degraded to a quadratic join:\n$j12")
    // x27: global top-k over the n-gram space is per-partition heaps,
    // never a full sort
    val x27 = SparkEntry.queries("x27_ngram_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(x27.contains("TakeOrderedAndProject"),
      s"n-gram top-k plans a global sort:\n$x27")
  }

  test("x18/x19 plans never window the corpus without the range-partition pid") {
    // every windowspecdefinition in the two-pass plans must be keyed by the
    // partition id (the contiguous-slice guarantee) — a window over the raw
    // key alone (x18) or over nothing (x19) is the single-reducer shape the
    // primitives exist to avoid
    for (name <- Seq("x18_budget_sample", "x19_global_shuffle")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan.toString
      val windows = plan.split("windowspecdefinition\\(").drop(1)
      assert(windows.nonEmpty, s"$name lost its window stages")
      windows.foreach { w =>
        assert(w.contains("__pid"),
          s"$name has a window not keyed by __pid:\nwindowspecdefinition($w")
      }
    }
  }

  test("d3 equi-depth histogram ranks through __pid, never a global window") {
    val plan = SparkEntry.queries("d3_equidepth_histogram")(spark, sf)
      .queryExecution.optimizedPlan.toString
    val windows = plan.split("windowspecdefinition\\(").drop(1)
    assert(windows.nonEmpty, "d3 lost its ranking window")
    windows.foreach { w =>
      assert(w.contains("__pid"),
        s"d3 has a window not keyed by __pid:\nwindowspecdefinition($w")
    }
  }

  test("g4 triangle closure runs as broadcast joins, no shuffle of wedges") {
    val plan = SparkEntry.queries("g4_triangle_count")(spark, sf)
      .queryExecution.executedPlan.toString
    // final-stage plan only reaches back to the perNode checkpoint; the
    // wedge stages already ran during build — assert the query completed
    // with a broadcast in its lineage by rebuilding the unchecckpointed core
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = graft.Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val e = l.as("a").join(l.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
      .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .agg(count(lit(1)).as("n")).select($"u", $"v")
    val o = e.select($"u".as("src"), $"v".as("dst"), $"v".as("ddst"))
    val wedges = o.as("x").join(broadcast(o.as("y")),
        $"x.src" === $"y.src" && $"x.dst" < $"y.dst")
      .select($"x.dst".as("b"), $"y.dst".as("c"))
    val tri = wedges.join(
      broadcast(o.select((shiftleft($"src", 31) + $"dst").as("bc"))),
      (shiftleft($"b", 31) + $"c") === $"bc")
    val p = tri.queryExecution.executedPlan.toString
    val closure = p.indexOf("BroadcastHashJoin")
    assert(closure >= 0, s"wedge closure not broadcast:\n$p")
    val wedge = p.indexOf("BroadcastHashJoin", closure + 1)
    assert(wedge > closure, s"wedge generation not broadcast:\n$p")
    // the wedge stream between the two joins must be pipelined — an
    // exchange there means the O(sum outdeg^2) intermediate got shuffled
    assert(!p.substring(closure, wedge).contains("Exchange"),
      "wedge stream crosses a shuffle — the broadcast plan regressed")
  }

  test("p10 skyline: windows keyed by __pid, frontier joined broadcast") {
    // the skyline's prefix-min must run as the two-pass ranged form —
    // every window in the plan keyed by the range-partition pid (a window
    // over nothing is the single-reducer global sort the primitive
    // replaces) — and the tiny frontier must come back via broadcast
    val opt = SparkEntry.queries("p10_skyline")(spark, sf)
      .queryExecution.optimizedPlan.toString
    val windows = opt.split("windowspecdefinition\\(").drop(1)
    assert(windows.nonEmpty, "skyline lost its prefix-min window stages")
    windows.foreach { w =>
      assert(w.contains("__pid"),
        s"skyline has a window not keyed by __pid:\nwindowspecdefinition($w")
    }
    val phys = SparkEntry.queries("p10_skyline")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"skyline frontier join is not broadcast:\n$phys")
  }

  test("er1 entity resolution: every cluster roots at a clean record") {
    import spark.implicits._
    // corrupted records (rid >= 1000000) always have their source clean
    // record in-cluster (1 deletion => levenshtein 1 => an edge), so no
    // dirty record may ever be canonical and every cluster id must be a
    // clean rid — the keeper the pipeline would retain is always the
    // uncorrupted one
    val out = SparkEntry.queries("er1_entity_resolution")(spark, sf).cache()
    assert(out.filter($"rid" >= 1000000L && $"is_canonical").isEmpty,
      "a corrupted record became its cluster's canonical representative")
    assert(out.filter($"cluster" >= 1000000L).isEmpty,
      "a cluster is rooted at a corrupted record id")
    assert(out.filter($"rid" >= 1000000L).count() > 0,
      "degenerate fixture: no corrupted records generated")
    out.unpersist()
  }

  test("x18 budget is a per-source prefix: kept docs are closed under the hash order") {
    import spark.implicits._
    // for every kept doc, every doc of the same source earlier in the
    // (md5, id) order is also kept — the greedy-prefix property
    val kept = SparkEntry.queries("x18_budget_sample")(spark, sf)
      .select($"doc_id", $"source", md5($"doc_id".cast(StringType)).as("hk"))
    val all = T.documents(spark, sf)
      .select($"doc_id", $"source", md5($"doc_id".cast(StringType)).as("hk"))
    val violations = kept.as("k").join(all.as("a"), "source")
      .filter(col("a.hk") < col("k.hk") ||
        (col("a.hk") === col("k.hk") && col("a.doc_id") < col("k.doc_id")))
      .join(kept.select($"doc_id".as("a_id")),
        col("a.doc_id") === col("a_id"), "left_anti")
    assert(violations.isEmpty,
      "a doc earlier in the selection order was dropped while a later one was kept")
  }

  test("globalShuffleShards materializes as uniform partitioned output files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = T.documents(spark, sf).select($"doc_id")
    graft.Graft.globalShuffleShards(docs, "doc_id", 64)
      .select($"doc_id", $"shard")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val back = spark.read.parquet(dir)
    // partition-dir values read back with inferred (int) type
    val sizes = back.groupBy($"shard".cast("long")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.values.count(_ == 64) >= sizes.size - 1,
      s"non-uniform shards on disk: $sizes")
    assert(back.count() == docs.count())
    // partition pruning reaches the shard directories
    val plan = back.filter($"shard" === 0).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard filter not pruning partitions:\n$plan")
  }

  test("m6 chunk manifest emits zero chunks for an empty payload") {
    // regression: sequence(0, -1) yields [0, -1] in Spark, which once
    // produced two spurious chunks for empty text; the when() guard must
    // suppress them (oracle's range(0, 0) emits none)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("m6fix").toString
    Seq((1L, "", "en", "src0", 0L), (2L, "abcd", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = SparkEntry.queries("m6_chunk_manifest")(spark, dir).collect()
    assert(out.length == 1 && out.head.getLong(0) == 2L,
      s"expected one chunk for doc 2 only: ${out.mkString(",")}")
    assert(out.head.getLong(3) == 4L) // chunk_len
  }

  test("pointInIntervalJoin rejects a non-positive bucket width") {
    import spark.implicits._
    val df = T.orders(spark, sf).limit(1)
      .select($"o_orderkey", $"o_orderdate".as("s"),
        ($"o_orderdate" + expr("INTERVAL 1 DAY")).as("e"))
    intercept[IllegalArgumentException] {
      SkewUtils.pointInIntervalJoin(df.select($"s".as("p")), "p", df, "s", "e", 0)
    }
  }

  test("x19 shards are uniform fixed-size cuts of the shuffled order") {
    import spark.implicits._
    val out = SparkEntry.queries("x19_global_shuffle")(spark, sf)
    val sizes = out.groupBy($"shard").agg(count(lit(1)).as("n"))
      .orderBy($"shard").collect()
    sizes.dropRight(1).foreach(r => assert(r.getLong(1) == 64,
      s"non-final shard ${r.getLong(0)} has ${r.getLong(1)} rows"))
    assert(sizes.last.getLong(1) <= 64)
    // rank within a shard must be contiguous
    val bad = out.groupBy($"shard")
      .agg((max($"rk") - min($"rk") + 1).as("span"), count(lit(1)).as("n"))
      .filter($"span" =!= $"n")
    assert(bad.isEmpty, "shard ranks are not contiguous")
  }

  test("x22 PII scrub fires every category on every row and leaves no residue") {
    import spark.implicits._
    val out = SparkEntry.queries("x22_pii_redaction")(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // two planted emails, one phone, one 16-digit id per row — all counted,
    // all gone; the 'clean' invariant is re-asserted here independently of
    // the oracle's boolean
    assert(out.filter($"n_email" =!= 2 || $"n_phone" =!= 1 || $"n_id" =!= 1)
      .isEmpty, "planted PII was miscounted")
    assert(out.filter(!$"clean").isEmpty, "redacted text still matches a PII rule")
    assert(out.filter(!$"clean_text".contains("<EMAIL>") ||
      !$"clean_text".contains("<PHONE>") || !$"clean_text".contains("<ID>"))
      .isEmpty, "a category tag is missing from the redacted text")
    // order matters: the 16-digit account id must become one <ID>, never a
    // phone-rule fragment
    assert(out.filter($"clean_text".rlike("<PHONE>9|9<PHONE>")).isEmpty,
      "digit-run redaction was half-eaten by the phone rule")
    out.unpersist()
  }

  test("x23 boilerplate removal equals the naive explode-join-regroup form") {
    import spark.implicits._
    // sf0.01: the 20-distinct-docs threshold genuinely fires there (the
    // 50-doc sf0.001 corpus can't reach it)
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("x23_boilerplate")(spark, dir).cache()
    assert(out.agg(sum($"n_removed")).head.getLong(0) > 0,
      "boilerplate filter never fired — threshold/width no longer match the corpus")
    // naive form: explode to (doc, pos, seg), count distinct docs per seg,
    // join back, regroup in position order
    val segs = T.documents(spark, dir)
      .select($"doc_id", posexplode(expr(
        "transform(sequence(0, cast(ceil(size(split(trim(text), ' ')) / 2.0) as int) - 1), " +
          "i -> array_join(slice(split(trim(text), ' '), i * 2 + 1, 2), ' '))")))
      .toDF("doc_id", "pos", "seg")
    val nd = segs.groupBy($"seg").agg(countDistinct($"doc_id").as("nd"))
    val naive = segs.join(nd, "seg")
      .groupBy($"doc_id").agg(
        array_join(transform(array_sort(collect_list(
          when($"nd" < 20, struct($"pos", $"seg")))), x => x.getField("seg")), " ")
          .as("clean_text"),
        count(lit(1)).as("n_seg"),
        sum(when($"nd" >= 20, 1L).otherwise(0L)).as("n_removed"))
    assert(out.select("doc_id", "clean_text", "n_seg", "n_removed")
      .exceptAll(naive.select("doc_id", "clean_text", "n_seg", "n_removed"))
      .isEmpty, "broadcast-HOF plan diverged from the naive posting-list form")
    assert(out.count() == naive.count())
    out.unpersist()
  }
}
