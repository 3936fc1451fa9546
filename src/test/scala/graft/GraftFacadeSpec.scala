package graft

import org.apache.spark.sql.functions._

/** Equivalence: every facade operation must produce the same answers as the
  * corresponding oracle-checked registry query. */
class GraftFacadeSpec extends SparkTestBase {

  test("compactLatest equals the s6 compaction query") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val facade = Graft.compactLatest(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select($"user_id", $"event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gate = SparkEntry.queries("s6_compaction")(spark, sf)
      .select($"user_id", $"event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(facade == gate)
  }

  test("dedupExact keeps the same survivors as n1_exact_dedup") {
    val docs = Tables.documents(spark, sf)
    val facade = Graft.dedupExact(docs, "text", "doc_id")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val gate = SparkEntry.queries("n1_exact_dedup")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(facade == gate)
  }

  test("minhashLshPairs equals n2_minhash_lsh") {
    val docs = Tables.documents(spark, sf)
    val facade = Graft.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gate = SparkEntry.queries("n2_minhash_lsh")(spark, sf)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(facade == gate)
  }

  test("dedupClusters equals n6_dedup_clusters") {
    val docs = Tables.documents(spark, sf)
    val facade = Graft.dedupClusters(docs, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gate = SparkEntry.queries("n6_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(facade == gate)
  }

  test("repetitionRatio equals x13_repetition") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val facade = docs.select($"doc_id", round(Graft.repetitionRatio($"text"), 6).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gate = SparkEntry.queries("x13_repetition")(spark, sf)
      .select($"doc_id", $"rep_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(facade == gate)
  }

  test("contaminatedIds equals x14_decontamination") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val facade = Graft.contaminatedIds(
        docs.filter($"doc_id" >= 10), docs.filter($"doc_id" < 10), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gate = SparkEntry.queries("x14_decontamination")(spark, sf)
      .filter($"contaminated").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(facade == gate)
  }

  test("prepareTrainingCorpus composes gate, dedup, split and sharding coherently") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val out = Graft.prepareTrainingCorpus(docs, "doc_id", "text",
      minJaccard = 0.5, shardSize = 64)
    val rows = out.select($"doc_id", $"cluster", $"split", $"shard").collect()
    // one row per surviving doc, and every survivor passes the gate
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val gateIds = docs.filter(Graft.gopherKeep($"text"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(gateIds))
    // exactly one representative per near-dup cluster
    assert(rows.map(_.getLong(1)).distinct.length == rows.length,
      "two rows share a cluster — dedup kept more than the keeper")
    // deterministic end to end
    val again = Graft.prepareTrainingCorpus(docs, "doc_id", "text",
      minJaccard = 0.5, shardSize = 64)
      .select($"doc_id", $"cluster", $"split", $"shard").collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // all three splits materialize and shards are bounded
    val splits = rows.map(_.getString(2)).toSet
    assert(splits.contains("train") && splits.size >= 2, s"splits: $splits")
    val shardSizes = rows.groupBy(_.getLong(3)).map(_._2.length)
    assert(shardSizes.forall(_ <= 64))
  }

  test("connectedComponents equals the g3 gate labels") {
    import spark.implicits._
    val edges = operators.GraphQueries.coOccurrencePairs(Tables.lineitem(spark, sf))
      .filter($"n_orders" >= 2).select($"u", $"v")
    val facade = Graft.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gate = SparkEntry.queries("g3_connected_components")(spark, sf)
      .select($"node", $"comp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(facade == gate)
  }

  test("triangleCounts equals the g4 gate per-node counts") {
    import spark.implicits._
    val edges = operators.GraphQueries.coOccurrencePairs(Tables.lineitem(spark, sf))
      .select($"u", $"v")
    val facade = Graft.triangleCounts(edges)
      .orderBy($"tri".desc, $"node").limit(20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gate = SparkEntry.queries("g4_triangle_count")(spark, sf)
      .select($"node", $"tri").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(facade == gate)
  }

  test("gopherKeep equals the x17_gopher_quality keep column") {
    import spark.implicits._
    val facade = Tables.documents(spark, sf)
      .select($"doc_id", Graft.gopherKeep($"text").as("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val gate = SparkEntry.queries("x17_gopher_quality")(spark, sf)
      .select($"doc_id", $"keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(facade == gate)
    assert(facade.values.exists(identity) && facade.values.exists(!_),
      "degenerate fixture: gate does not discriminate")
  }

  test("budgetSample equals x18_budget_sample") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source",
      size(split(trim($"text"), "\\s+")).cast("long").as("n_toks"))
    val facade = Graft.budgetSample(docs, "source", "doc_id", "n_toks", 1000L)
      .select($"doc_id", $"__cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gate = SparkEntry.queries("x18_budget_sample")(spark, sf)
      .select($"doc_id", $"cum_toks").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(facade == gate)
  }

  test("globalShuffleShards equals x19_global_shuffle") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id")
    val facade = Graft.globalShuffleShards(docs, "doc_id", 64)
      .select($"doc_id", $"__rank", $"shard").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val gate = SparkEntry.queries("x19_global_shuffle")(spark, sf)
      .select($"doc_id", $"rk", $"shard").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(facade == gate)
  }

  test("datasetSplit equals x16_dataset_split and is key-deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val facade = Graft.datasetSplit(docs, "doc_id")
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gate = SparkEntry.queries("x16_dataset_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(facade == gate)
    // group-keyed variant: all members of a cluster share a split
    val clustered = Graft.dedupClusters(docs, "doc_id", "text", 0.5)
    val byCluster = Graft.datasetSplit(clustered, "cluster")
      .select($"cluster", $"split").distinct()
      .collect().groupBy(_.getLong(0))
    assert(byCluster.values.forall(_.length == 1), "a cluster straddled splits")
    // boundary fractions: train+val = 1.0 must leave test empty and val
    // non-empty (the naive "10000" hex threshold would send val to test)
    val edge = Graft.datasetSplit(docs, "doc_id", trainFrac = 0.75, valFrac = 0.25)
      .groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!edge.contains("test") && edge.contains("val"), s"boundary split wrong: $edge")
    // train = 1.0: everything lands in train
    val allTrain = Graft.datasetSplit(docs, "doc_id", trainFrac = 1.0, valFrac = 0.0)
      .select($"split").distinct().collect().map(_.getString(0)).toSeq
    assert(allTrain == Seq("train"), s"trainFrac=1.0 leaked: $allTrain")
  }

  test("saveTable persists through the catalog, not just a temp view") {
    import spark.implicits._
    val name = s"graft_cat_${System.nanoTime()}"
    try {
      Graft.saveTable(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), name)
      assert(spark.catalog.tableExists(name))
      // MANAGED (warehouse-backed), not a TEMPORARY view
      assert(spark.catalog.listTables().collect()
        .exists(t => t.name == name && t.tableType == "MANAGED"))
      // visible to a sibling session sharing the metastore (temp views are not)
      val sibling = spark.newSession()
      assert(sibling.table(name).count() == 2)
      // overwrite replaces content
      Graft.saveTable(Seq((3L, "c")).toDF("k", "v"), name)
      assert(spark.table(name).collect().map(_.getLong(0)).toSeq == Seq(3L))
    } finally Graft.dropTable(spark, name)
    assert(!spark.catalog.tableExists(name))
  }

  test("propagateMinLabels converges on a 200-node chain within the cap (pointer doubling)") {
    import spark.implicits._
    // a path graph of diameter 199: plain neighbor propagation needs ~199
    // rounds and would hit the 30-iteration cap (and now throws there);
    // pointer doubling must close it in O(log n) rounds
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val sym = edges.union(edges.select($"b".as("a"), $"a".as("b"))).localCheckpoint(true)
    val labels0 = spark.range(200).select($"id".as("__id"), $"id".as("__lbl"))
    val out = Graft.propagateMinLabels(labels0, sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 200 && out.values.forall(_ == 0L),
      s"chain did not collapse to one component: ${out.values.toSet}")
  }

  test("annTopK equals n5_ann_bruteforce") {
    val e = Tables.embeddings(spark, sf)
    val facade = Graft.annTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gate = SparkEntry.queries("n5_ann_bruteforce")(spark, sf)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(facade == gate)
  }

  test("asofJoinLatest equals j6_asof_join") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val facade = Graft.asofJoinLatest(
        purchases, "ts", "event_id", clicks, "ts", "click_id", "user_id", "click_id")
      .collect().map(r => r.getLong(1) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val gate = SparkEntry.queries("j6_asof_join")(spark, sf)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(facade == gate)
  }

  test("sessionize produces the same session count as t2_session_window") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val nFacade = Graft.sessionize(ev, "user_id", "ts", "event_id", 600L)
      .select($"user_id", $"session_id").distinct().count()
    val nGate = SparkEntry.queries("t2_session_window")(spark, sf).count()
    assert(nFacade == nGate)
  }

  test("fingerprint / tokenCount / qualityScore match the x-query outputs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val facade = docs.select($"doc_id", Graft.fingerprint($"text").as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gate = SparkEntry.queries("x4_fingerprint")(spark, sf)
      .select($"doc_id", $"fp").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(facade == gate)
    val q = docs.select(Graft.qualityScore($"text").as("q")).agg(sum($"q")).head.getDouble(0)
    val qGate = SparkEntry.queries("x2_quality")(spark, sf)
      .agg(sum(col("quality"))).head.getDouble(0)
    assert(q == qGate)
  }

  test("winnowedFingerprints: guaranteed recall at k+w-1, zero below k, density bound") {
    import spark.implicits._
    val words = (0 until 60).map(i => s"w$i")
    // doc 1 and 2 share an exact 11-word run (= k + w - 1 at k=8, w=4)
    // embedded at different offsets in otherwise-disjoint text
    val run = (100 until 111).map(i => s"s$i")
    val doc1 = (words.take(20) ++ run ++ words.slice(20, 35)).mkString(" ")
    val doc2 = (words.slice(35, 40).map(_ + "x") ++ run ++ words.slice(40, 60).map(_ + "y")).mkString(" ")
    // doc 3 shares only a 7-word run (< k) with doc 1 — never detected
    val doc3 = (run.take(7) ++ (200 until 230).map(i => s"t$i")).mkString(" ")
    val df = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
      .select($"doc_id", split(trim($"text"), "\\s+").as("toks"))
    val fps = Graft.winnowedFingerprints(df, "doc_id", "toks", 8, 4).cache()
    val a = fps.select($"doc_id".as("a"), $"gram")
    val b = fps.select($"doc_id".as("b"), $"gram")
    val pairs = a.join(b, "gram").filter($"a" < $"b")
      .select($"a", $"b").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "an 11-word shared run must surface: a full 4-gram window is shared, its min gram selected in both")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "a 7-word overlap is below k=8 and can never produce a shared 8-gram")
    // every window of w consecutive grams contains >= 1 fingerprint
    val byDoc = fps.collect().map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
    for ((id, ps) <- byDoc) {
      val sel = ps.map(_._2).sorted
      val gaps = sel.zip(sel.drop(1)).map { case (x, y) => y - x }
      assert(gaps.forall(_ <= 4), s"doc $id: no gap may exceed w=4, got ${gaps.max}")
    }
    fps.unpersist()
  }

  test("session() builder produces a configured session with registered functions") {
    val s = Graft.session()
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.sql("SELECT djb2_hash('abc')").head.getString(0) == "000000000b885c8b")
  }
}
