package graft

import graft.functions.{GraftCodec, GraftFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The user-facing library surface: every capability the query registry
  * verifies, exposed as composable operations over arbitrary DataFrames.
  * `SparkEntry.queries` is the oracle-checked contract; these are the same
  * code shapes parameterized by column — equivalence is pinned by
  * GraftFacadeSpec.
  */
object Graft {

  /** Opinionated session: AQE on, UTC, sane local shuffle fan-out, zstd
    * parquet — the M0 session from SURVEY.md §7. */
  def session(appName: String = "graft",
              master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    GraftFunctions.registerAll(s)
    operators.DmlFixture.allowDefaults(s) // ALTER ... DEFAULT on graft tables
    s
  }

  // ---------- catalog (persistent tables; filesys.hpp workspace analogue) ----------

  /** Persist a DataFrame as a catalog table in the session warehouse
    * (parquet; codec from the session conf — zstd under [[session]]),
    * replacing any prior version. Unlike temp views this survives the
    * session: the table is re-discoverable from the warehouse by any later
    * session with the same metastore. The catalog analogue of the
    * reference's sandboxed writefile workspace
    * (filesys.hpp:107-507). */
  def saveTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(name)

  /** Drop a persistent table (delfile/delfolder analogue). */
  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")

  // ---------- storage layout (S7: multi-dimensional clustering) ----------

  /** 16-bit Morton spread: a zero bit interleaved after every bit of the
    * low 16 bits of `v`. Pure long bit-twiddling — codegen'd, ANSI-safe
    * (every intermediate is masked well below overflow). */
  private def spread16(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-value (Morton order) of two columns, each linearly normalized to 16
    * bits against [lo, hi] bounds. Rows close on the z-curve are close in
    * BOTH dimensions — the clustering key behind multi-column file
    * skipping. */
  def zvalue(x: Column, xLo: Column, xHi: Column,
             y: Column, yLo: Column, yHi: Column): Column = {
    def norm(v: Column, lo: Column, hi: Column): Column =
      least(floor((v.cast(DoubleType) - lo.cast(DoubleType)) /
        (hi.cast(DoubleType) - lo.cast(DoubleType) + lit(1e-9)) * 65536.0),
        lit(65535.0)).cast(LongType)
    spread16(norm(x, xLo, xHi))
      .bitwiseOR(shiftleft(spread16(norm(y, yLo, yHi)), 1))
  }

  /** Write `df` clustered by the z-order of (cx, cy) into ~nFiles files.
    * Column bounds are one tiny aggregate broadcast back (never a
    * collect); repartitionByRange on the z-value gives each output file a
    * narrow rectangle in BOTH dimensions, so parquet min/max footer stats
    * skip files for selective predicates on EITHER column — the layout a
    * single-column sort can only provide for its own column. At 100 TB the
    * unit of skipping is the file/row-group; this writer is what makes
    * those stats tight. */
  /** Append `zCol` = the z-value of (cx, cy) normalized against the
    * frame's own min/max bounds (one tiny aggregate broadcast back, never
    * a collect). Shared by [[zorderWrite]] and the store's
    * `optimize(zorder_by)` so the bounds/interleave recipe has one home. */
  def withZValue(df: DataFrame, cx: String, cy: String, zCol: String): DataFrame = {
    val bounds = df.agg(
      min(col(cx)).as("__xlo"), max(col(cx)).as("__xhi"),
      min(col(cy)).as("__ylo"), max(col(cy)).as("__yhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(zCol, zvalue(col(cx), col("__xlo"), col("__xhi"),
        col(cy), col("__ylo"), col("__yhi")))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  def zorderWrite(df: DataFrame, cx: String, cy: String,
                  path: String, nFiles: Int): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    withZValue(df, cx, cy, "__z")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  // ---------- topic / log operations (S6, the "Pulsar" core) ----------

  /** Latest row per key over an append log — topic compaction. Aggregation
    * form (max_by over an order struct): partial-aggregates map-side, never
    * sorts whole partitions. `orderCols` must be a total order for a
    * deterministic survivor. */
  def compactLatest(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val order = struct(orderCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, order).as("__last"))
      .select(col("__last.*"))
  }

  // ---------- dedup (N1/N2) ----------

  /** Exact dedup by content: keeps the row with the minimum `keepBy` per
    * distinct content hash. */
  def dedupExact(df: DataFrame, contentCol: String, keepBy: String): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(md5(col(contentCol)).as("__h"))
      .agg(min_by(payload, col(keepBy)).as("__keep"))
      .select(col("__keep.*"))
  }

  /** Distinct 3-gram word-shingle hashes of a text column (the dedup
    * signature input). Degenerate docs (< 3 tokens) have no 3-gram
    * shingles → empty array; near-dup pipelines filter them out, which
    * also prevents all such docs from colliding into one LSH band bucket
    * at scale. */
  def shingleHashes(text: Column): Column = {
    val toks = transform(split(trim(text), " "), t => xxhash64(t))
    val n = size(toks)
    when(n >= 3,
      array_distinct(zip_with(
        zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2),
          (a, b) => xxhash64(a, b)),
        slice(toks, lit(3), n - 2),
        (ab, c) => xxhash64(ab, c))))
      .otherwise(typedLit(Seq.empty[Long]))
  }

  /** Distinct word n-gram hashes (64-bit) of a pre-split token array;
    * rows with fewer than n tokens yield an empty array. The shared gram
    * construction behind [[contaminatedIds]], the x14 decontamination and
    * x20 source-overlap gate queries. */
  def wordGramHashes(toks: Column, n: Int): Column = {
    val sz = size(toks)
    when(sz >= n,
      array_distinct(transform(sequence(lit(1), sz - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(n)))))))
      .otherwise(typedLit(Seq.empty[Long]))
  }

  /** Winnowed k-gram fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * "Winnowing: Local Algorithms for Document Fingerprinting") — the
    * scalable stand-in for suffix-array exact substring dedup over a
    * training corpus. Per document: build word k-grams, hash each (md5 —
    * an engine-portable total order), and in every window of `w`
    * consecutive grams select the minimal hash(es). Returned rows:
    * (id, pos, gram).
    *
    * Contract (the all-argmin winnowing variant — every position whose
    * hash is minimal in SOME covering window is selected; md5 makes
    * in-window ties vanishingly rare, and a tie selects both, which only
    * adds fingerprints):
    *  - RECALL: any exact shared word run of >= k + w - 1 words between
    *    two documents contains a full window of w shared grams in both;
    *    that window's minimal gram is identical in both documents and is
    *    selected in both — guaranteed detection. Runs of k..k+w-2 words
    *    are detected opportunistically; runs under k words never.
    *  - PRECISION: candidates join on the gram TEXT itself (not its
    *    hash), so every reported shared fingerprint is an exact shared
    *    k-word substring — no false positives.
    *  - DENSITY: expected 2/(w+1) of all grams are selected, so the
    *    posting list is ~2/(w+1) the size of the full gram set.
    *
    * Scale shape: winnowing is per-document local (window partitioned by
    * the high-cardinality doc id over bounded-length docs — skew-free);
    * detection is a posting-list equi-join on the selected grams, the
    * same derived-key shape as the rest of the dedup stack. No pairwise
    * scan anywhere. */
  def winnowedFingerprints(df: DataFrame, idCol: String, toksCol: String,
                           k: Int, w: Int): DataFrame = {
    // Two window passes, no self-join. Pass 1: minw[e] = min hash of the
    // window ending at e. Pass 2: since minw[e] <= h[p] for every window
    // covering p, position p is an argmin of SOME covering window iff
    // h[p] == max(minw[e] for e in [p, p+w-1]) — proven equal to the
    // direct all-argmin join form in the n7 prototype.
    val toks = col(toksCol)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val grams = df
      .select(col(idCol), posexplode(
        when(size(toks) >= k,
          transform(sequence(lit(1), size(toks) - (k - 1)),
            i => concat_ws(" ", slice(toks, i, lit(k)))))
          .otherwise(typedLit(Seq.empty[String]))))
      .toDF(idCol, "pos", "gram")
      .withColumn("h", md5(col("gram")))
    grams
      .withColumn("minw", min(col("h")).over(win.rowsBetween(-(w - 1), 0)))
      .withColumn("best", max(col("minw")).over(win.rowsBetween(0, w - 1)))
      .filter(col("h") === col("best"))
      .select(col(idCol), col("pos"), col("gram"))
  }

  /** Near-duplicate pairs by MinHash-LSH with exact-Jaccard rescoring.
    * Returns (a, b, jaccard) with a < b. `numHashes` must be divisible by
    * `bands`. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      minJaccard: Double, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val rows = bands.ensuring(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / rows
    // two-stage projection: the hashed token array materializes once as an
    // attribute before shingling references it three times — inlining
    // shingleHashes directly would expand the split+transform subtree ~6×
    // in a projection the HOFs keep out of codegen (same shape as the gate
    // query's docShingles)
    val n = size(col("__toks"))
    val sets = df
      .select(col(idCol).as("__id"),
        transform(split(trim(col(textCol)), " "), t => xxhash64(t)).as("__toks"))
      .filter(n >= 3)
      .select(col("__id"),
        array_distinct(zip_with(
          zip_with(slice(col("__toks"), lit(1), n - 2), slice(col("__toks"), lit(2), n - 2),
            (a, b) => xxhash64(a, b)),
          slice(col("__toks"), lit(3), n - 2),
          (ab, c) => xxhash64(ab, c))).as("__sh"))
      .cache()
    val sig = sets.withColumn("__sig", GraftFunctions.minhash_signature(col("__sh"), numHashes))
    val banded = sig.select(col("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("__id", "__band", "__bh")
    val cand = banded.groupBy(col("__band"), col("__bh"))
      .agg(collect_list(col("__id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "filter(flatten(transform(ids, x -> transform(ids, y -> struct(x AS a, y AS b)))), p -> p.a < p.b)"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
    cand
      .join(sets.select(col("__id").as("a"), col("__sh").as("__sha")), "a")
      .join(sets.select(col("__id").as("b"), col("__sh").as("__shb")), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("__sha"), col("__shb"))).cast(DoubleType) /
          (size(col("__sha")) + size(col("__shb")) -
            size(array_intersect(col("__sha"), col("__shb"))))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Min-label propagation to fixpoint over an undirected edge set
    * (__id, __lbl) given symmetric `edges` (a, b). Shared by
    * [[dedupClusters]] and the n6 gate query.
    *
    * Scale discipline: each iteration `localCheckpoint`s the new labels
    * (truncating lineage — without it the plan doubles every round) and
    * unpersists the previous iteration, so at most the edges + two label
    * snapshots are ever materialized. Convergence is O(log diameter), not
    * O(diameter): besides neighbor labels, each round also folds in the
    * label *of* the current label (pointer doubling — label paths halve
    * every iteration). Hitting the cap with changes still pending throws:
    * silently returning partial clusters would be a wrong answer.
    */
  def propagateMinLabels(labels0: DataFrame, edges: DataFrame, maxIters: Int = 30): DataFrame = {
    var labels = labels0.localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0) {
      if (iter >= maxIters)
        throw new IllegalStateException(
          s"label propagation did not converge in $maxIters iterations ($changed labels still moving)")
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("__id", "b").withColumnRenamed("__lbl", "__nl"), "b")
        .groupBy(col("a").as("__id")).agg(min(col("__nl")).as("__minn"))
      // pointer doubling: my label's current label
      val viaParent = labels.as("l1")
        .join(labels.select(col("__id").as("__lbl"), col("__lbl").as("__pl")), Seq("__lbl"), "left")
      val next = viaParent.join(viaNeighbors, Seq("__id"), "left")
        .select(col("__id"), col("__lbl").as("__old"),
          least(col("__lbl"),
            coalesce(col("__minn"), col("__lbl")),
            coalesce(col("__pl"), col("__lbl"))).as("__lbl"))
        .localCheckpoint(true) // materializes: the only pass over the join
      changed = next.filter(col("__lbl") =!= col("__old")).count() // on checkpointed rows
      val prev = labels
      labels = next.select(col("__id"), col("__lbl"))
      prev.unpersist()
      iter += 1
    }
    labels
  }

  /** Near-dup cluster assignment: connected components over the
    * `minhashLshPairs` graph via [[propagateMinLabels]] (distributed,
    * lineage-checkpointed, O(log diameter) rounds). Returns
    * (id, cluster, is_keeper) for every row; keep `is_keeper` rows to
    * deduplicate a corpus. */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String,
                    minJaccard: Double): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, minJaccard).select(col("a"), col("b"))
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b"))).localCheckpoint(true)
    val labels0 = df.select(col(idCol).as("__id"), col(idCol).as("__lbl"))
    propagateMinLabels(labels0, edges)
      .select(col("__id").as(idCol), col("__lbl").as("cluster"),
        (col("__id") === col("__lbl")).as("is_keeper"))
  }

  /** Connected components over an undirected edge set (u, v) via
    * large-star/small-star edge rewriting — the O(log n)-round, 100 TB CC
    * (see [[operators.GraphQueries.ccLargeSmallStar]]). Returns
    * (node, comp) with comp = the component's minimum node id. Use
    * [[propagateMinLabels]] when you already hold per-node labels to seed;
    * use this when you hold edges. `maxRounds` bounds the rewriting
    * rounds (the O(log n) contraction makes 25 enough for any graph with
    * < 2^25-diameter components; raise it for pathological inputs). */
  def connectedComponents(edges: DataFrame, uCol: String = "u",
                          vCol: String = "v", maxRounds: Int = 25): DataFrame = {
    val (labels, converged) = operators.GraphQueries.ccLargeSmallStar(
      edges.select(col(uCol).as("u"), col(vCol).as("v")), maxRounds)
    require(converged,
      s"connected components did not converge within $maxRounds rounds")
    labels
  }

  /** Per-node triangle participation counts (node, tri, deg) over an
    * undirected canonical edge set — degree-oriented wedge closure with a
    * size-switched edge-list broadcast (see
    * [[operators.GraphQueries.triangleCounts]]). */
  def triangleCounts(edges: DataFrame, uCol: String = "u",
                     vCol: String = "v",
                     broadcastEdges: Option[Boolean] = None): DataFrame =
    operators.GraphQueries.triangleCounts(
      edges.select(col(uCol).as("u"), col(vCol).as("v")), broadcastEdges)

  /** SimHash near-dup pairs: (a, b, hamming) with hamming <= maxHamming.
    *
    * Candidate generation bands the 64-bit signature into maxHamming+1
    * contiguous chunks: two signatures within the threshold differ in at
    * most maxHamming bit positions, so by pigeonhole at least one chunk is
    * bit-identical and the pair surfaces in that chunk's equi-join bucket.
    * Recall is therefore exact (every qualifying pair is returned), not
    * probabilistic. Requires maxHamming in [0, 31] so every chunk keeps
    * >= 2 discriminating bits. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    val nChunks = maxHamming + 1
    val base = 64 / nChunks
    val rem = 64 % nChunks
    val widths = Array.tabulate(nChunks)(i => if (i < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val sig = df.select(col(idCol).as("__id"),
      GraftFunctions.simhash64(split(trim(col(textCol)), " ")).as("__sig"))
    val chunkArr = array((0 until nChunks).map { i =>
      val mask = if (widths(i) >= 64) lit(-1L) else lit((1L << widths(i)) - 1L)
      shiftrightunsigned(col("__sig"), offsets(i)).bitwiseAND(mask)
    }: _*)
    val chunks = sig.select(col("__id"), col("__sig"), posexplode(chunkArr))
      .toDF("__id", "__sig", "__cid", "__chunk")
    chunks.as("x").join(chunks.as("y"),
        col("x.__cid") === col("y.__cid") && col("x.__chunk") === col("y.__chunk") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"),
        bit_count(col("x.__sig").bitwiseXOR(col("y.__sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------- similarity search (N3) ----------

  /** Exact top-k cosine neighbors of each query vector (queries broadcast;
    * scales in corpus size for bounded query sets). */
  def annTopK(candidates: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qe"))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("__ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", GraftFunctions.cosine_sim(col("__qe"), col("__ce")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("cid"), col("cos"))
  }

  /** Deterministic pseudo-random *Gaussian* hyperplane component (j, k) of
    * LSH table `table`: Box-Muller over two FNV-1a-derived uniforms — no
    * RNG, identical across runs/executors. Gaussian (rotation-invariant)
    * components matter: cube-uniform components skew the sign-collision
    * probability for structured vectors (measured on the test corpus: a
    * cos-0.45 pair agreed on only 12% of cube-uniform planes vs the ~65%
    * the sign-LSH theory predicts; Gaussian planes restore the theory and
    * took multi-table recall from ~0.55 to >= 0.9). */
  private[graft] def hyperplane(table: Int, j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { k =>
      val h1 = GraftCodec.fnv1a64(s"plane:$table:$j:$k:u1".getBytes("UTF-8"))
      val h2 = GraftCodec.fnv1a64(s"plane:$table:$j:$k:u2".getBytes("UTF-8"))
      val u1 = ((h1 >>> 11) + 1).toDouble / ((1L << 53) + 1).toDouble // (0, 1]
      val u2 = (h2 >>> 11).toDouble / (1L << 53).toDouble            // [0, 1)
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }

  /** Sign-bit LSH bucket of a float-vector column in table `table`. */
  private[graft] def lshBucket(vec: Column, table: Int, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { j =>
      val p = typedLit(hyperplane(table, j, dim).toSeq)
      val dot = aggregate(zip_with(vec, p, (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One bucket id per LSH table, as an array column. */
  private[graft] def lshBuckets(vec: Column, tables: Int, planesPerTable: Int, dim: Int): Column =
    array((0 until tables).map(t => lshBucket(vec, t, planesPerTable, dim)): _*)

  /** Approximate top-k cosine neighbors via multi-table hyperplane LSH:
    * candidates = union over `tables` sign-bucket tables, exact cosine
    * rescore, top-k per query. One bucket equi-join + one embedding join —
    * no corpus cross join. Recall is probabilistic; with the defaults it
    * measures >= 0.9 recall@3 on the test corpus at every sf (vs 0.13 for
    * the old single-table 8-plane form). At larger corpora raise
    * `planesPerTable` ~ log2(n) to keep buckets small. */
  def annLshTopK(candidates: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 tables: Int = 16, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val qb = queries.select(col(idCol).as("qid"), posexplode(lshBuckets(col(vecCol), tables, planesPerTable, dim)))
      .toDF("qid", "__t", "__bk")
    val cb = candidates.select(col(idCol).as("cid"), posexplode(lshBuckets(col(vecCol), tables, planesPerTable, dim)))
      .toDF("cid", "__t", "__bk")
    val cand = cb.join(broadcast(qb), Seq("__t", "__bk"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid")).distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    cand
      .join(broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("__qe"))), "qid")
      .join(candidates.select(col(idCol).as("cid"), col(vecCol).as("__ce")), "cid")
      .withColumn("cos", GraftFunctions.cosine_sim(col("__qe"), col("__ce")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("cid"), col("cos"))
  }

  /** Deterministic distributed k-means (Lloyd) centroids for an IVF index.
    * Seeds are the `k` vectors with the smallest md5(id) — hash-spread over
    * the corpus, reproducible, uncorrelated with insertion order. Each
    * iteration assigns every vector to its max-cosine centroid (broadcast
    * join + max_by, partial-combined map-side) and recomputes centroids as
    * the element-wise mean — summed in integer micro-units so the result
    * is bit-stable under partition reordering and task retries (a plain
    * double sum is order-sensitive). Per iteration the big side shuffles
    * once into k×dim groups; centroids are localCheckpoint'ed so lineage
    * stays flat. Cells that lose all members drop out (the probe side
    * simply never routes to them). */
  def kmeansCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 2): DataFrame = {
    val v = vectors.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val wSeed = Window.orderBy(col("__hk"), col("__vid"))
    var cents = v
      .withColumn("__hk", md5(col("__vid").cast(StringType)))
      .orderBy(col("__hk"), col("__vid")).limit(k)
      .withColumn("__cent", (row_number().over(wSeed) - 1).cast(LongType))
      .select(col("__cent"), col("__v").as("__cv"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val assigned = v.crossJoin(broadcast(cents))
        .withColumn("__sim", GraftFunctions.cosine_sim(col("__v"), col("__cv")))
        .groupBy(col("__vid"))
        .agg(first(col("__v")).as("__v"),
          max_by(col("__cent"), struct(col("__sim"), -col("__cent"))).as("__cell"))
      cents = assigned
        .select(col("__cell"), posexplode(col("__v")))
        .toDF("__cell", "__pos", "__x")
        .groupBy(col("__cell"), col("__pos"))
        .agg(sum(round(col("__x") * 1e6).cast(LongType)).as("__s"),
          count(lit(1)).as("__n"))
        .withColumn("__m",
          (col("__s").cast(DoubleType) / col("__n") / 1e6).cast(FloatType))
        .groupBy(col("__cell"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m")).as("__cv"))
        .select(col("__cell").as("__cent"), col("__cv"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Approximate top-k cosine neighbors via IVF: coarse-quantize the corpus
    * to its `nCells` nearest-centroid cells (centroids from
    * [[kmeansCentroids]] — `kmeansIters` deterministic Lloyd rounds; 0
    * falls back to the raw hash-spread seeds), probe the `nProbe` nearest
    * cells per query, exact rescore inside them. Assignment is a broadcast
    * join + max_by aggregate (partial-combines map-side); the probe join
    * touches ~nProbe/nCells of the corpus.
    *
    * Recall honesty note: the synthetic test embeddings are near-uniform on
    * the sphere (no cosine cluster structure — every k-means cell holds all
    * 10 labels), so ANY coarse quantizer's recall is bounded by roughly the
    * probed corpus fraction × a small locality factor (~1.5 measured).
    * With the defaults (probe 8 of 16 cells) recall@5 measures 0.76-0.88
    * across sfs. An earlier revision seeded centroids with the first
    * nCells ids, which overlapped the gate query's query set — the 0.92
    * recall it measured was query-as-centroid leakage, not quantizer
    * quality. On a real clustered corpus the locality factor, and hence
    * recall at small probe fractions, is far higher. */
  def annIvfTopK(candidates: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 nCells: Int = 16, nProbe: Int = 8, kmeansIters: Int = 2): DataFrame = {
    val cents = kmeansCentroids(candidates, idCol, vecCol, nCells, kmeansIters)
    val assigned = candidates.select(col(idCol).as("cid"), col(vecCol).as("__ce"))
      .crossJoin(broadcast(cents))
      .withColumn("__csim", GraftFunctions.cosine_sim(col("__ce"), col("__cv")))
      .groupBy(col("cid"))
      .agg(first(col("__ce")).as("__ce"),
        max_by(col("__cent"), struct(col("__csim"), -col("__cent"))).as("__cell"))
    val wP = Window.partitionBy(col("qid")).orderBy(col("__csim").desc, col("__cent"))
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("__qe"))
      .crossJoin(broadcast(cents))
      .withColumn("__csim", GraftFunctions.cosine_sim(col("__qe"), col("__cv")))
      .withColumn("__rn", row_number().over(wP))
      .filter(col("__rn") <= nProbe)
      .select(col("qid"), col("__qe"), col("__cent").as("__cell"))
    val wT = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    assigned.join(broadcast(probes), "__cell")
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", GraftFunctions.cosine_sim(col("__qe"), col("__ce")))
      .withColumn("__rn", row_number().over(wT))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("cid"), col("cos"))
  }

  /** Near-duplicate pairs by embedding cosine >= minCos, via multi-table
    * LSH buckets + exact rescore — the production (100 TB) variant of the
    * n4 all-pairs cross-check: one bucket self-join instead of a corpus²
    * cross join. Probabilistic recall (measures >= 0.9 at the defaults on
    * the test corpus); the exact rescore keeps precision at 1. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double,
                         tables: Int = 16, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val b = df.select(col(idCol).as("__id"), posexplode(lshBuckets(col(vecCol), tables, planesPerTable, dim)))
      .toDF("__id", "__t", "__bk")
    val cand = b.as("x").join(b.as("y"),
        col("x.__t") === col("y.__t") && col("x.__bk") === col("y.__bk") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b")).distinct()
    cand
      .join(df.select(col(idCol).as("a"), col(vecCol).as("__va")), "a")
      .join(df.select(col(idCol).as("b"), col(vecCol).as("__vb")), "b")
      .withColumn("cos", GraftFunctions.cosine_sim(col("__va"), col("__vb")))
      .filter(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus with
    * deterministic k-means, then inside each cluster drop every document
    * that has a smaller-id neighbor at cosine >= tau (the canonical
    * keep-the-min greedy — deterministic, retry-stable, no iteration).
    * Returns (id, cell, kept).
    *
    * Scale shape: the quadratic step is confined WITHIN a cell — cells are
    * sized by choosing nCells ≈ corpus/targetCellSize (e.g. ~100k docs per
    * cell at 100 TB), so the pairwise pass is n×cellSize, not n². The
    * cluster assignment is one broadcast-centroids pass (map-side); the
    * in-cell pair join shuffles once on the cell id. For tighter cells at
    * extreme scale, compose: run [[int8Quantize]]d cosines in the pair
    * pass, or recurse k-means inside oversized cells. Paper: Abbas et al.
    * 2023, "SemDeDup" (arXiv:2303.09540) — public method, reimplemented
    * on Spark primitives. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    tau: Double, nCells: Int = 16, kmeansIters: Int = 2): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, nCells, kmeansIters)
    val assigned = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__csim", GraftFunctions.cosine_sim(col("__v"), col("__cv")))
      .groupBy(col("__id"))
      .agg(first(col("__v")).as("__v"),
        max_by(col("__cent"), struct(col("__csim"), -col("__cent"))).as("__cell"))
    // drop b iff some same-cell a < b sits within tau — one in-cell join,
    // keys (cell), bounded by cell size
    val dropped = assigned.as("x").join(assigned.as("y"),
        col("x.__cell") === col("y.__cell") && col("x.__id") < col("y.__id") &&
        GraftFunctions.cosine_sim(col("x.__v"), col("y.__v")) >= tau)
      .select(col("y.__id").as("__id")).distinct()
    assigned.join(dropped.withColumn("__drop", lit(true)), Seq("__id"), "left")
      .select(col("__id").as("id"), col("__cell").as("cell"),
        not(coalesce(col("__drop"), lit(false))).as("kept"))
  }

  /** Symmetric per-vector int8 quantization: scale = 127/max|x|, element =
    * round(x*scale). Cosine between two quantized vectors needs no
    * dequantization — the two scales cancel in the dot/norms ratio — so the
    * scan path is pure integer math over arrays 4× smaller than float32. */
  def int8Quantize(vec: Column): Column = {
    val scale = lit(127.0) / greatest(array_max(transform(vec, x => abs(x))), lit(1e-30))
    transform(vec, x => round(x * scale).cast(IntegerType))
  }

  /** Approximate top-k cosine neighbors over int8-quantized embeddings:
    * rank all candidates by quantized cosine (integer dot / integer norms
    * — scales cancel, see [[int8Quantize]]), keep k×oversample per query,
    * exact-rescore only those with float cosine, return the top-k.
    *
    * Scale shape: the first pass streams the 4×-smaller int8 corpus — at
    * 100 TB of float32 embeddings that is the difference between spilling
    * and fitting the working set in executor memory, and the integer
    * multiply-add vectorizes. The float vectors are touched only for the
    * k×oversample survivors per query (a semi-joined fraction of the
    * corpus). Orthogonal to the bucketing variants: inside annIvfTopK's
    * probed cells or annLshTopK's buckets the same quantized-filter +
    * exact-rescore applies. Kept brute-force here so the gate measures
    * quantization loss alone (recall@5 vs exact measures 1.0 on the test
    * corpus; int8 rank error only matters for pairs closer than ~1e-2 in
    * cosine, and the oversample window absorbs it). */
  def annQuantizedTopK(candidates: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       oversample: Int = 4): DataFrame = {
    def sqNorm(v: Column): Column =
      aggregate(transform(v, x => (x * x).cast(LongType)), lit(0L), (acc, x) => acc + x)
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("__ce"))
      .withColumn("__cq", int8Quantize(col("__ce")))
      .withColumn("__cn", sqNorm(col("__cq")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qe"))
      .withColumn("__qq", int8Quantize(col("__qe")))
      .withColumn("__qn", sqNorm(col("__qq")))
    val dot = aggregate(zip_with(col("__qq"), col("__cq"), (a, b) => (a * b).cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val wQ = Window.partitionBy(col("qid")).orderBy(col("__cosq").desc, col("cid"))
    val wX = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("__cosq", dot / sqrt((col("__qn") * col("__cn")).cast(DoubleType)))
      .withColumn("__rn", row_number().over(wQ))
      .filter(col("__rn") <= k * oversample)
      .withColumn("cos", GraftFunctions.cosine_sim(col("__qe"), col("__ce")))
      .withColumn("__rn2", row_number().over(wX))
      .filter(col("__rn2") <= k)
      .select(col("qid"), col("cid"), col("cos"))
  }

  // ---------- temporal (J6 / T2) ----------

  /** As-of join: for each left row, attach `rightVal` of the latest right
    * row with the same key and rightTs <= leftTs. Equal-timestamp right
    * rows tie-break by `rightId` (max id wins — the later-written record);
    * right rows at the same ts as a left row sort before it (<= semantics).
    * Linear union+window form — no pairwise blowup. */
  def asofJoinLatest(left: DataFrame, leftTs: String, leftId: String,
                     right: DataFrame, rightTs: String, rightVal: String,
                     key: String, rightId: String): DataFrame = {
    val ridType = right.schema(rightId).dataType
    val l = left.select(col(key), col(leftTs).as("__ts"),
      col(leftId).as("__lid"), lit(null).cast(right.schema(rightVal).dataType).as("__rv"),
      lit(null).cast(ridType).as("__rid"), lit(1).as("__kind"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
      lit(null).cast(left.schema(leftId).dataType).as("__lid"),
      col(rightVal).as("__rv"), col(rightId).as("__rid"), lit(0).as("__kind"))
    // order: ts, then right rows before left rows at equal ts, then right id
    // (left rows have null __rid: nulls_first keeps them stable after kind)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__kind"), col("__rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(col(key), col("__lid").as(leftId), col("__last").as(rightVal))
  }

  /** As-of join with a staleness tolerance — the feature-store freshness
    * contract: each left row gets the latest right row at-or-before its
    * timestamp, but only if that row is no older than `toleranceSeconds`;
    * a staler (or absent) match yields nulls. (The latest at-or-before row
    * either satisfies the tolerance or nothing does — earlier rows are
    * older still — so one carried struct decides.) Same linear
    * union+window shape as [[asofJoinLatest]]: one shuffle on the key, no
    * pairwise candidate blowup. Output: key, leftId, rightVal (null when
    * stale/absent), asof_age_us (microseconds; null likewise). */
  def asofJoinWithin(left: DataFrame, leftTs: String, leftId: String,
                     right: DataFrame, rightTs: String, rightVal: String,
                     key: String, rightId: String,
                     toleranceSeconds: Long): DataFrame = {
    val mType = StructType(Seq(
      StructField("t", right.schema(rightTs).dataType),
      StructField("v", right.schema(rightVal).dataType)))
    val ridType = right.schema(rightId).dataType
    val l = left.select(col(key), col(leftTs).as("__ts"),
      col(leftId).as("__lid"), lit(null).cast(mType).as("__m"),
      lit(null).cast(ridType).as("__rid"), lit(1).as("__kind"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
      lit(null).cast(left.schema(leftId).dataType).as("__lid"),
      struct(col(rightTs).as("t"), col(rightVal).as("v")).as("__m"),
      col(rightId).as("__rid"), lit(0).as("__kind"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__kind"), col("__rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolUs = toleranceSeconds * 1000000L
    r.unionByName(l)
      .withColumn("__last", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .withColumn("__age_us",
        unix_micros(col("__ts")) - unix_micros(col("__last.t")))
      .select(col(key), col("__lid").as(leftId),
        when(col("__age_us") <= tolUs, col("__last.v")).as(rightVal),
        when(col("__age_us") <= tolUs, col("__age_us")).as("asof_age_us"))
  }

  /** Gap-based sessionization: adds session_id (per-key ordinal) using the
    * same >= gap semantics as session_window. */
  def sessionize(df: DataFrame, key: String, ts: String, tieBreak: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val newSession = when(lag(col(ts), 1).over(w).isNull ||
      col(ts).cast(LongType) - lag(col(ts), 1).over(w).cast(LongType) >= gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  // ---------- text analysis (N4) ----------

  /** Normalized-content fingerprint (lowercase, alnum-collapsed, md5). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** Fraction of duplicated 3-grams in a text column (0 = no repetition;
    * docs with < 3 tokens score 0) — the boilerplate/template-spam quality
    * signal, as in the x13 gate query. */
  def repetitionRatio(text: Column): Column = {
    val toks = transform(split(trim(text), " "), t => xxhash64(t))
    val n = size(toks)
    val grams = zip_with(
      zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2),
        (a, b) => xxhash64(a, b)),
      slice(toks, lit(3), n - 2),
      (ab, c) => xxhash64(ab, c))
    when(n >= 3,
      lit(1.0) - size(array_distinct(grams)).cast(DoubleType) / (n - 2))
      .otherwise(0.0)
  }

  /** Quality score in [0,1]: length band + stopword-ratio evidence. */
  def qualityScore(text: Column): Column = {
    val toks = split(trim(text), " ")
    val nTok = size(toks)
    val nStop = size(filter(toks, t =>
      t.isin("the", "a", "of", "and", "to", "in", "is", "on")))
    when(nTok.between(5, 1000), 0.5).otherwise(0.0) +
      when(nStop.cast(DoubleType) / nTok > 0.05, 0.5).otherwise(0.0)
  }

  /** n-gram overlap decontamination: ids of `corpus` rows sharing at least
    * one distinct word n-gram with any `benchmark` row, with the overlap
    * count — the eval-leakage scrub before training. Posting-list equi-join
    * on 64-bit gram hashes: candidates only where grams actually collide,
    * no pairwise scan; the benchmark side is typically small but is NOT
    * broadcast-hinted (AQE decides). Rows shorter than n tokens have no
    * n-grams and cannot be flagged. */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
                      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol).as("__id"), split(trim(col(textCol)), " ").as("__toks"))
        .select(col("__id"), explode(wordGramHashes(col("__toks"), n)).as("__gram"))
    val benchGrams = grams(benchmark).select(col("__gram")).distinct()
    grams(corpus).join(benchGrams, "__gram")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Gopher-style hard quality gate over a text column: token-count band,
    * mean-token-length band, stopword floor, distinct-token-ratio floor —
    * a boolean column (true = keep). Pure projection; pair with
    * [[qualityScore]] (the soft score) when ranking instead of gating.
    * Same rules as the x17 gate query. */
  def gopherKeep(text: Column,
                 minTokens: Int = 30, maxTokens: Int = 70,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 7.0,
                 minStopwords: Int = 2, minDistinctRatio: Double = 0.5): Column = {
    val toks = split(trim(text), " ")
    val n = size(toks)
    val charSum = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    val meanLen = round(charSum.cast(DoubleType) / n, 6)
    val nStop = size(filter(toks, t =>
      t.isin("the", "a", "of", "and", "to", "in", "is", "on")))
    val distinctRatio = round(size(array_distinct(toks)).cast(DoubleType) / n, 6)
    n.between(minTokens, maxTokens) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      nStop >= minStopwords &&
      distinctRatio >= minDistinctRatio
  }

  /** Per-source token-budget sampling: keep each `keyCol` group's prefix —
    * in deterministic md5(`idCol`) order — until the running `weightCol`
    * total exceeds `budget` (the domain-capping step that reshapes a
    * training mix when one source dominates). Selection is a pure function
    * of ids, so it is reproducible across engines, runs, retries and
    * cluster sizes. The running total uses the keyed two-pass prefix sum
    * ([[operators.SkewUtils.rangedCumSumByKey]]): no single reducer ever
    * holds a whole source. Adds `__cum` (the running total) and keeps only
    * rows with `__cum <= budget`. */
  def budgetSample(df: DataFrame, keyCol: String, idCol: String,
                   weightCol: String, budget: Long,
                   numPartitions: Int = 32): DataFrame = {
    val keyed = df.withColumn("__hk", md5(col(idCol).cast(StringType)))
    operators.SkewUtils.rangedCumSumByKey(keyed, Seq(keyCol), Seq("__hk", idCol),
        weightCol, numPartitions, "__cum")
      .filter(col("__cum") <= budget)
      .drop("__hk")
  }

  /** Deterministic global shuffle + fixed-size shard assignment: orders
    * rows by md5(id:salt) (reproducible "random" order, uncorrelated with
    * content) and cuts the order into `shardSize`-row shards — the final
    * pre-training materialization step (write with `partitionBy("shard")`
    * for uniform output files). The global rank is the two-pass
    * [[operators.SkewUtils.rangedCumSum]] over a constant 1, never a
    * single-reducer `row_number() over (order by ...)`. Adds
    * `__shuffle_key`, `__rank` (1-based) and `shard`. */
  def globalShuffleShards(df: DataFrame, idCol: String, shardSize: Int,
                          salt: String = "42", numPartitions: Int = 32): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val keyed = df
      .withColumn("__shuffle_key", md5(concat(col(idCol).cast(StringType), lit(":" + salt))))
      .withColumn("__one", lit(1L))
    operators.SkewUtils.rangedCumSum(keyed, Seq("__shuffle_key", idCol), "__one",
        numPartitions, "__rank")
      .withColumn("shard", floor((col("__rank") - 1) / shardSize).cast(LongType))
      .drop("__one")
  }

  /** Deterministic train/val/test assignment by md5 prefix of `keyCol`:
    * reproducible across engines, runs, retries and cluster sizes — the
    * split of a row is a pure function of its key. To prevent near-dup
    * leakage across splits, pass the cluster id from [[dedupClusters]] as
    * the key instead of the row id (every member of a near-dup cluster
    * lands in the same split). 16-bit threshold granularity. */
  def datasetSplit(df: DataFrame, keyCol: String,
                   trainFrac: Double = 0.75, valFrac: Double = 0.125): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      s"bad split fractions: train=$trainFrac val=$valFrac")
    // a fraction reaching 1.0 needs a threshold above every 4-hex-digit
    // string; "g" sorts after "ffff" lexicographically ("10000" would not)
    def thresh(frac: Double): String = {
      val t = math.round(frac * 65536).toInt
      if (t >= 65536) "g" else f"$t%04x"
    }
    val t1 = thresh(trainFrac)
    val t2 = thresh(trainFrac + valFrac)
    val keyHex = substring(md5(col(keyCol).cast(StringType)), 1, 4)
    df.withColumn("split",
      when(keyHex < t1, "train").when(keyHex < t2, "val").otherwise("test"))
  }

  /** End-to-end training-corpus preparation — the composed pipeline every
    * piece above exists for: quality-gate ([[gopherKeep]]), near-dup
    * cluster and keep one representative per cluster ([[dedupClusters]]),
    * assign leakage-safe train/val/test splits by CLUSTER key (near-dups
    * can never straddle splits, [[datasetSplit]]), then order by a
    * deterministic global shuffle and cut into fixed-size shards
    * ([[globalShuffleShards]]). Returns the surviving rows with `cluster`,
    * `split` and `shard` columns; materialize with
    * `write.partitionBy("split", "shard")`. Every step is a pure function
    * of row ids/content, so the whole corpus build is reproducible across
    * runs, retries and cluster sizes — and every step is a derived-key
    * groupBy/join or a two-pass rank, so no stage funnels the corpus
    * through one reducer. */
  def prepareTrainingCorpus(df: DataFrame, idCol: String, textCol: String,
                            minJaccard: Double = 0.8,
                            shardSize: Int = 1024): DataFrame = {
    val gated = df.filter(gopherKeep(col(textCol)))
    val keepers = gated.join(
      dedupClusters(gated, idCol, textCol, minJaccard)
        .filter(col("is_keeper")).select(col(idCol), col("cluster")),
      Seq(idCol))
    val split = datasetSplit(keepers, "cluster")
    globalShuffleShards(split, idCol, shardSize)
      .drop("__shuffle_key", "__rank")
  }

  // ---------- payload codecs (reference crypt/bytecode surface) ----------

  def lz4Compress(c: Column): Column = GraftFunctions.lz4_compress(c)
  def lz4Decompress(c: Column): Column = GraftFunctions.lz4_decompress(c)
  def zstdCompress(c: Column, level: Int = 3): Column = GraftFunctions.zstd_compress(c, level)
  def zstdDecompress(c: Column): Column = GraftFunctions.zstd_decompress(c)
  def rsb1Decode(c: Column): Column = GraftFunctions.rsb1_decode(c)
  def djb2(c: Column): Column = GraftFunctions.djb2_hash(c)
}
