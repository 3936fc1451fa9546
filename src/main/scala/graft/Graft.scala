package graft

import graft.functions.GraftFunctions
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
      .getOrCreate()
    GraftFunctions.registerAll(s)
    s
  }

  // ---------- topic / log operations (S6, the "Pulsar" core) ----------

  /** Latest row per key over an append log — topic compaction. Aggregation
    * form (max_by over an order struct): partial-aggregates map-side, never
    * sorts whole partitions. `orderCols` must be a total order for a
    * deterministic survivor. */
  def compactLatest(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val order = struct(orderCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, order).as("__last"))
      .select(col("__last.*"))
  }

  // ---------- dedup (N1/N2) ----------

  /** Exact dedup by content: keeps the row with the minimum `keepBy` per
    * distinct content hash. */
  def dedupExact(df: DataFrame, contentCol: String, keepBy: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(md5(col(contentCol)).as("__h"))
      .agg(min_by(payload, col(keepBy)).as("__keep"))
      .select(col("__keep.*"))
  }

  /** Distinct 3-gram word-shingle hashes of a text column (the dedup
    * signature input). */
  def shingleHashes(text: Column): Column = {
    val toks = transform(split(trim(text), " "), t => xxhash64(t))
    val n = size(toks)
    when(n >= 3,
      array_distinct(zip_with(
        zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2),
          (a, b) => xxhash64(a, b)),
        slice(toks, lit(3), n - 2),
        (ab, c) => xxhash64(ab, c))))
      .otherwise(array(xxhash64(concat_ws(" ", toks))))
  }

  /** Near-duplicate pairs by MinHash-LSH with exact-Jaccard rescoring.
    * Returns (a, b, jaccard) with a < b. `numHashes` must be divisible by
    * `bands`. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      minJaccard: Double, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val rows = bands.ensuring(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / rows
    val sets = df.select(col(idCol).as("__id"), shingleHashes(col(textCol)).as("__sh")).cache()
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

  /** Near-dup cluster assignment: connected components over the
    * `minhashLshPairs` graph via iterative min-label propagation (one
    * join+aggregate per iteration, distributed; converges in component
    * diameter steps). Returns (id, cluster, is_keeper) for every row;
    * keep `is_keeper` rows to deduplicate a corpus. */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String,
                    minJaccard: Double): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, minJaccard).select(col("a"), col("b"))
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b"))).cache()
    var labels = df.select(col(idCol).as("__id"), col(idCol).as("__lbl")).cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("__id", "b").withColumnRenamed("__lbl", "__nl"), "b")
        .groupBy(col("a").as("__id")).agg(min(col("__nl")).as("__minn"))
      val next = labels.join(viaNeighbors, Seq("__id"), "left")
        .select(col("__id"), least(col("__lbl"), coalesce(col("__minn"), col("__lbl"))).as("__lbl"))
        .cache()
      changed = next.join(labels.withColumnRenamed("__lbl", "__old"), "__id")
        .filter(col("__lbl") =!= col("__old")).count()
      labels = next
      iter += 1
    }
    labels.select(col("__id").as(idCol), col("__lbl").as("cluster"),
      (col("__id") === col("__lbl")).as("is_keeper"))
  }

  /** SimHash near-dup pairs: (a, b, hamming) with hamming <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val sig = df.select(col(idCol).as("__id"),
      GraftFunctions.simhash64(split(trim(col(textCol)), " ")).as("__sig"))
    val chunkArr = array((0 to 3).map(c =>
      shiftrightunsigned(col("__sig"), c * 16).bitwiseAND(lit(0xffffL))): _*)
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

  // ---------- temporal (J6 / T2) ----------

  /** As-of join: for each left row, attach `rightVal` of the latest right
    * row with the same key and rightTs <= leftTs (ties: right-before-left,
    * then max id order). Linear union+window form — no pairwise blowup. */
  def asofJoinLatest(left: DataFrame, leftTs: String, leftId: String,
                     right: DataFrame, rightTs: String, rightVal: String,
                     key: String): DataFrame = {
    val l = left.select(col(key), col(leftTs).as("__ts"),
      col(leftId).as("__lid"), lit(null).cast(right.schema(rightVal).dataType).as("__rv"),
      lit(1).as("__kind"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
      lit(null).cast(left.schema(leftId).dataType).as("__lid"),
      col(rightVal).as("__rv"), lit(0).as("__kind"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__kind"), coalesce(col("__rv"), col("__lid")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(col(key), col("__lid").as(leftId), col("__last").as(rightVal))
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

  /** Quality score in [0,1]: length band + stopword-ratio evidence. */
  def qualityScore(text: Column): Column = {
    val toks = split(trim(text), " ")
    val nTok = size(toks)
    val nStop = size(filter(toks, t =>
      t.isin("the", "a", "of", "and", "to", "in", "is", "on")))
    when(nTok.between(5, 1000), 0.5).otherwise(0.0) +
      when(nStop.cast(DoubleType) / nTok > 0.05, 0.5).otherwise(0.0)
  }

  // ---------- payload codecs (reference crypt/bytecode surface) ----------

  def lz4Compress(c: Column): Column = GraftFunctions.lz4_compress(c)
  def lz4Decompress(c: Column): Column = GraftFunctions.lz4_decompress(c)
  def zstdCompress(c: Column, level: Int = 3): Column = GraftFunctions.zstd_compress(c, level)
  def zstdDecompress(c: Column): Column = GraftFunctions.zstd_decompress(c)
  def rsb1Decode(c: Column): Column = GraftFunctions.rsb1_decode(c)
  def djb2(c: Column): Column = GraftFunctions.djb2_hash(c)
}
