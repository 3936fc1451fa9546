package graft.operators

import graft.{GraftQuery, Tables => T}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N1/N2 dedup operators over `documents` (SURVEY.md §2.2): exact
  * content-hash dedup, MinHash+LSH near-dup, SimHash near-dup, exact n-gram
  * Jaccard. The LSH pipeline is pure groupBy/join on derived keys — no
  * driver-side state — so the same plan runs at 100 TB: signatures are one
  * narrow projection, banding multiplies rows ×32 but each band bucket is
  * tiny, and the exact rescore touches only candidate pairs.
  *
  * Reference analogue: content-addressed script identity (getscripthash,
  * script.hpp:40-133); everything beyond that is the BASELINE.json
  * north-star LLM-pipeline surface.
  */
object DedupQueries {

  /** (doc_id, sh: array<bigint>) — distinct 3-gram word shingles per doc,
    * as 64-bit hashes. Degenerate docs (< 3 tokens, incl. empty) have no
    * 3-gram shingles and are pre-filtered — same semantics as the DuckDB
    * oracle (whose unnest emits nothing for them), and it removes the
    * scale hazard of every empty doc colliding into one giant LSH band
    * bucket (quadratic pair expansion among them).
    *
    * Two-stage projection on purpose: tokenization materializes once as an
    * attribute (CollapseProject won't inline a non-cheap alias used many
    * times), then shingling is a single zip_with pass over three shifted
    * slices of per-token hashes, composed with xxhash64 — no per-index
    * element_at, no split re-evaluation, no intermediate shingle strings
    * (the element_at form cost ~10s at sf0.1). Downstream set ops
    * (jaccard intersections, posting-list joins) run on longs; a 64-bit
    * collision among ~260k distinct shingles (p ≈ 2e-9) is the accepted
    * trade for that. */
  def docShingles(s: SparkSession, d: String): DataFrame =
    shingleSets(T.documents(s, d))

  /** The shingle pipeline over any (doc_id, text) frame — shared by the
    * standard corpus and derived fixtures (n3b's boilerplate-planted one). */
  def shingleSets(docs: DataFrame): DataFrame = {
    val n = size(col("toks"))
    docs
      .select(col("doc_id"),
        transform(split(trim(col("text")), " "), t => xxhash64(t)).as("toks"))
      .filter(n >= 3)
      .select(col("doc_id"),
        array_distinct(zip_with(
          zip_with(slice(col("toks"), lit(1), n - 2), slice(col("toks"), lit(2), n - 2),
            (a, b) => xxhash64(a, b)),
          slice(col("toks"), lit(3), n - 2),
          (ab, c) => xxhash64(ab, c))).as("sh"))
  }

  /** Exact Jaccard on shingle-set pairs given (a, b) candidate pairs. */
  private def rescore(s: SparkSession, cand: DataFrame, sets: DataFrame, minJ: Double): DataFrame = {
    import s.implicits._
    cand
      .join(sets.select($"doc_id".as("a"), $"sh".as("sha")), "a")
      .join(sets.select($"doc_id".as("b"), $"sh".as("shb")), "b")
      .select($"a", $"b",
        size(array_intersect($"sha", $"shb")).as("isz"),
        size($"sha").as("na"), size($"shb").as("nb"))
      .withColumn("jaccard", $"isz".cast(DoubleType) / ($"na" + $"nb" - $"isz"))
      .filter($"jaccard" >= minJ)
      .select($"a", $"b", $"jaccard")
      .orderBy($"a", $"b")
  }

  /** The DuckDB-side exact pair query (shared by n2 and n3: the LSH result
    * must equal the exhaustive one at this threshold). */
  private val exactPairsSql = """
    WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, s FROM t,
           unnest([w[i] || '_' || w[i+1] || '_' || w[i+2] for i in range(1, len(w) - 1)]) AS u(s)),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
    SELECT a, b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM inter JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
    ORDER BY a, b"""

  /** The planted boilerplate hazard shared by the df-cap gates: an
    * identical footer appended to EVERY document, whose shingles reach
    * df = corpus size. */
  private val Footer =
    " graft corpus footer all rights reserved do not redistribute this document"

  private def footeredDocs(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), concat(col("text"), lit(Footer)).as("text"))

  /** Exact Jaccard over DOCUMENT-FREQUENCY-CAPPED shingles: shingles in
    * more than half the corpus drop BEFORE the posting self-join (the
    * boilerplate quadratic-hot-key guard), per-doc sizes recomputed on
    * the survivors. Shared production core of n3b and n6b. */
  private def dfCappedPairScores(docs: DataFrame): DataFrame = {
    val ex = shingleSets(docs)
      .select(col("doc_id"), explode(col("sh")).as("sval"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // df per shingle (sets are per-doc distinct, so count = doc count);
    // the 1-row corpus total rides a crossJoin, never a collect
    val keptKeys = ex.groupBy(col("sval")).agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .filter(col("df") <= col("n_docs") * 0.5)
      .select(col("sval"))
    val kept = ex.join(keptKeys, "sval")
    val sz = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    kept.as("x").join(kept.as("y"),
        col("x.sval") === col("y.sval") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("isz"))
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .withColumn("jaccard",
        col("isz").cast(DoubleType) / (col("na") + col("nb") - col("isz")))
  }

  /** DuckDB mirror of [[dfCappedPairScores]] over [[footeredDocs]] — the
    * shared CTE prefix of the n3b/n6b oracles (ends at `inter`). */
  private val dfCapPairCtes = """
      WITH t AS (SELECT doc_id, str_split(trim(text ||
             ' graft corpus footer all rights reserved do not redistribute this document'),
             ' ') AS w FROM documents),
      sh AS (SELECT DISTINCT doc_id, s FROM t,
             unnest([w[i] || '_' || w[i+1] || '_' || w[i+2] for i in range(1, len(w) - 1)]) AS u(s)),
      dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
      kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfq USING (s)
               WHERE dfq.df <= 0.5 * (SELECT COUNT(*) FROM documents)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
      inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
                FROM kept x JOIN kept y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2)"""

  val queries: Seq[GraftQuery] = Seq(

    // ----- N1: exact dedup by content hash — keep min doc_id per hash
    GraftQuery("n1_exact_dedup", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select($"doc_id", $"n_copies")
        .orderBy($"doc_id")
    }, Some("""
      SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY doc_id"""), bench = true),

    // ----- N2: MinHash(128) + LSH (32 bands × 4 rows) + exact rescore.
    // P(miss) at j=0.8 is (1-0.8^4)^32 ≈ 5e-8, and the corpus has no pairs
    // in (0.14, 0.8), so the LSH output provably equals the exhaustive
    // exact-Jaccard pairs ≥ 0.5 that the oracle computes.
    GraftQuery("n2_minhash_lsh", (s, d) => {
      import s.implicits._
      val sets = docShingles(s, d).cache()
      val sig = sets.withColumn("sig", minhash_signature($"sh", 128))
      // one shuffle: group docs per (band, hash) bucket, expand pairs
      // inside each bucket (buckets are tiny by construction), then a
      // cheap distinct over the few thousand candidate pairs — instead of
      // a two-sided self-join that shuffles the banded rows twice
      val bands = sig.select($"doc_id",
          posexplode(transform(sequence(lit(0), lit(31)),
            b => hash(slice($"sig", b * 4 + 1, lit(4))))))
        .toDF("doc_id", "band_id", "band_hash")
      val buckets = bands.groupBy($"band_id", $"band_hash")
        .agg(collect_list($"doc_id").as("ids"))
        .filter(size($"ids") > 1)
      val cand = buckets
        .select(explode(expr(
          "filter(flatten(transform(ids, x -> transform(ids, y -> struct(x AS a, y AS b)))), p -> p.a < p.b)"))
          .as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
        .distinct()
      rescore(s, cand, sets, 0.5)
    }, Some(exactPairsSql), bench = true),

    // ----- N2 cross-check: exhaustive n-gram Jaccard via shingle equi-join
    // (the posting-list join form — candidates only where shingles collide)
    GraftQuery("n3_ngram_jaccard", (s, d) => {
      import s.implicits._
      // posting-list form: intersection sizes fall out of the shingle
      // equi-join (count per pair); the per-doc size table joins WITHOUT a
      // broadcast hint (one row per doc = unbounded at corpus scale — AQE
      // broadcasts it only while it is actually small); no per-pair array
      // materialization, so the exhaustive pass scales with collision count
      val sets = docShingles(s, d).cache()
      val sz = sets.select($"doc_id", size($"sh").as("n"))
      val ex = sets.select($"doc_id", explode($"sh").as("s"))
      val inter = ex.as("x").join(ex.as("y"),
          col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("isz"))
      inter
        .join(sz.select($"doc_id".as("a"), $"n".as("na")), "a")
        .join(sz.select($"doc_id".as("b"), $"n".as("nb")), "b")
        .withColumn("jaccard", $"isz".cast(DoubleType) / ($"na" + $"nb" - $"isz"))
        .filter($"jaccard" >= 0.5)
        .select($"a", $"b", $"jaccard")
        .orderBy($"a", $"b")
    }, Some(exactPairsSql)),

    // ----- N3b: the exact posting-list join with a DOCUMENT-FREQUENCY
    // cap — the guard the exact paths need at corpus scale. A shingle
    // occurring in k docs emits k² pairs from the equi self-join, so one
    // boilerplate stop-phrase shared by every document (license footers,
    // crawl banners) turns the exact path quadratic on a hot key. The cap
    // drops shingles with df > 50% of the corpus BEFORE the join — pair
    // cost then scales with the df-bounded posting lists, and the
    // exact-Jaccard contract holds on the SURVIVING grams (per-doc sizes
    // recomputed post-cap, which is the semantics a dedup pipeline wants:
    // boilerplate shared by everyone is evidence of nothing). The gate
    // PLANTS the hazard — an identical footer appended to every doc — and
    // the DuckDB mirror applies the identical cap, so the hash match
    // proves both the bounded plan and the capped semantics.
    GraftQuery("n3b_ngram_jaccard_dfcap", (s, d) => {
      import s.implicits._
      dfCappedPairScores(footeredDocs(s, d))
        .filter($"jaccard" >= 0.5)
        .select($"a", $"b", $"jaccard")
        .orderBy($"a", $"b")
    }, Some(dfCapPairCtes + """
      SELECT a, b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
      FROM inter JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
      ORDER BY a, b""")),

    // ----- N6: near-dup clusters — connected components over the exact
    // pair graph by iterative min-label propagation (each iteration is one
    // join + aggregate; converges in diameter steps; all distributed, no
    // driver-side graph). Output: every document with its cluster id (the
    // min doc_id of its component; singletons keep their own id) and
    // whether it is the cluster's keeper.
    GraftQuery("n6_dedup_clusters", (s, d) => {
      import s.implicits._
      val sets = docShingles(s, d).cache()
      val sz = sets.select($"doc_id", size($"sh").as("n"))
      val ex = sets.select($"doc_id", explode($"sh").as("shingle"))
      val inter = ex.as("x").join(ex.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("isz"))
      val pairs = inter
        .join(sz.select($"doc_id".as("a"), $"n".as("na")), "a")
        .join(sz.select($"doc_id".as("b"), $"n".as("nb")), "b")
        .filter($"isz".cast(DoubleType) / ($"na" + $"nb" - $"isz") >= 0.5)
        .select($"a", $"b")
      val edges = pairs.union(pairs.select($"b".as("a"), $"a".as("b"))).localCheckpoint(true)
      // min-label propagation to fixpoint: checkpointed, pointer-doubled,
      // throws rather than returning partial clusters (Graft.scala).
      // Labels seed from ALL documents (docShingles drops shingle-less
      // docs, but every doc must appear in the cluster table)
      val labels0 = T.documents(s, d).select($"doc_id".as("__id"), $"doc_id".as("__lbl"))
      graft.Graft.propagateMinLabels(labels0, edges)
        .select($"__id".as("doc_id"), $"__lbl".as("cluster"),
          ($"__id" === $"__lbl").as("is_keeper"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS w FROM documents),
      sh AS (SELECT DISTINCT doc_id, s FROM t,
             unnest([w[i] || '_' || w[i+1] || '_' || w[i+2] for i in range(1, len(w) - 1)]) AS u(s)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
      p AS (SELECT a, b FROM inter
            JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
      e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      rec AS (
        WITH RECURSIVE reach(d, r) AS (
          SELECT a, a FROM e
          UNION
          SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.d)
        SELECT d, MIN(r) AS cluster FROM reach GROUP BY d)
      SELECT doc_id,
        COALESCE(rec.cluster, doc_id) AS cluster,
        doc_id = COALESCE(rec.cluster, doc_id) AS is_keeper
      FROM documents LEFT JOIN rec ON documents.doc_id = rec.d
      ORDER BY doc_id""")),

    // ----- N6b: the PRODUCTION cluster pipeline at corpus scale — the
    // df cap composed with pair-graph construction and min-label
    // clustering, end to end. n6 is the exact-definition companion (raw
    // posting join — quadratic on a hot shingle, fine as a definition,
    // not as the 100 TB path); this is the path a real corpus runs:
    // boilerplate-df-capped shingles → bounded posting join → exact
    // Jaccard on surviving grams → connected components. The gate plants
    // the quadratic hazard (identical footer on EVERY doc) and the DuckDB
    // mirror applies the identical cap + recursive-CTE clustering, so the
    // hash match proves the capped pipeline clusters exactly as defined.
    GraftQuery("n6b_dedup_clusters_dfcap", (s, d) => {
      import s.implicits._
      val pairs = dfCappedPairScores(footeredDocs(s, d))
        .filter($"jaccard" >= 0.5)
        .select($"a", $"b")
      val edges = pairs.union(pairs.select($"b".as("a"), $"a".as("b")))
        .localCheckpoint(true)
      val labels0 = T.documents(s, d)
        .select($"doc_id".as("__id"), $"doc_id".as("__lbl"))
      graft.Graft.propagateMinLabels(labels0, edges)
        .select($"__id".as("doc_id"), $"__lbl".as("cluster"),
          ($"__id" === $"__lbl").as("is_keeper"))
        .orderBy($"doc_id")
    }, Some(dfCapPairCtes + """,
      p AS (SELECT a, b FROM inter
            JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
      e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      rec AS (
        WITH RECURSIVE reach(dd, r) AS (
          SELECT a, a FROM e
          UNION
          SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.dd)
        SELECT dd, MIN(r) AS cluster FROM reach GROUP BY dd)
      SELECT doc_id,
        COALESCE(rec.cluster, doc_id) AS cluster,
        doc_id = COALESCE(rec.cluster, doc_id) AS is_keeper
      FROM documents LEFT JOIN rec ON documents.doc_id = rec.dd
      ORDER BY doc_id""")),

    // ----- N2b: SimHash near-dup (hamming ≤ 8 over 64-bit signatures).
    // Production path: Graft.simhashPairs bands into maxHamming+1 = 9
    // chunks, so recall is exact by pigeonhole — which makes the operator
    // invariant-checkable: an all-pairs brute-force companion (oracle-check
    // only — quadratic, never the production path) recomputes the
    // qualifying pairs and the query emits soundness/completeness booleans
    // plus the corpus size. The signature itself is engine-specific (exact
    // vectors in GraftExpressionsSpec), so the oracle asserts the invariants
    // and recomputes only n_docs.
    GraftQuery("n2_simhash", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val lsh = graft.Graft.simhashPairs(docs, "doc_id", "text", 8)
        .select($"a", $"b", $"hamming".as("h_lsh"))
      val sig = docs.select($"doc_id", simhash64(split(trim($"text"), " ")).as("sig"))
      val exact = sig.as("x").crossJoin(sig.as("y"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("h_ex"))
        .filter($"h_ex" <= 8)
      lsh.join(exact, Seq("a", "b"), "full_outer")
        .agg(
          coalesce(sum(when($"h_ex".isNull, 1).otherwise(0)), lit(0)).as("n_spurious"),
          coalesce(sum(when($"h_lsh".isNull, 1).otherwise(0)), lit(0)).as("n_missed"),
          coalesce(sum(when($"h_lsh" =!= $"h_ex", 1).otherwise(0)), lit(0)).as("n_mismatch"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
        .select($"n_docs",
          ($"n_spurious" === 0).as("sound_ok"),
          ($"n_missed" === 0).as("complete_ok"),
          ($"n_mismatch" === 0).as("dist_ok"))
    }, Some("""
      SELECT COUNT(*) AS n_docs, TRUE AS sound_ok, TRUE AS complete_ok,
        TRUE AS dist_ok
      FROM documents""")),

    // ----- N7: paragraph-level exact substring dedup — the suffix-array
    // "dedup training data" op as winnowed k-gram fingerprints
    // (Graft.winnowedFingerprints; Schleimer et al. SIGMOD'03). k=8 words,
    // w=4: any exact shared run of >= 11 words between two docs is
    // GUARANTEED to surface (both docs select the same minimal gram of a
    // fully-shared window); runs of 8-10 words surface opportunistically;
    // under 8 never. Candidates join on the gram text itself, so every
    // reported pair shares an exact 8-word substring — zero false
    // positives. The oracle recomputes the identical two-pass winnowing
    // (min-hash per backward window, then argmin-membership via the
    // forward max of window minima — equality proven in the prototype).
    GraftQuery("n7_substring_dedup", (s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select($"doc_id", split(trim($"text"), "\\s+").as("toks"))
      val fps = graft.Graft.winnowedFingerprints(toks, "doc_id", "toks", 8, 4)
      val a = fps.select($"doc_id".as("doc_a"), $"gram")
      val b = fps.select($"doc_id".as("doc_b"), $"gram")
      a.join(b, "gram").filter($"doc_a" < $"doc_b")
        .groupBy($"doc_a", $"doc_b")
        .agg(countDistinct($"gram").as("n_shared_fp"))
        .orderBy($"doc_a", $"doc_b")
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM documents),
      g AS (SELECT doc_id, CAST(i AS INT) AS pos,
              array_to_string(w[i+1:i+8], ' ') AS gram
            FROM t, unnest(range(0, greatest(len(w) - 7, 0))) AS u(i)),
      w1 AS (SELECT doc_id, pos, gram, md5(gram) AS h,
               MIN(md5(gram)) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS minw FROM g),
      w2 AS (SELECT doc_id, pos, gram, h,
               MAX(minw) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS best FROM w1),
      fps AS (SELECT doc_id, pos, gram FROM w2 WHERE h = best)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(COUNT(DISTINCT a.gram) AS BIGINT) AS n_shared_fp
      FROM fps a JOIN fps b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2 ORDER BY doc_a, doc_b""")),

    // ----- N8: semantic dedup (SemDeDup, Abbas et al. 2023) over the
    // embeddings corpus — k-means cells, then drop any doc with a
    // smaller-id same-cell neighbor at cosine >= tau. The cell assignment
    // is not SQL-expressible, so the gate re-derives the operator's two
    // defining properties in-query and the oracle asserts them:
    //   kept_separated — NO kept pair in the same cell sits at >= tau
    //     (the greedy's postcondition; sound + complete over kept docs);
    //   drops_justified — EVERY dropped doc has a smaller same-cell
    //     neighbor at >= tau (no over-dropping);
    // plus partition consistency (kept + dropped = corpus) and n_docs,
    // which the oracle recomputes exactly.
    GraftQuery("n8_semantic_dedup", (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d)
      val res = graft.Graft.semanticDedup(e, "vec_id", "embedding", tau = 0.45)
      val withV = res.join(
        e.select($"vec_id".as("id"), $"embedding".as("v")), "id")
      val kept = withV.filter($"kept")
      val badKept = kept.as("x").join(kept.as("y"),
          $"x.cell" === $"y.cell" && $"x.id" < $"y.id" &&
          cosine_sim($"x.v", $"y.v") >= 0.45)
        .agg(count(lit(1)).as("n_bad_kept"))
      val justified = withV.filter(!$"kept").as("y").join(withV.as("x"),
          $"x.cell" === $"y.cell" && $"x.id" < $"y.id" &&
          cosine_sim($"x.v", $"y.v") >= 0.45, "left_semi")
        .agg(count(lit(1)).as("n_justified"))
      val counts = res.agg(count(lit(1)).as("n_docs"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"kept", 0L).otherwise(1L)).as("n_dropped"))
      counts.crossJoin(badKept).crossJoin(justified)
        .select($"n_docs",
          ($"n_kept" + $"n_dropped" === $"n_docs").as("partition_ok"),
          ($"n_bad_kept" === 0).as("kept_separated"),
          ($"n_justified" === $"n_dropped").as("drops_justified"))
    }, Some("""
      SELECT COUNT(*) AS n_docs, TRUE AS partition_ok,
        TRUE AS kept_separated, TRUE AS drops_justified
      FROM embeddings""")),

    // ----- N9: fuzzy join via deletion neighborhoods (the SymSpell
    // candidate scheme): match corrupted strings to a reference list at
    // edit distance <= 1 WITHOUT a pairwise scan. Every string s maps to
    // its deletion neighborhood D(s) = {s} ∪ {s minus one char}; two
    // strings within edit distance 1 (insert/delete/substitute) always
    // share a neighborhood member, so candidates come from a plain
    // equi-join on the exploded neighborhood keys — |s|+1 derived keys per
    // row, one shuffle, linear at any scale — and an exact levenshtein
    // re-filter removes the (distance-2) collisions. The probe side is the
    // nation list deterministically corrupted (drop the (key mod len)-th
    // char; every 5th name kept exact), so both engines derive identical
    // fixtures and the oracle can afford the naive all-pairs form — the
    // hash match proves the neighborhood join loses no pair.
    GraftQuery("n9_fuzzy_join", (s, d) => {
      import s.implicits._
      def neighborhood(c: Column): Column = array_union(
        array(c),
        transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c) - i))))
      val named = T.nation(s, d).select($"n_nationkey", lower($"n_name").as("name"))
      val probes = named
        .withColumn("p", $"n_nationkey" % length($"name") + 1)
        .select($"n_nationkey".as("vkey"),
          when($"n_nationkey" % 5 === 0, $"name")
            .otherwise(concat($"name".substr(lit(1), $"p" - 1),
              $"name".substr($"p" + 1, length($"name") - $"p"))).as("variant"))
      val probeKeys = probes
        .select($"vkey", $"variant", explode(neighborhood($"variant")).as("nk"))
      val refKeys = named
        .select($"n_nationkey", $"name", explode(neighborhood($"name")).as("nk"))
      probeKeys.join(refKeys, "nk")
        .select($"vkey", $"variant", $"n_nationkey", $"name").distinct()
        .filter(levenshtein($"variant", $"name") <= 1)
        .select($"vkey", $"variant", $"n_nationkey".as("match_key"),
          $"name".as("match_name"),
          levenshtein($"variant", $"name").as("dist"))
        .orderBy($"vkey", $"match_key")
    }, Some("""
      WITH base AS (SELECT n_nationkey, lower(n_name) AS name FROM nation),
      v AS (SELECT n_nationkey AS vkey,
              CASE WHEN n_nationkey % 5 = 0 THEN name
                   ELSE substr(name, 1, p - 1) || substr(name, p + 1, len(name) - p)
              END AS variant
            FROM (SELECT n_nationkey, name,
                    n_nationkey % len(name) + 1 AS p FROM base))
      SELECT vkey, variant, n_nationkey AS match_key, name AS match_name,
        levenshtein(variant, name) AS dist
      FROM v CROSS JOIN base
      WHERE levenshtein(variant, name) <= 1
      ORDER BY vkey, match_key""")),

    // ----- ER1: entity resolution — the full record-linkage pipeline
    // (blocking → candidate match → transitive clustering → canonical
    // record), the operator that turns a pile of dirty catalog records
    // into entities. Fixture: part names (heavily duplicated — the same
    // entity naturally appears many times) plus deterministically
    // corrupted copies (one char deleted at a key-derived position, new
    // record ids in disjoint ranges). Pipeline, all derived-key:
    //   1. blocking — SymSpell delete-1 neighborhoods exploded to |s|+1
    //      keys per record, equi self-join (provably complete for edit
    //      distance <= 1: a substitution deletes to the same string on
    //      both sides, an insert/delete pair meets at the shorter string);
    //   2. match — exact levenshtein <= 1 re-filter on candidates only;
    //   3. cluster — symmetric edges into Graft.propagateMinLabels
    //      (checkpointed pointer-doubling, throws on non-convergence);
    //   4. canonical — min record id per cluster + cluster size join.
    // The DuckDB oracle is the naive quadratic form (all-pairs levenshtein
    // + recursive-CTE reachability), so the hash match proves the blocked
    // join loses no pair AND the clustering agrees component-for-component.
    GraftQuery("er1_entity_resolution", (s, d) => {
      import s.implicits._
      def neighborhood(c: Column): Column = array_union(
        array(c),
        transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c) - i))))
      def delAt(name: Column, p: Column): Column =
        concat(name.substr(lit(1), p - 1), name.substr(p + 1, length(name) - p))
      val base = T.part(s, d).filter($"p_partkey" % 5 === 0)
        .select($"p_partkey".as("k"), lower($"p_name").as("name"))
      val d1 = base.filter($"k" % 10 === 0)
        .select(($"k" + 1000000L).as("rid"),
          delAt($"name", $"k" % length($"name") + 1).as("name"))
      val d2 = base.filter($"k" % 20 === 0)
        .select(($"k" + 2000000L).as("rid"),
          delAt($"name", ($"k" * 7) % length($"name") + 1).as("name"))
      val recs = base.select($"k".as("rid"), $"name").union(d1).union(d2)
      val keys = recs.select($"rid", $"name", explode(neighborhood($"name")).as("nk"))
      val cand = keys.as("x").join(keys.as("y"),
          col("x.nk") === col("y.nk") && col("x.rid") < col("y.rid"))
        .select(col("x.rid").as("a"), col("x.name").as("na"),
          col("y.rid").as("b"), col("y.name").as("nb")).distinct()
        .filter(levenshtein($"na", $"nb") <= 1)
        .select($"a", $"b")
      val edges = cand.union(cand.select($"b".as("a"), $"a".as("b"))).localCheckpoint(true)
      val labels0 = recs.select($"rid".as("__id"), $"rid".as("__lbl"))
      val labeled = graft.Graft.propagateMinLabels(labels0, edges)
        .select($"__id".as("rid"), $"__lbl".as("cluster"))
      val sizes = labeled.groupBy($"cluster").agg(count(lit(1)).as("csize"))
      labeled.join(sizes, "cluster")
        .select($"rid", $"cluster", $"csize", ($"rid" === $"cluster").as("is_canonical"))
        .orderBy($"rid")
    }, Some("""
      WITH base AS (SELECT p_partkey AS k, lower(p_name) AS name FROM part
                    WHERE p_partkey % 5 = 0),
      d1 AS (SELECT k + 1000000 AS rid,
               substr(name, 1, p - 1) || substr(name, p + 1, len(name) - p) AS name
             FROM (SELECT k, name, k % len(name) + 1 AS p FROM base WHERE k % 10 = 0)),
      d2 AS (SELECT k + 2000000 AS rid,
               substr(name, 1, p - 1) || substr(name, p + 1, len(name) - p) AS name
             FROM (SELECT k, name, (k * 7) % len(name) + 1 AS p FROM base WHERE k % 20 = 0)),
      r AS (SELECT k AS rid, name FROM base
            UNION ALL SELECT rid, name FROM d1
            UNION ALL SELECT rid, name FROM d2),
      e0 AS (SELECT x.rid AS a, y.rid AS b FROM r x JOIN r y
             ON x.rid < y.rid AND levenshtein(x.name, y.name) <= 1),
      e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      rec AS (
        WITH RECURSIVE reach(dd, rt) AS (
          SELECT a, a FROM e
          UNION
          SELECT e.a, reach.rt FROM e JOIN reach ON e.b = reach.dd)
        SELECT dd, MIN(rt) AS cluster FROM reach GROUP BY dd),
      lab AS (SELECT r.rid, COALESCE(rec.cluster, r.rid) AS cluster
              FROM r LEFT JOIN rec ON r.rid = rec.dd),
      sz AS (SELECT cluster, COUNT(*) AS csize FROM lab GROUP BY cluster)
      SELECT lab.rid, lab.cluster, CAST(sz.csize AS BIGINT) AS csize,
        lab.rid = lab.cluster AS is_canonical
      FROM lab JOIN sz USING (cluster)
      ORDER BY rid"""))
  )
}
