package graft.operators

import graft.{GraftQuery, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-construction operators beyond the per-doc text statistics in
  * [[TextQueries]]: rule-based quality gating, budget-capped sampling, and
  * deterministic global shuffling/sharding — the steps that turn a cleaned
  * corpus into training-ready shards. All are either pure projections or
  * built on the two-pass SkewUtils primitives, so no operator ever funnels
  * a whole corpus (or a whole source) through one reducer.
  *
  * Reference analogue: none (the reference has no corpus tooling); these
  * are the BASELINE.json north-star LLM-pipeline surface, same provenance
  * as TextQueries x12-x16.
  */
object PipelineQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  val queries: Seq[GraftQuery] = Seq(

    // ----- x26: weighted sampling without replacement — sequential Poisson
    // sampling (Ohlsson 1998, the order-sampling design official statistics
    // uses): each doc gets priority xi = u / w with u a deterministic
    // uniform derived from md5(doc_id) and w = n_chars; the k smallest
    // priorities are the sample, with inclusion probability ~ k*w/SUM(w).
    // Everything is exact arithmetic both engines share bit-for-bit: u is a
    // 52-bit md5 prefix (fits a double exactly), and the two divisions are
    // single correctly-rounded IEEE ops — no ln/pow whose libm rounding
    // could flip the k-th boundary. At scale this is a pure map-side
    // projection + top-k (TakeOrderedAndProject: per-partition heaps, never
    // a global sort), and the sample is reproducible forever from the ids —
    // retry-stable, cluster-size-independent, like x15/x16.
    GraftQuery("x26_priority_sample", (s, d) => {
      import s.implicits._
      val u52 = conv(substring(md5($"doc_id".cast(StringType)), 1, 13), 16, 10)
        .cast(LongType)
      val xi = u52.cast(DoubleType) / lit(4503599627370496.0) /
        $"n_chars".cast(DoubleType)
      T.documents(s, d).filter($"n_chars" > 0)
        .select($"doc_id", $"n_chars", xi.as("xi"))
        .orderBy($"xi", $"doc_id").limit(50)
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, n_chars,
        CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS DOUBLE)
          / 4503599627370496.0 / n_chars AS xi
        FROM documents WHERE n_chars > 0)
      SELECT doc_id, n_chars, xi
      FROM (SELECT * FROM t ORDER BY xi, doc_id LIMIT 50)
      ORDER BY doc_id""")),

    // ----- x17: Gopher-style hard quality gate — each rule is a named
    // boolean so downstream can audit WHY a doc was dropped (the rule-based
    // companion of the soft score in x2_quality). Rules chosen to actually
    // vary on the corpus: token-count band, mean-token-length band,
    // stopword floor, distinct-token-ratio floor. Pure projection: scales
    // as a parquet scan, no shuffle.
    GraftQuery("x17_gopher_quality", (s, d) => {
      import s.implicits._
      val toks = split(trim($"text"), " ")
      val n = size(toks)
      val charSum = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
      val meanLen = round(charSum.cast(DoubleType) / n, 6)
      val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
      val distinctRatio = round(size(array_distinct(toks)).cast(DoubleType) / n, 6)
      val rLen = n.between(30, 70)
      val rMean = meanLen.between(3.0, 7.0)
      val rStop = nStop >= 2
      val rDistinct = distinctRatio >= 0.5
      T.documents(s, d).select(
        $"doc_id",
        n.cast(LongType).as("n_tokens"),
        meanLen.as("mean_tok_len"),
        nStop.cast(LongType).as("n_stop"),
        distinctRatio.as("distinct_ratio"),
        rLen.as("len_ok"), rMean.as("mean_ok"),
        rStop.as("stop_ok"), rDistinct.as("distinct_ok"),
        (rLen && rMean && rStop && rDistinct).as("keep"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS toks FROM documents),
      m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 6) AS mean_tok_len,
        CAST(len(list_filter(toks, t -> list_contains(
          ['the','a','of','and','to','in','is','on'], t))) AS BIGINT) AS n_stop,
        round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_ratio
        FROM t)
      SELECT doc_id, n_tokens, mean_tok_len, n_stop, distinct_ratio,
        n_tokens BETWEEN 30 AND 70 AS len_ok,
        mean_tok_len BETWEEN 3.0 AND 7.0 AS mean_ok,
        n_stop >= 2 AS stop_ok,
        distinct_ratio >= 0.5 AS distinct_ok,
        (n_tokens BETWEEN 30 AND 70) AND (mean_tok_len BETWEEN 3.0 AND 7.0)
          AND n_stop >= 2 AND distinct_ratio >= 0.5 AS keep
      FROM m ORDER BY doc_id""")),

    // ----- x18: per-source token-budget sampling — keep each source's
    // hash-ordered prefix until the token budget fills (the domain-capped
    // subsample that shapes a training mix when a source is overrepresented).
    // Selection order is md5(doc_id): deterministic across engines, runs,
    // retries and cluster sizes, yet uncorrelated with doc content. The
    // running total uses rangedCumSumByKey, NOT `sum() over (partition by
    // source order by ...)` — one dominant source would otherwise hand its
    // entire row set to a single reducer.
    GraftQuery("x18_budget_sample", (s, d) => {
      import s.implicits._
      val budget = 1000L
      val docs = T.documents(s, d).select(
        $"doc_id", $"source",
        size(split(trim($"text"), "\\s+")).cast(LongType).as("n_toks"),
        md5($"doc_id".cast(StringType)).as("__hk"))
      SkewUtils.rangedCumSumByKey(docs, Seq("source"), Seq("__hk", "doc_id"),
          "n_toks", 32, "cum_toks")
        .filter($"cum_toks" <= budget)
        .select($"doc_id", $"source", $"n_toks", $"cum_toks")
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, source,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_toks,
                   md5(CAST(doc_id AS VARCHAR)) AS hk
                 FROM documents),
      c AS (SELECT doc_id, source, n_toks,
              CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY hk, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks
            FROM t)
      SELECT doc_id, source, n_toks, cum_toks
      FROM c WHERE cum_toks <= 1000 ORDER BY doc_id"""), bench = true),

    // ----- x19: deterministic global shuffle + fixed-size sharding — the
    // final pre-training step: order the corpus by a salted content-free
    // hash (reproducible "random" order), then cut it into 64-row shards.
    // The global rank comes from the two-pass rangedCumSum over a constant
    // 1 (never `row_number() over (order by ...)`, which is a single
    // reducer holding the corpus); shard id is a pure function of rank, so
    // writers can partitionBy(shard) into uniform output files.
    GraftQuery("x19_global_shuffle", (s, d) => {
      import s.implicits._
      val shardSize = 64
      val keyed = T.documents(s, d).select(
        $"doc_id",
        md5(concat($"doc_id".cast(StringType), lit(":42"))).as("shuffle_key"),
        lit(1L).as("__one"))
      SkewUtils.rangedCumSum(keyed, Seq("shuffle_key", "doc_id"), "__one", 32, "rk")
        .select($"doc_id", $"shuffle_key", $"rk",
          floor(($"rk" - 1) / shardSize).cast(LongType).as("shard"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id,
                   md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key
                 FROM documents),
      r AS (SELECT doc_id, shuffle_key,
              CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS rk
            FROM t)
      SELECT doc_id, shuffle_key, rk,
        CAST(floor((rk - 1) / 64.0) AS BIGINT) AS shard
      FROM r ORDER BY doc_id"""), bench = true),

    // ----- x20: cross-source overlap matrix — shared distinct 8-grams per
    // source pair, the corpus diagnostic behind contamination triage (which
    // crawls/data drops duplicate each other, and how badly). Posting-list
    // equi-join on 64-bit gram hashes: candidates only where grams collide,
    // the same derived-key shape as x14 decontamination; output is
    // |sources|² rows, so the matrix stays tiny no matter the corpus size.
    // Spark grams are hashes, the oracle's are strings; pair counts agree
    // (collision odds ~1e-11 at this vocabulary).
    GraftQuery("x20_source_overlap", (s, d) => {
      import s.implicits._
      val g = T.documents(s, d)
        .select($"source", split(trim($"text"), " ").as("toks"))
        .select($"source", explode(graft.Graft.wordGramHashes($"toks", 8)).as("gram"))
        .distinct()
      g.as("x").join(g.as("y"),
          col("x.gram") === col("y.gram") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("shared_grams"))
        .orderBy($"src_a", $"src_b")
    }, Some("""
      WITH t AS (SELECT source, str_split(trim(text), ' ') AS w FROM documents),
      g AS (SELECT DISTINCT source, array_to_string(w[i:i+7], ' ') AS gram
            FROM t, unnest(range(1, greatest(len(w) - 6, 1))) AS u(i)),
      p AS (SELECT x.source AS src_a, y.source AS src_b, COUNT(*) AS shared_grams
            FROM g x JOIN g y ON x.gram = y.gram AND x.source < y.source
            GROUP BY 1, 2)
      SELECT src_a, src_b, shared_grams FROM p ORDER BY src_a, src_b""")),

    // ----- x23: boilerplate removal — drop the segments that recur across
    // many distinct documents (nav bars, license headers, cookie banners in
    // a real crawl), keeping each doc's residual text in order. The corpus
    // has no line structure, so a "line" here is a fixed 2-word segment
    // (chosen so the filter genuinely fires on this vocabulary: ~11% of
    // segment types cross the 20-distinct-docs threshold). Plan shape is
    // the scale one: the corpus is never shuffled — segment counts reduce
    // map-side to a tiny (≤ vocab²) table, the boilerplate list collapses
    // to ONE row via collect_list and is broadcast back, and removal is an
    // array-HOF projection per row. At real scale a boilerplate list that
    // outgrew a broadcast would flip to the posting-list join form (x14);
    // countDistinct would become approx_count_distinct.
    GraftQuery("x23_boilerplate", (s, d) => {
      import s.implicits._
      val W = 2
      val docs = T.documents(s, d)
        .select($"doc_id", split(trim($"text"), " ").as("toks"))
        .withColumn("segs", expr(
          s"transform(sequence(0, cast(ceil(size(toks) / $W.0) as int) - 1), " +
            s"i -> array_join(slice(toks, i * $W + 1, $W), ' '))"))
      val bp = docs.select(explode($"segs").as("seg"), $"doc_id")
        .groupBy($"seg").agg(countDistinct($"doc_id").as("nd"))
        .filter($"nd" >= 20)
        .agg(sort_array(collect_list($"seg")).as("bp"))
      docs.crossJoin(broadcast(bp)).select(
        $"doc_id",
        array_join(expr("filter(segs, x -> NOT array_contains(bp, x))"), " ")
          .as("clean_text"),
        size($"segs").cast(LongType).as("n_seg"),
        size(expr("filter(segs, x -> array_contains(bp, x))")).cast(LongType)
          .as("n_removed"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS toks FROM documents),
      s AS (SELECT doc_id,
        list_transform(range(0, CAST(ceil(len(toks) / 2.0) AS BIGINT)),
                       i -> array_to_string(toks[i*2+1:i*2+2], ' ')) AS segs
        FROM t),
      c AS (SELECT seg, count(DISTINCT doc_id) AS nd
            FROM (SELECT doc_id, unnest(segs) AS seg FROM s) GROUP BY seg),
      b AS (SELECT list_sort(list(seg)) AS bp FROM c WHERE nd >= 20)
      SELECT doc_id,
        -- COALESCE: array_to_string([]) is NULL in DuckDB but '' in Spark's
        -- array_join; fully-scrubbed docs (common once the corpus is large
        -- enough for most segments to cross the threshold) hit exactly that
        COALESCE(array_to_string(list_filter(segs, x -> NOT list_contains(b.bp, x)), ' '), '')
          AS clean_text,
        CAST(len(segs) AS BIGINT) AS n_seg,
        CAST(len(list_filter(segs, x -> list_contains(b.bp, x))) AS BIGINT) AS n_removed
      FROM s, b ORDER BY doc_id""")),

    // ----- x24: fixed-size chunking with overlap — the RAG/context-window
    // prep step: each document becomes ceil((n-overlap)/stride) chunks of
    // up to 64 tokens, consecutive chunks sharing a 16-token overlap
    // (stride 48). Pure per-row explode — map-side only, no shuffle except
    // the output sort; at 100 TB chunking is embarrassingly parallel and
    // the chunk_id is derived (retry-stable). The oracle recomputes every
    // chunk's exact text, so boundary math (last partial chunk, short and
    // empty docs collapsing to one chunk) is pinned bit-for-bit.
    GraftQuery("x24_chunk_overlap", (s, d) => {
      import s.implicits._
      val C = 64; val O = 16; val S = C - O
      T.documents(s, d)
        .select($"doc_id", split(trim($"text"), "\\s+").as("toks"))
        .withColumn("n", size($"toks"))
        .withColumn("n_chunks",
          greatest(lit(1), ceil(($"n" - lit(O)) / lit(S.toDouble)).cast(IntegerType)))
        .select($"doc_id", $"toks", $"n",
          posexplode(expr(s"transform(sequence(0, n_chunks - 1), i -> i * $S)")))
        .toDF("doc_id", "toks", "n", "chunk_id", "start")
        .select($"doc_id", $"chunk_id".cast(LongType).as("chunk_id"),
          array_join(slice($"toks", $"start" + 1, lit(C)), " ").as("chunk_text"),
          least(lit(C), $"n" - $"start").cast(LongType).as("n_tokens"))
        .orderBy($"doc_id", $"chunk_id")
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id, toks, len(toks) AS n,
              GREATEST(1, CAST(ceil((len(toks) - 16) / 48.0) AS BIGINT)) AS n_chunks
            FROM t),
      c AS (SELECT doc_id, toks, n, i AS chunk_id, CAST(i * 48 AS INT) AS start
            FROM m, unnest(range(0, n_chunks)) AS u(i))
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        array_to_string(toks[start + 1:start + 64], ' ') AS chunk_text,
        CAST(LEAST(64, n - start) AS BIGINT) AS n_tokens
      FROM c ORDER BY doc_id, chunk_id"""))
  )
}
