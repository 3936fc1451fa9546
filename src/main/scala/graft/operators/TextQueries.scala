package graft.operators

import graft.{GraftQuery, Tables => T}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N4 text-analysis operators over `documents`: language-ID (n-gram
  * heuristic), quality scoring, token counting, document fingerprinting.
  * All pure column expressions — codegen'd, no UDFs, shuffle-free scans —
  * so throughput at 100 TB is parquet-scan-bound.
  */
object TextQueries {

  /** Occurrence-weight of a literal fragment: length delta after removal. */
  private def occ(c: Column, lit_ : String): Column =
    length(c) - length(expr(s"replace(text, '${lit_}', '')"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  val queries: Seq[GraftQuery] = Seq(

    // ----- language ID: character-bigram profile argmax over three
    // language profiles (integer evidence counts, deterministic tiebreak;
    // the synthetic corpus is English-shaped regardless of its lang label —
    // the classifier contract is what's verified, not the label)
    GraftQuery("x1_langid", (s, d) => {
      import s.implicits._
      def profile(grams: Seq[String]) =
        grams.map(g => occ($"text", g)).reduce(_ + _).cast(IntegerType)
      val en = profile(Seq("th", "he", "an", "er", "in"))
      val es = profile(Seq("de", "la", "os", "ar", "el"))
      val de = profile(Seq("ch", "ei", "un", "ge", "ie"))
      T.documents(s, d).select(
        $"doc_id", $"lang".as("labeled_lang"),
        en.as("en_score"), es.as("es_score"), de.as("de_score"),
        when(en >= es && en >= de, "en")
          .when(es >= de, "es")
          .otherwise("de").as("pred_lang"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, lang,
        CAST((length(text) - length(replace(text, 'th', ''))) +
             (length(text) - length(replace(text, 'he', ''))) +
             (length(text) - length(replace(text, 'an', ''))) +
             (length(text) - length(replace(text, 'er', ''))) +
             (length(text) - length(replace(text, 'in', ''))) AS INT) AS en_score,
        CAST((length(text) - length(replace(text, 'de', ''))) +
             (length(text) - length(replace(text, 'la', ''))) +
             (length(text) - length(replace(text, 'os', ''))) +
             (length(text) - length(replace(text, 'ar', ''))) +
             (length(text) - length(replace(text, 'el', ''))) AS INT) AS es_score,
        CAST((length(text) - length(replace(text, 'ch', ''))) +
             (length(text) - length(replace(text, 'ei', ''))) +
             (length(text) - length(replace(text, 'un', ''))) +
             (length(text) - length(replace(text, 'ge', ''))) +
             (length(text) - length(replace(text, 'ie', ''))) AS INT) AS de_score
        FROM documents)
      SELECT doc_id, lang AS labeled_lang, en_score, es_score, de_score,
        CASE WHEN en_score >= es_score AND en_score >= de_score THEN 'en'
             WHEN es_score >= de_score THEN 'es'
             ELSE 'de' END AS pred_lang
      FROM t ORDER BY doc_id""")),

    // ----- quality scoring: length/stopword/char-class ratios
    GraftQuery("x2_quality", (s, d) => {
      import s.implicits._
      val toks = split(trim($"text"), " ")
      val nTok = size(toks)
      val charSum = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
      val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
      val alnum = length(regexp_replace($"text", "[^a-z0-9 ]", ""))
      T.documents(s, d).select(
        $"doc_id",
        nTok.as("n_tokens"),
        (charSum.cast(DoubleType) / nTok).as("avg_tok_len"),
        (nStop.cast(DoubleType) / nTok).as("stop_ratio"),
        ((length($"text") - alnum).cast(DoubleType) / length($"text")).as("punct_ratio"),
        (when(nTok.between(5, 1000), 0.5).otherwise(0.0) +
         when(nStop.cast(DoubleType) / nTok > 0.05, 0.5).otherwise(0.0)).as("quality"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH t AS (SELECT doc_id, text, str_split(trim(text), ' ') AS toks FROM documents),
      m AS (SELECT doc_id, text,
        CAST(len(toks) AS INT) AS n_tokens,
        CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS char_sum,
        CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','on'], t))) AS DOUBLE) AS n_stop,
        CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) AS n_punct
        FROM t)
      SELECT doc_id, n_tokens,
        char_sum / n_tokens AS avg_tok_len,
        n_stop / n_tokens AS stop_ratio,
        n_punct / length(text) AS punct_ratio,
        (CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 0.5 ELSE 0.0 END +
         CASE WHEN n_stop / n_tokens > 0.05 THEN 0.5 ELSE 0.0 END) AS quality
      FROM m ORDER BY doc_id""")),

    // ----- token counting: whitespace + BPE-ish regex segmentation
    GraftQuery("x3_token_count", (s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id",
        size(split(trim($"text"), "\\s+")).as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
          .as("re_tokens"),
        length($"text").as("n_chars"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS re_tokens,
        CAST(length(text) AS INT) AS n_chars
      FROM documents ORDER BY doc_id""")),

    // ----- document fingerprint: normalize then hash (oracle-checkable md5)
    GraftQuery("x4_fingerprint", (s, d) => {
      import s.implicits._
      val norm = trim(regexp_replace(lower($"text"), "[^a-z0-9]+", " "))
      T.documents(s, d).select(
        $"doc_id", md5(norm).as("fp"), length(norm).as("norm_len"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
        CAST(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS INT) AS norm_len
      FROM documents ORDER BY doc_id""")),

    // ----- TF-IDF: term frequencies exact, score rounded; ordering is by
    // (doc_id, term), never by score, so ulp-level ln() differences between
    // engines can't flip row order
    GraftQuery("x5_tfidf", (s, d) => {
      import s.implicits._
      // document-frequency table joins as a plain shuffle join (vocabulary
      // is unbounded at corpus scale — AQE may still broadcast it when
      // it's actually small); the corpus size enters as a cross-joined
      // 1-row aggregate, not a driver-side count()
      val docs = T.documents(s, d)
      val nDocs = docs.agg(count(lit(1)).cast(DoubleType).as("n_corpus"))
      val terms = docs.select($"doc_id", explode(split(trim($"text"), " ")).as("term"))
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = terms.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      tf.join(df, "term")
        .filter($"tf" >= 3)
        .crossJoin(broadcast(nDocs))
        .select($"doc_id", $"term", $"tf", $"df",
          round($"tf" * log($"n_corpus" / $"df"), 6).as("tfidf"))
        .orderBy($"doc_id", $"term")
    }, Some("""
      WITH t AS (SELECT doc_id, unnest(str_split(trim(text), ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
      df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY term),
      n AS (SELECT COUNT(*) AS n FROM documents)
      SELECT doc_id, term, tf, df,
        round(tf * ln(CAST(n.n AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN df USING (term), n
      WHERE tf >= 3
      ORDER BY doc_id, term""")),

    // ----- unigram LM scoring (the CCNet-style quality filter): per-doc
    // mean token log-probability under the corpus unigram model. Each
    // token type's log-prob is rounded to integer micro-units once, so the
    // per-doc sum is exact integer arithmetic — partition order and
    // engine can't drift it.
    GraftQuery("x8_unigram_logprob", (s, d) => {
      import s.implicits._
      // frequency table joins as a plain shuffle join (unbounded vocab;
      // AQE decides broadcast); corpus token total via a cross-joined
      // 1-row aggregate — no driver-side count()
      val terms = T.documents(s, d)
        .select($"doc_id", explode(split(trim($"text"), " ")).as("term"))
      val freq = terms.groupBy($"term").agg(count(lit(1)).as("freq"))
      val totalDf = terms.agg(count(lit(1)).cast(DoubleType).as("n_total"))
      val withLp = terms.join(freq, "term")
        .crossJoin(broadcast(totalDf))
        .withColumn("lp_u",
          round(log($"freq".cast(DoubleType) / $"n_total") * 1e6).cast(LongType))
      withLp.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"lp_u").as("logprob_u"))
        .withColumn("mean_logprob", $"logprob_u".cast(DoubleType) / $"n_tokens" / 1e6)
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, unnest(str_split(trim(text), ' ')) AS term FROM documents),
      f AS (SELECT term, COUNT(*) AS freq FROM t GROUP BY term),
      n AS (SELECT COUNT(*) AS total FROM t),
      lp AS (SELECT t.doc_id,
               CAST(round(ln(CAST(f.freq AS DOUBLE) / CAST(n.total AS DOUBLE)) * 1e6) AS BIGINT) AS lp_u
             FROM t JOIN f USING (term), n)
      SELECT doc_id, COUNT(*) AS n_tokens,
        CAST(SUM(lp_u) AS BIGINT) AS logprob_u,
        CAST(SUM(lp_u) AS DOUBLE) / COUNT(*) / 1e6 AS mean_logprob
      FROM lp GROUP BY doc_id ORDER BY doc_id""")),

    // ----- corpus vocabulary stats (Zipf head)
    GraftQuery("x6_vocab_stats", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select(explode(split(trim($"text"), " ")).as("term"))
        .groupBy($"term")
        .agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"term")
        .limit(20)
    }, Some("""
      SELECT term, COUNT(*) AS freq
      FROM (SELECT unnest(str_split(trim(text), ' ')) AS term FROM documents) t
      GROUP BY term ORDER BY freq DESC, term LIMIT 20""")),

    // ----- embedding norm stats per label: per-row norms fold in index
    // order (deterministic), aggregated as exact micro-units so partition
    // order can't drift the mean
    GraftQuery("x7_embedding_stats", (s, d) => {
      import s.implicits._
      val normSq = aggregate($"embedding", lit(0.0d),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
      T.embeddings(s, d)
        .withColumn("norm_u", round(sqrt(normSq) * 1e6).cast(LongType))
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          (sum($"norm_u").cast(DoubleType) / count(lit(1)) / 1e6).as("avg_norm"),
          min($"norm_u").as("min_norm_u"),
          max($"norm_u").as("max_norm_u"))
        .orderBy($"label")
    }, Some("""
      WITH e AS (SELECT label,
        CAST(round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) * 1e6) AS BIGINT) AS norm_u
        FROM embeddings)
      SELECT label, COUNT(*) AS n,
        CAST(SUM(norm_u) AS DOUBLE) / COUNT(*) / 1e6 AS avg_norm,
        MIN(norm_u) AS min_norm_u, MAX(norm_u) AS max_norm_u
      FROM e GROUP BY label ORDER BY label""")),

    // ----- cross-modal join: text corpus enriched with its embedding row
    // (doc_id = vec_id where present) — the text+vector feature table a
    // training pipeline materializes before filtering
    GraftQuery("x9_text_embedding_join", (s, d) => {
      import s.implicits._
      val normU = round(sqrt(aggregate($"embedding", lit(0.0d),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))) * 1e6).cast(LongType)
      val emb = T.embeddings(s, d).select($"vec_id", $"label", normU.as("norm_u"))
      T.documents(s, d)
        .join(emb, $"doc_id" === $"vec_id", "left")
        .select($"doc_id", $"lang", length($"text").cast(LongType).as("n_chars2"),
          $"label", $"norm_u")
        .orderBy($"doc_id")
    }, Some("""
      WITH e AS (SELECT vec_id, label,
        CAST(round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) * 1e6) AS BIGINT) AS norm_u
        FROM embeddings)
      SELECT doc_id, lang, length(text) AS n_chars2, label, norm_u
      FROM documents LEFT JOIN e ON doc_id = vec_id
      ORDER BY doc_id""")),

    // ----- stopword removal: the cleaning transform (tokens not in the
    // stoplist, re-joined; shrinkage reported)
    GraftQuery("x11_stopword_removal", (s, d) => {
      import s.implicits._
      val toks = split(trim($"text"), " ")
      val kept = filter(toks, t => !t.isin(stopwords: _*))
      T.documents(s, d).select(
        $"doc_id",
        array_join(kept, " ").as("clean_text"),
        size(toks).cast(LongType).as("n_before"),
        size(kept).cast(LongType).as("n_after"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS toks FROM documents),
      k AS (SELECT doc_id, toks,
              list_filter(toks, x -> NOT list_contains(
                ['the','a','of','and','to','in','is','on'], x)) AS kept
            FROM t)
      SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
        len(toks) AS n_before, len(kept) AS n_after
      FROM k ORDER BY doc_id""")),

    // ----- redaction: scrub identifier-like spans before training
    // (digit runs → <num>, hex-ish ids → <id>); counts what was scrubbed
    GraftQuery("x10_redaction", (s, d) => {
      import s.implicits._
      val step1 = regexp_replace($"text", "[0-9]{3,}", "<num>")
      val redacted = regexp_replace(step1, "\\b[a-f0-9]{8,}\\b", "<id>")
      T.documents(s, d).select(
        $"doc_id",
        redacted.as("clean_text"),
        (length($"text") - length(regexp_replace($"text", "[0-9]", ""))).cast(LongType)
          .as("digits_seen"),
        ($"text" =!= redacted).as("was_redacted"))
        .orderBy($"doc_id")
    }, Some("""
      WITH r AS (SELECT doc_id, text,
        regexp_replace(regexp_replace(text, '[0-9]{3,}', '<num>', 'g'),
                       '\b[a-f0-9]{8,}\b', '<id>', 'g') AS clean_text
        FROM documents)
      SELECT doc_id, clean_text,
        length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits_seen,
        text <> clean_text AS was_redacted
      FROM r ORDER BY doc_id""")),

    // ----- x22: category-aware PII scrub — emails, phone numbers, and
    // account-ish long digit runs each redacted to their own tag, with
    // per-category counts as the audit trail (x10 is the generic digit/hex
    // pass; this is the structured one a corpus release actually runs).
    // The synthetic corpus contains no digits or '@' at all, so the gate
    // first plants deterministic PII derived from doc_id — two emails, a
    // phone, a 16-digit account id — with the identical expression in both
    // engines; every rule then provably fires on every row, and the 'g'
    // flag on the DuckDB side is load-bearing (two emails per row). Order
    // matters: digit-run first, so the 16-digit id can't be half-eaten by
    // the phone rule. Pure projection: codegen'd regexes, no shuffle —
    // parquet-scan-bound at 100 TB like every other x-series projection.
    GraftQuery("x22_pii_redaction", (s, d) => {
      import s.implicits._
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+1 [0-9]{3}-[0-9]{4}"
      val idRe = "[0-9]{12,}"
      val did = $"doc_id".cast(StringType)
      val enriched = concat(
        $"text", lit(" reach user"), did, lit("@mail.example.org or u"),
        did, lit("@corp.test call +1 555-"),
        lpad(($"doc_id" % 10000).cast(StringType), 4, "0"),
        lit(" acct "), lpad(did, 16, "9"))
      val red = regexp_replace(regexp_replace(regexp_replace(enriched,
        idRe, "<ID>"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
      T.documents(s, d).select(
        $"doc_id",
        red.as("clean_text"),
        regexp_count(enriched, lit(emailRe)).cast(LongType).as("n_email"),
        regexp_count(enriched, lit(phoneRe)).cast(LongType).as("n_phone"),
        regexp_count(enriched, lit(idRe)).cast(LongType).as("n_id"),
        (!red.rlike(emailRe) && !red.rlike(phoneRe) && !red.rlike(idRe))
          .as("clean"))
        .orderBy($"doc_id")
    }, Some("""
      WITH e AS (SELECT doc_id,
        text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.org or u' ||
          CAST(doc_id AS VARCHAR) || '@corp.test call +1 555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
          ' acct ' || lpad(CAST(doc_id AS VARCHAR), 16, '9') AS t
        FROM documents),
      r AS (SELECT doc_id, t,
        regexp_replace(regexp_replace(regexp_replace(t,
          '[0-9]{12,}', '<ID>', 'g'),
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+1 [0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text
        FROM e)
      SELECT doc_id, clean_text,
        CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(t, '\+1 [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
        CAST(len(regexp_extract_all(t, '[0-9]{12,}')) AS BIGINT) AS n_id,
        NOT (regexp_matches(clean_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
          OR regexp_matches(clean_text, '\+1 [0-9]{3}-[0-9]{4}')
          OR regexp_matches(clean_text, '[0-9]{12,}')) AS clean
      FROM r ORDER BY doc_id""")),

    // ----- weighted dataset mixing: sample each language at a target rate
    // (en 50%, es 25%, others 100%) — the source-mixing step that shapes a
    // training distribution. Selection is a deterministic md5 threshold on
    // the doc id (identical function in both engines → exact oracle; and
    // at scale it's a pure map-side filter: no shuffle, no RNG, stable
    // across retries). The 4-hex-digit prefix gives 16-bit rate granularity.
    GraftQuery("x15_weighted_mix", (s, d) => {
      import s.implicits._
      val keyHex = substring(md5($"doc_id".cast(StringType)), 1, 4)
      val thresh = when($"lang" === "en", lit("8000"))
        .when($"lang" === "es", lit("4000"))
        .otherwise(lit("ffff"))
      T.documents(s, d)
        .filter(keyHex < thresh)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id, lang FROM documents
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        CASE WHEN lang = 'en' THEN '8000'
             WHEN lang = 'es' THEN '4000'
             ELSE 'ffff' END
      ORDER BY doc_id""")),

    // ----- x30: quality-pacing corpus mix — the data-curation step that
    // composes the LM quality signal (x8's unigram log-prob), quantile
    // bucketing (d3's distributed NTILE device) and deterministic
    // hash-threshold sampling (x15's md5 device) into one pipeline:
    // docs are quartiled by per-token log-prob and sampled at
    // quartile-dependent rates (best quartile kept whole, worst kept 25% —
    // the up-weight-quality / down-weight-junk mix every pretraining run
    // tunes). Integer micro-nat arithmetic with truncating div (both
    // engines truncate toward zero, verified), two-pass ranged rank for
    // the quartiles (no global window), md5 threshold for the keep
    // decision (map-side, retry-stable).
    GraftQuery("x30_quality_mix", (s, d) => {
      import s.implicits._
      val terms = T.documents(s, d)
        .select($"doc_id", explode(split(trim($"text"), " ")).as("term"))
      val freq = terms.groupBy($"term").agg(count(lit(1)).as("freq"))
      val totalDf = terms.agg(count(lit(1)).cast(DoubleType).as("n_total"))
      val perDoc = terms.join(freq, "term")
        .crossJoin(broadcast(totalDf))
        .withColumn("lp_u",
          round(log($"freq".cast(DoubleType) / $"n_total") * 1e6).cast(LongType))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"lp_u").as("logprob_u"))
        .withColumn("quality_u", expr("logprob_u div n_tokens"))
        .select($"doc_id", $"quality_u")
      val total = T.documents(s, d).count()
      val k = 4
      // same NTILE contract as d3, incl. the n < k one-row-per-bucket case
      val bucketExpr =
        if (total < k) "rank - 1"
        else {
          val q = total / k
          val m = total % k
          s"CASE WHEN rank <= ${m * (q + 1)} THEN (rank - 1) div ${q + 1} " +
            s"ELSE $m + (rank - 1 - ${m * (q + 1)}) div $q END"
        }
      val ranked = SkewUtils.rangedRowNumber(perDoc, Seq.empty,
        Seq("quality_u", "doc_id"), 32, "rank")
        .withColumn("q_bucket", expr(bucketExpr).cast("long"))
      val thresh = when($"q_bucket" === 0, lit("4000"))
        .when($"q_bucket" === 1, lit("8000"))
        .when($"q_bucket" === 2, lit("c000"))
        .otherwise(lit("ffff"))
      ranked
        .filter(substring(md5($"doc_id".cast(StringType)), 1, 4) < thresh)
        .select($"doc_id", $"q_bucket", $"quality_u")
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, unnest(str_split(trim(text), ' ')) AS term FROM documents),
      f AS (SELECT term, COUNT(*) AS freq FROM t GROUP BY term),
      n AS (SELECT COUNT(*) AS total FROM t),
      lp AS (SELECT t.doc_id,
               CAST(round(ln(CAST(f.freq AS DOUBLE) / CAST(n.total AS DOUBLE)) * 1e6) AS BIGINT) AS lp_u
             FROM t JOIN f USING (term), n),
      pd AS (SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(lp_u) AS BIGINT) AS logprob_u
             FROM lp GROUP BY doc_id),
      qd AS (SELECT doc_id, logprob_u // n_tokens AS quality_u FROM pd),
      r AS (SELECT doc_id, quality_u,
              CAST(NTILE(4) OVER (ORDER BY quality_u, doc_id) - 1 AS BIGINT) AS q_bucket
            FROM qd)
      SELECT doc_id, q_bucket, quality_u FROM r
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        CASE q_bucket WHEN 0 THEN '4000' WHEN 1 THEN '8000'
             WHEN 2 THEN 'c000' ELSE 'ffff' END
      ORDER BY doc_id""")),

    // ----- train/val/test split: stable 75/12.5/12.5 assignment by md5
    // prefix of the doc id — deterministic across engines, runs, retries
    // and cluster sizes (no RNG, no partition dependence), so the split is
    // reproducible forever from the id alone. Map-side pure projection.
    GraftQuery("x16_dataset_split", (s, d) => {
      import s.implicits._
      val keyHex = substring(md5($"doc_id".cast(StringType)), 1, 4)
      T.documents(s, d)
        .select($"doc_id",
          when(keyHex < "c000", "train")
            .when(keyHex < "e000", "val")
            .otherwise("test").as("split"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'c000' THEN 'train'
             WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e000' THEN 'val'
             ELSE 'test' END AS split
      FROM documents ORDER BY doc_id""")),

    // ----- x28: GROUP-aware split — x16 keyed by the doc id leaks
    // near-identical documents from one source across train/test; keying
    // the same md5 threshold by the GROUP (source/domain) instead puts
    // every doc of a group in the same split — the held-out-domain
    // evaluation contract. Map-side only (the hash needs nothing but the
    // row's own source column); the leak_free flag re-proves purity
    // in-query via a per-source distinct-split count (a 20-group window
    // here; at 100 TB the proof pass is a groupBy over |groups| rows,
    // the assignment itself stays a pure map).
    GraftQuery("x28_group_split", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val keyHex = substring(md5($"source"), 1, 4)
      T.documents(s, d)
        .select($"doc_id", $"source",
          when(keyHex < "c000", "train")
            .when(keyHex < "e000", "val")
            .otherwise("test").as("split"))
        .withColumn("leak_free",
          size(collect_set($"split").over(Window.partitionBy($"source"))) === 1)
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id, source,
        CASE WHEN substring(md5(source), 1, 4) < 'c000' THEN 'train'
             WHEN substring(md5(source), 1, 4) < 'e000' THEN 'val'
             ELSE 'test' END AS split,
        TRUE AS leak_free
      FROM documents ORDER BY doc_id""")),

    // ----- repetition scoring: fraction of duplicated 3-grams per doc —
    // the repetitive-content quality filter (boilerplate / template spam).
    // Spark computes grams as 64-bit hashes, the oracle as strings; the
    // distinct counts agree (collision odds ~1e-14 per doc).
    GraftQuery("x13_repetition", (s, d) => {
      import s.implicits._
      val toks = split(trim($"text"), " ")
      val n = size($"toks")
      val grams = zip_with(
        zip_with(slice($"toks", lit(1), n - 2), slice($"toks", lit(2), n - 2),
          (a, b) => xxhash64(a, b)),
        slice($"toks", lit(3), n - 2),
        (ab, c) => xxhash64(ab, c))
      T.documents(s, d)
        .select($"doc_id", transform(toks, t => xxhash64(t)).as("toks"))
        .select($"doc_id",
          when(n >= 3, n - 2).otherwise(0).cast(LongType).as("n_grams"),
          when(n >= 3, size(array_distinct(grams))).otherwise(0)
            .cast(LongType).as("n_distinct"))
        .select($"doc_id", $"n_grams", $"n_distinct",
          when($"n_grams" > 0,
            round(lit(1.0) - $"n_distinct".cast(DoubleType) / $"n_grams", 6))
            .otherwise(0.0).as("rep_ratio"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS w FROM documents),
      g AS (SELECT doc_id,
              CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_grams,
              CAST(CASE WHEN len(w) >= 3 THEN len(list_distinct(
                [w[i] || '_' || w[i+1] || '_' || w[i+2] for i in range(1, len(w) - 1)]))
                ELSE 0 END AS BIGINT) AS n_distinct
            FROM t)
      SELECT doc_id, n_grams, n_distinct,
        CASE WHEN n_grams > 0
             THEN round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6)
             ELSE 0.0 END AS rep_ratio
      FROM g ORDER BY doc_id""")),

    // ----- decontamination: flag corpus docs sharing any distinct 8-gram
    // with a benchmark/eval set (stand-in: doc_id < 10) — the eval-leakage
    // scrub every training pipeline runs. Posting-list equi-join on gram
    // hashes: candidates only where grams actually collide, the same
    // derived-key shape as the dedup pipeline — no pairwise scan.
    GraftQuery("x14_decontamination", (s, d) => {
      import s.implicits._
      val g = T.documents(s, d)
        .select($"doc_id", split(trim($"text"), " ").as("toks"))
        .select($"doc_id", explode(graft.Graft.wordGramHashes($"toks", 8)).as("gram"))
      val bench = g.filter($"doc_id" < 10).select($"gram").distinct()
      val hits = g.filter($"doc_id" >= 10)
        .join(bench, "gram")
        .groupBy($"doc_id").agg(count(lit(1)).as("hits"))
      T.documents(s, d).filter($"doc_id" >= 10).select($"doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"hits", lit(0L)).as("n_hits"),
          $"hits".isNotNull.as("contaminated"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS w FROM documents),
      g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS gram
            FROM t, unnest(range(1, greatest(len(w) - 6, 1))) AS u(i)),
      b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10),
      hits AS (SELECT g.doc_id, COUNT(*) AS hits
               FROM g JOIN b USING (gram) WHERE g.doc_id >= 10 GROUP BY g.doc_id)
      SELECT d.doc_id, COALESCE(h.hits, 0) AS n_hits,
        h.doc_id IS NOT NULL AS contaminated
      FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d
      LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""")),

    // ----- x14's 100 TB path: bloom-filter pre-prune before the exact
    // decontamination join. At scale the corpus gram stream is ~1000x the
    // benchmark's; shuffling all of it into the equi-join just to discard
    // 99.9% is the bottleneck. Instead the benchmark grams fold into a
    // Spark BloomFilter sketch (driver-held, MB-sized — the same object
    // AQE's runtime row-filters ship), which probes map-side via the
    // codegen'd BloomFilterMightContain expression: only grams the bloom
    // admits reach the shuffle. Blooms have NO false negatives, so the
    // exact confirm join over the admitted grams returns exactly x14's
    // answer — the driver's hash compare against the exact-SQL oracle IS
    // the soundness proof (one lost gram undercounts n_hits and breaks the
    // hash). `bloom_pruned` additionally asserts the sketch really did
    // discard most of the corpus stream (fpp 0.1% → admitted ≈ true hits),
    // i.e. the probe isn't a pass-through.
    GraftQuery("x25_bloom_decontam", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.GraftSqlShim.{column, expression}
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      val g = T.documents(s, d)
        .select($"doc_id", split(trim($"text"), " ").as("toks"))
        .select($"doc_id", explode(graft.Graft.wordGramHashes($"toks", 8)).as("gram"))
      val benchGrams = g.filter($"doc_id" < 10).select($"gram").distinct()
      val bf = benchGrams.stat.bloomFilter("gram", math.max(benchGrams.count(), 1L), 0.001)
      val bfBytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        bos.toByteArray
      }
      val mightContain =
        column(BloomFilterMightContain(expression(lit(bfBytes)), expression($"gram")))
      val corpus = g.filter($"doc_id" >= 10)
      val admitted = corpus.filter(mightContain)
      val Array(counts, admittedN) = corpus
        .agg(count(lit(1)), count(when(mightContain, 1)))
        .head.toSeq.map(_.asInstanceOf[Long]).toArray
      val hits = admitted.join(benchGrams, "gram")
        .groupBy($"doc_id").agg(count(lit(1)).as("hits"))
      T.documents(s, d).filter($"doc_id" >= 10).select($"doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"hits", lit(0L)).as("n_hits"),
          $"hits".isNotNull.as("contaminated"),
          lit(admittedN < counts / 2).as("bloom_pruned"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS w FROM documents),
      g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS gram
            FROM t, unnest(range(1, greatest(len(w) - 6, 1))) AS u(i)),
      b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10),
      hits AS (SELECT g.doc_id, COUNT(*) AS hits
               FROM g JOIN b USING (gram) WHERE g.doc_id >= 10 GROUP BY g.doc_id)
      SELECT d.doc_id, COALESCE(h.hits, 0) AS n_hits,
        h.doc_id IS NOT NULL AS contaminated, TRUE AS bloom_pruned
      FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d
      LEFT JOIN hits h USING (doc_id) ORDER BY doc_id"""), bench = true),

    // ----- sequence packing: assign documents (in stable doc_id order) to
    // fixed token-budget packs — the batch-construction step of an LLM
    // training pipeline (contiguous-fill packing: a doc starts the pack its
    // cumulative-token prefix falls into). The global running sum uses the
    // two-pass rangedCumSum, NOT `sum() over (order by doc_id)` — an
    // unpartitioned window would put the entire corpus on one reducer.
    GraftQuery("x12_seq_packing", (s, d) => {
      import s.implicits._
      val budget = 2048
      val docs = T.documents(s, d).select($"doc_id",
        size(split(trim($"text"), "\\s+")).cast(LongType).as("n_toks"))
      SkewUtils.rangedCumSum(docs, Seq("doc_id"), "n_toks", 32, "cum_toks")
        .select($"doc_id", $"n_toks", $"cum_toks",
          floor(($"cum_toks" - $"n_toks") / budget).cast(LongType).as("pack_id"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_toks
                 FROM documents),
      c AS (SELECT doc_id, n_toks,
              CAST(SUM(n_toks) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks
            FROM t)
      SELECT doc_id, n_toks, cum_toks,
        CAST(floor((cum_toks - n_toks) / 2048) AS BIGINT) AS pack_id
      FROM c ORDER BY doc_id""")),

    // ----- subword tokenization: greedy longest-match against the fixed
    // SubwordVocab (id = position+1, 0 = UNK) — vocab-faithful token
    // accounting, the unit a training pipeline actually budgets in (x3's
    // regex counts are estimates). Spark side is a codegen'd scalar
    // expression (no shuffle, no join); the oracle inlines the identical
    // vocab and mirrors the greedy walk with a recursive CTE over DISTINCT
    // words (each word segmented once, then joined back to occurrences).
    // sum_ids + n_toks bind the exact segmentation: any deviation from
    // greedy longest-match changes one of them with overwhelming
    // probability. fert_bp = tokens per 10k words, integer math both sides.
    GraftQuery("x21_subword_tokens", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id",
          size(split(trim($"text"), "\\s+")).as("n_words"),
          subword_ids($"text").as("ids"))
        .select($"doc_id", $"n_words",
          size($"ids").as("n_toks"),
          expr("CAST(aggregate(ids, 0L, (a, x) -> a + x) AS BIGINT)").as("sum_ids"),
          expr("size(filter(ids, x -> x = 0))").as("n_unk"),
          expr("10000L * size(ids) div CAST(n_words AS BIGINT)").as("fert_bp"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH RECURSIVE
      vocab(id, piece) AS (VALUES ${graft.functions.SubwordVocab.sqlValues}),
      w AS (SELECT doc_id, u.word
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
                  FROM documents) t,
            unnest(t.arr) AS u(word)),
      dw AS (SELECT DISTINCT word FROM w),
      seg AS (
        SELECT word, 1 AS pos, 0 AS tok_id, 0 AS emitted FROM dw
        UNION ALL
        SELECT s.word,
          CAST(s.pos + COALESCE((SELECT MAX(length(v.piece)) FROM vocab v
             WHERE substr(s.word, s.pos, length(v.piece)) = v.piece), 1) AS INT),
          CAST(COALESCE((SELECT v.id FROM vocab v
             WHERE substr(s.word, s.pos, length(v.piece)) = v.piece
               AND length(v.piece) = (SELECT MAX(length(v2.piece)) FROM vocab v2
                  WHERE substr(s.word, s.pos, length(v2.piece)) = v2.piece)), 0) AS INT),
          1
        FROM seg s WHERE s.pos <= length(s.word)),
      toks AS (SELECT word, tok_id FROM seg WHERE emitted = 1),
      ws AS (SELECT word, COUNT(*) AS n_toks, SUM(tok_id) AS sum_ids,
               SUM(CASE WHEN tok_id = 0 THEN 1 ELSE 0 END) AS n_unk
             FROM toks GROUP BY word),
      ds AS (SELECT w.doc_id, COUNT(*) AS n_words, SUM(ws.n_toks) AS n_toks,
               SUM(ws.sum_ids) AS sum_ids, SUM(ws.n_unk) AS n_unk
             FROM w JOIN ws USING (word) GROUP BY w.doc_id)
      SELECT doc_id, CAST(n_words AS INT) AS n_words, CAST(n_toks AS INT) AS n_toks,
        CAST(sum_ids AS BIGINT) AS sum_ids, CAST(n_unk AS INT) AS n_unk,
        CAST((10000 * n_toks) // n_words AS BIGINT) AS fert_bp
      FROM ds ORDER BY doc_id""")),

    // ----- x12's packing, budgeted in real tokenizer units: same
    // contiguous-fill pack assignment, but n_toks is the subword count, so
    // a 2048-token pack is 2048 *model* tokens. Same two-pass rangedCumSum
    // (no unpartitioned window); the tokenizer adds zero shuffles.
    GraftQuery("x21_subword_packing", (s, d) => {
      import s.implicits._
      val budget = 2048
      val docs = T.documents(s, d).select($"doc_id",
        size(subword_ids($"text")).cast(LongType).as("n_toks"))
      SkewUtils.rangedCumSum(docs, Seq("doc_id"), "n_toks", 32, "cum_toks")
        .select($"doc_id", $"n_toks", $"cum_toks",
          floor(($"cum_toks" - $"n_toks") / budget).cast(LongType).as("pack_id"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH RECURSIVE
      vocab(id, piece) AS (VALUES ${graft.functions.SubwordVocab.sqlValues}),
      w AS (SELECT doc_id, u.word
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
                  FROM documents) t,
            unnest(t.arr) AS u(word)),
      dw AS (SELECT DISTINCT word FROM w),
      seg AS (
        SELECT word, 1 AS pos, 0 AS emitted FROM dw
        UNION ALL
        SELECT s.word,
          CAST(s.pos + COALESCE((SELECT MAX(length(v.piece)) FROM vocab v
             WHERE substr(s.word, s.pos, length(v.piece)) = v.piece), 1) AS INT),
          1
        FROM seg s WHERE s.pos <= length(s.word)),
      ws AS (SELECT word, COUNT(*) AS n_toks FROM seg WHERE emitted = 1 GROUP BY word),
      d0 AS (SELECT w.doc_id, CAST(SUM(ws.n_toks) AS BIGINT) AS n_toks
             FROM w JOIN ws USING (word) GROUP BY w.doc_id),
      c AS (SELECT doc_id, n_toks,
              CAST(SUM(n_toks) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks
            FROM d0)
      SELECT doc_id, n_toks, cum_toks,
        CAST(floor((cum_toks - n_toks) / 2048) AS BIGINT) AS pack_id
      FROM c ORDER BY doc_id""")),

    // ----- x29: merge-order BPE token counts — the classic byte-pair
    // encoding loop (Sennrich 2016), where MERGE RANK, not piece length,
    // decides the segmentation (x21's greedy longest-match cannot
    // reproduce a real GPT-2/Llama vocab; this can). Codegen'd
    // BpeTokenCount expression with a per-thread word memo; the oracle
    // replays the identical loop as a recursive CTE over distinct words —
    // state wrapped as (tok)(tok)… so replace() fuses exactly the
    // leftmost-non-overlapping occurrences the Scala loop does, one
    // lowest-applicable-rank merge per recursion level, fixpoint row = the
    // final segmentation. Identical merge table inlined from
    // BpeMerges.sqlValues — the two sides cannot drift. The oracle LEFT
    // JOINs back to documents so punctuation-only docs still emit (0, 0),
    // matching the Spark side's per-document projection.
    GraftQuery("x29_bpe_tokens", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id",
          size(filter(split(lower($"text"), "[^a-z0-9]+"), w => length(w) > 0))
            .cast(LongType).as("n_words"),
          bpe_token_count($"text").cast(LongType).as("n_bpe"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH RECURSIVE
      merges(rank, a, b) AS (VALUES ${graft.functions.BpeMerges.sqlValues}),
      tw AS (SELECT doc_id, u.word
             FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS arr
                   FROM documents) t, unnest(t.arr) AS u(word)
             WHERE u.word <> ''),
      words AS (SELECT DISTINCT word FROM tw),
      st(word, state) AS (
        SELECT word, regexp_replace(word, '(.)', '(\\1)', 'g') FROM words
        UNION ALL
        SELECT st.word,
          replace(st.state, '(' || m.a || ')(' || m.b || ')', '(' || m.a || m.b || ')')
        FROM st JOIN merges m ON m.rank = (
          SELECT MIN(m2.rank) FROM merges m2
          WHERE position('(' || m2.a || ')(' || m2.b || ')' IN st.state) > 0)),
      fin AS (SELECT word, length(state) - length(replace(state, '(', '')) AS n_tok
              FROM st
              WHERE NOT EXISTS (SELECT 1 FROM merges m
                WHERE position('(' || m.a || ')(' || m.b || ')' IN st.state) > 0)),
      agg AS (SELECT t.doc_id, COUNT(*) AS n_words,
                     CAST(SUM(f.n_tok) AS BIGINT) AS n_bpe
              FROM tw t JOIN fin f ON t.word = f.word
              GROUP BY t.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(agg.n_words, 0) AS BIGINT) AS n_words,
        CAST(COALESCE(agg.n_bpe, 0)   AS BIGINT) AS n_bpe
      FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
      ORDER BY d.doc_id""")),

    // rolling-hash + djb2 fingerprints — both are simple byte folds, so the
    // oracle recomputes them exactly in DuckDB: djb2 as a HUGEINT mod-2^64
    // fold (same shape as f_hash_native), Karp-Rabin as a fold of
    // h*257 + byte mod 2^31-1 (GraftCodec.karpRabin). Exact vectors also in
    // GraftExpressionsSpec.
    GraftQuery("x4_fingerprint_native", (s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id",
        kr_fingerprint($"text").as("kr_fp"),
        djb2_hash($"text").as("djb2_fp"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(list_reduce(
          list_prepend(CAST(0 AS HUGEINT),
            list_transform(range(1, length(text) + 1),
              i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS HUGEINT))),
          (h, c) -> (h * 257 + c) % CAST(2147483647 AS HUGEINT)) AS BIGINT) AS kr_fp,
        lpad(lower(hex(CAST(list_reduce(
          list_prepend(CAST(5381 AS HUGEINT),
            list_transform(range(1, length(text) + 1),
              i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS HUGEINT))),
          (h, c) -> (h * 33 + c) % CAST('18446744073709551616' AS HUGEINT)) AS UBIGINT))),
          16, '0') AS djb2_fp
      FROM documents ORDER BY doc_id""")),

    // ----- x27: corpus n-gram statistics — top-k bigrams by frequency,
    // the vocabulary/collocation-mining pass of a training-data pipeline
    // (feeds tokenizer training and boilerplate detection). Bigrams are
    // built map-side with one zip_with over the shifted token array (no
    // split() re-evaluation, no self-join), exploded, and counted by a
    // partial/final hash agg; the global top-k is TakeOrderedAndProject
    // (per-partition heaps), never a full sort of the n-gram space —
    // at 100 TB the bigram key space is billions of rows and a global
    // sort would be the bottleneck. Ties broken by bigram text for a
    // deterministic gate.
    GraftQuery("x27_ngram_topk", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        WITH toks AS (SELECT doc_id, split(trim(lower(text)), '\\s+') AS t FROM documents),
        bg AS (SELECT explode(zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),
                 (a, b) -> concat(a, ' ', b))) AS bigram FROM toks)
        SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
        ORDER BY cnt DESC, bigram LIMIT 20""")
    }, Some("""
      WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
      bg AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram FROM toks)
      SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
      ORDER BY cnt DESC, bigram LIMIT 20"""))
  )
}
