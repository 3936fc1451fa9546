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

    // ----- language ID: character-bigram evidence score (synthetic corpus is
    // English-shaped regardless of its lang label; the heuristic is the
    // deterministic contract, not the label)
    GraftQuery("x1_langid", (s, d) => {
      import s.implicits._
      val score = (occ($"text", "th") + occ($"text", "he") +
        occ($"text", "er") + occ($"text", "an")).cast(IntegerType)
      T.documents(s, d).select(
        $"doc_id", $"lang".as("labeled_lang"),
        score.as("en_score"),
        when(score >= 10, "en").otherwise("unk").as("pred_lang"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, lang, text,
        CAST((length(text) - length(replace(text, 'th', ''))) +
             (length(text) - length(replace(text, 'he', ''))) +
             (length(text) - length(replace(text, 'er', ''))) +
             (length(text) - length(replace(text, 'an', ''))) AS INT) AS en_score
        FROM documents)
      SELECT doc_id, lang AS labeled_lang, en_score,
        CASE WHEN en_score >= 10 THEN 'en' ELSE 'unk' END AS pred_lang
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

    // rolling-hash + djb2 fingerprints (engine-specific: exact vectors in
    // GraftExpressionsSpec; rows-only here)
    GraftQuery("x4_fingerprint_native", (s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id",
        kr_fingerprint($"text").as("kr_fp"),
        djb2_hash($"text").as("djb2_fp"))
        .orderBy($"doc_id")
    }, None)
  )
}
