package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed subword vocabulary + greedy longest-match tokenizer — the
  * vocab-faithful half of the corpus token-budget story (SURVEY §2.2 N4/x3).
  * The whitespace/regex token counts (x3) are budget *estimates*; a training
  * pipeline budgets in tokenizer units, so sequence packing and token
  * accounting need the segmentation an actual subword vocab produces.
  *
  * The vocabulary is a compile-time constant (id = position + 1, 0 = UNK)
  * so both the Spark side and the DuckDB oracle can share it verbatim — the
  * oracle inlines the same (id, piece) pairs and mirrors the greedy
  * longest-match walk with a recursive CTE. A production vocab would be
  * 32-256k learned merges loaded from a file and broadcast; the matcher
  * below (first-char index, candidates longest-first) is exactly the lookup
  * structure that broadcast would hold, and tokenization stays a per-row
  * scalar — no shuffle, no join, embarrassingly parallel at 100 TB.
  *
  * Semantics (WordPiece-style greedy, not merge-order BPE — deterministic
  * and SQL-mirrorable): words are maximal non-whitespace runs; within a
  * word, repeatedly take the longest vocab piece matching at the cursor;
  * if none matches, emit UNK (id 0) and advance one character. Ties are
  * impossible: pieces are distinct, so at most one piece of a given length
  * matches at a position.
  */
object SubwordVocab {
  val UnkId = 0

  /** Distinct pieces; id = index + 1. BPE-merge-flavored multi-char pieces
    * first, then single-character fallbacks (a-z, 0-9). */
  val Pieces: IndexedSeq[String] = IndexedSeq(
    "the", "ing", "ion", "tion", "er", "an", "re", "he", "in", "ed",
    "nd", "at", "en", "es", "or", "ti", "te", "ow", "al", "le",
    "st", "ar", "ta", "ab", "ue", "va", "val", "row", "scan", "fast",
    "slow", "tab", "win", "dow", "col", "umn", "data", "key", "agg", "hash",
    "part", "join", "merge", "batch", "line", "query", "spark", "small", "big", "vec",
    "tor", "ord", "cust", "omer", "filt", "group") ++
    ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)

  require(Pieces.distinct.length == Pieces.length, "vocab pieces must be distinct")

  /** First-char index; candidates longest-first so the first prefix match
    * IS the greedy longest match. */
  private val byFirst: Map[Char, Array[(String, Int)]] =
    Pieces.zipWithIndex.map { case (p, i) => (p, i + 1) }
      .groupBy(_._1.charAt(0))
      .map { case (c, ps) =>
        c -> ps.sortBy { case (p, id) => (-p.length, id) }.toArray
      }

  private val NoCands = Array.empty[(String, Int)]

  /** Greedy longest-match ids for one word, appended to `out`. */
  private def tokenizeWord(w: String, from: Int, until: Int,
      out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    var pos = from
    while (pos < until) {
      val cands = byFirst.getOrElse(w.charAt(pos), NoCands)
      var hit = -1
      var hitLen = 0
      var i = 0
      while (i < cands.length && hit < 0) {
        val (p, id) = cands(i)
        if (pos + p.length <= until && w.startsWith(p, pos)) { hit = id; hitLen = p.length }
        i += 1
      }
      if (hit < 0) { out += UnkId; pos += 1 }
      else { out += hit; pos += hitLen }
    }
  }

  /** Token ids for a whole text: each maximal non-whitespace run is a word,
    * tokenized greedily. Called from codegen'd projections (see
    * [[SubwordTokenIds]]) — one static call per row, codegen-friendly. */
  def tokenizeIds(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length / 2 + 1)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) tokenizeWord(s, start, i, out)
    }
    new GenericArrayData(out.toArray)
  }

  /** The oracle's inline copy of the vocab: `(1, 'the'), (2, 'ing'), …` —
    * interpolated into DuckDB `VALUES` so both engines tokenize against
    * byte-identical tables. */
  def sqlValues: String =
    Pieces.zipWithIndex.map { case (p, i) => s"(${i + 1}, '$p')" }.mkString(", ")
}
