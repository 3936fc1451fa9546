package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Merge-order BPE segmentation — the second half of the tokenizer story
  * (SURVEY §2.2 N4/x3): [[SubwordVocab]] is WordPiece-style greedy
  * longest-match against a fixed vocabulary; THIS is the classic byte-pair
  * encoding loop (Sennrich et al. 2016) against an ordered merge table:
  * repeatedly pick the LOWEST-RANK merge whose pair occurs anywhere in the
  * current token sequence and fuse every leftmost-non-overlapping
  * occurrence, until no merge applies. Merge order — not piece length —
  * decides the segmentation, which is what makes real BPE vocabularies
  * (GPT-2, Llama) irreproducible by greedy matching.
  *
  * The merge table is a compile-time constant so the DuckDB oracle can
  * inline the identical (rank, a, b) rows and replay the identical loop as
  * a recursive CTE: state = tokens wrapped as `(tok)(tok)…` (the wrapper
  * makes `replace()` leftmost-NON-OVERLAPPING exactly like the loop below —
  * with a bare separator, adjacent occurrences share the boundary char and
  * `replace` silently skips every other one); one merge per recursion
  * level, fixpoint row = the final segmentation. A production table is
  * 32-256k learned merges loaded and broadcast; per-row work is unchanged —
  * a scalar, no shuffle, embarrassingly parallel at 100 TB.
  */
object BpeMerges {

  /** Ordered merges (rank = index): each side is a token that must already
    * exist (single chars always do; composites once formed). */
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "r"), ("s", "t"), ("r", "e"), ("s", "c"),
    ("sc", "a"), ("sca", "n"), ("in", "g"), ("d", "a"), ("da", "t"),
    ("dat", "a"), ("k", "e"), ("ke", "y"), ("w", "i"), ("wi", "n"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"), ("a", "t"),
    ("b", "at"), ("bat", "c"), ("batc", "h"), ("o", "w"), ("r", "ow"))

  require(Merges.distinct.length == Merges.length, "merge table must be duplicate-free")

  /** (rank, 'a', 'b') rows for inlining the identical table in oracle SQL. */
  def sqlValues: String = Merges.zipWithIndex
    .map { case ((a, b), i) => s"($i, '$a', '$b')" }.mkString(", ")

  /** Segment one word by the merge loop. Leftmost-non-overlapping fusion
    * per level, lowest applicable rank first — the reference semantics the
    * oracle replays. */
  def segment(word: String): Array[String] = {
    var toks: Array[String] = word.map(_.toString).toArray
    var done = toks.length < 2
    while (!done) {
      var best = -1
      var r = 0
      while (r < Merges.length && best < 0) {
        val (a, b) = Merges(r)
        var j = 0
        while (j + 1 < toks.length && best < 0) {
          if (toks(j) == a && toks(j + 1) == b) best = r
          j += 1
        }
        r += 1
      }
      if (best < 0) done = true
      else {
        val (a, b) = Merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) {
            out += a + b; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
        done = toks.length < 2
      }
    }
    toks
  }

  // per-thread word → token-count memo: corpus words repeat massively, so
  // the loop runs once per distinct word per task, not once per occurrence
  private val memo = new ThreadLocal[java.util.HashMap[String, Integer]] {
    override def initialValue() = new java.util.HashMap[String, Integer]()
  }

  private def wordTokens(w: String): Int = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) hit.intValue()
    else {
      val n = segment(w).length
      if (m.size() < (1 << 16)) m.put(w, n) // bound the cache per thread
      n
    }
  }

  /** BPE token count of a text: words = maximal [a-z0-9]+ runs of the
    * lowercased text (identical to the oracle's split regex). */
  def tokenCount(text: UTF8String): Int = {
    // Locale.ROOT: a tr_TR JVM would map I to dotless ı (outside [a-z]),
    // silently diverging from the oracle's lower() and Spark's own lower()
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    var total = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = s.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        total += wordTokens(s.substring(i, j))
        i = j
      } else i += 1
    }
    total
  }
}
