package graft.functions

import graft.SparkTestBase
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class GraftExpressionsSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  private def oneString(v: String) = {
    import spark.implicits._
    Seq(v).toDF("s")
  }

  test("lz4 round-trips empty, short, and highly-repetitive payloads") {
    for (s <- Seq("", "x", "abc", "ab" * 10000, "the quick brown fox")) {
      val got = new String(GraftCodec.lz4Decompress(GraftCodec.lz4Compress(s.getBytes("UTF-8"))), "UTF-8")
      assert(got == s)
    }
    // compression actually compresses repetitive input
    assert(GraftCodec.lz4Compress(("ab" * 10000).getBytes).length < 1000)
  }

  test("zstd round-trips and frames carry content size") {
    for (s <- Seq("", "z", "spark " * 5000)) {
      val got = new String(GraftCodec.zstdDecompress(GraftCodec.zstdCompress(s.getBytes("UTF-8"), 3)), "UTF-8")
      assert(got == s)
    }
  }

  test("lz4 decompress rejects corrupt input") {
    intercept[Exception] { GraftCodec.lz4Decompress(Array[Byte](0, 0)) }
  }

  test("compression expressions are null-safe in a DataFrame plan") {
    import spark.implicits._
    val df = Seq(Some("hello"), None).toDF("s")
      .select(lz4_decompress(lz4_compress($"s".cast(BinaryType))).cast(StringType).as("rt"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("hello", null))
  }

  test("djb2 matches the reference algorithm's known vectors") {
    // independently computed: djb2 over bytes, 64-bit wrap, %016x
    assert(GraftCodec.djb2Hex("abc".getBytes) == "000000000b885c8b")
    assert(GraftCodec.djb2Hex("".getBytes) == "0000000000001505")
    val got = oneString("abc").select(djb2_hash(col("s"))).head.getString(0)
    assert(got == "000000000b885c8b")
  }

  test("karp-rabin fingerprint matches known vector and is order-sensitive") {
    assert(GraftCodec.karpRabin("abc".getBytes) == 6432038L)
    assert(GraftCodec.karpRabin("acb".getBytes) != GraftCodec.karpRabin("abc".getBytes))
  }

  test("fnv1a64 matches the published test vector") {
    assert(GraftCodec.fnv1a64("abc".getBytes) == -1792535898324117685L) // 0xe71fa2190541574b
  }

  test("simhash: identical token sets collide, near sets are close, far sets are far") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (2L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (3L, Seq("a", "b", "c", "d", "e", "f", "g", "x")),
      (4L, Seq("q", "r", "s", "t", "u", "v", "w", "z"))
    ).toDF("id", "toks").select($"id", simhash64($"toks").as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("minhash signature: identical sets agree; match fraction tracks jaccard") {
    import spark.implicits._
    val a = (1 to 100).map(i => s"s$i")
    val b = (51 to 150).map(i => s"s$i") // jaccard with a = 50/150 = 1/3
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("id", "sh")
      .select($"id", minhash_signature(transform($"sh", x => xxhash64(x)), 128).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val matches = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y } / 128.0
    assert(math.abs(matches - 1.0 / 3.0) < 0.15, s"minhash estimate $matches too far from 1/3")
  }

  test("cosine similarity: identity, orthogonality, known value") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 0f, 0f), Seq(1f, 0f, 0f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 2f, 2f), Seq(2f, 1f, 2f))
    ).toDF("a", "b").select(cosine_sim($"a", $"b").as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) - 8.0 / 9.0) < 1e-12)
  }

  test("custom functions are SQL-registered") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT djb2_hash('abc') AS h, kr_fingerprint('abc') AS k").head()
    assert(r.getString(0) == "000000000b885c8b" && r.getLong(1) == 6432038L)
  }

  test("derive_bytes / rsb1_decode / minhash_signature are SQL-registered") {
    GraftFunctions.registerAll(spark)
    val d = spark.sql(
      "SELECT hex(derive_bytes('seed', 8)) AS h8, hex(derive_bytes('seed', 16)) AS h16").head()
    assert(d.getString(0).length == 16 && d.getString(1).length == 32)
    assert(d.getString(1).startsWith(d.getString(0)), "counter-chain prefix property")
    val enc = GraftCodec.rsb1Encode("sql path".getBytes("UTF-8"))
    val hexStr = enc.map(b => f"$b%02x").mkString
    val r = spark.sql(
      s"SELECT cast(rsb1_decode(unhex('$hexStr')) AS STRING) AS s").head()
    assert(r.getString(0) == "sql path")
    val m = spark.sql(
      "SELECT size(minhash_signature(array(1L, 2L, 3L), 16)) AS n").head()
    assert(m.getInt(0) == 16)
  }

  test("subword tokenizer: greedy longest-match, unk fallback, whitespace split") {
    import graft.functions.SubwordVocab
    def id(p: String): Int = SubwordVocab.Pieces.indexOf(p) + 1
    def tok(s: String): Seq[Int] = {
      import spark.implicits._
      Seq(s).toDF("t").select(subword_ids(col("t"))).head().getSeq[Int](0)
    }
    // greedy takes "the" (3) over "th"/"t"; "ory" → "or" + "y"
    assert(tok("theory") == Seq(id("the"), id("or"), id("y")))
    // longest piece wins at each cursor: "tion" (4) over "ti"/"ion"
    assert(tok("nation") == Seq(id("n"), id("at"), id("ion")) ||
      tok("nation") == Seq(id("na"), id("tion")) ||
      tok("nation") == Seq(id("n"), id("a"), id("tion")),
      s"got ${tok("nation")}")
    // deterministic single segmentation — pin the exact one
    assert(tok("nation") == Seq(id("n"), id("at"), id("ion")),
      "at pos 1, 'at' (len 2) beats 'a'; then 'ion'")
    // unknown characters emit UNK=0 and advance one char
    assert(tok("x#y") == Seq(id("x"), 0, id("y")))
    // whitespace runs split words; empty text → empty ids
    assert(tok("the  the") == Seq(id("the"), id("the")))
    assert(tok("") == Seq.empty)
    // vocab sanity: ids are dense 1..N, pieces distinct
    assert(SubwordVocab.Pieces.distinct.length == SubwordVocab.Pieces.length)
    // SQL registration
    GraftFunctions.registerAll(spark)
    val n = spark.sql("SELECT size(subword_ids('fastest scan')) AS n").head().getInt(0)
    // fastest = fast + es + t; scan = scan
    assert(n == 4)
  }

  test("BPE merge loop: rank priority, leftmost-non-overlap, memo-free equivalence") {
    import graft.functions.BpeMerges
    // rank 0 is t+h, so "the" forms th before any e-merge could apply
    assert(BpeMerges.segment("the").toSeq == Seq("the"))
    assert(BpeMerges.segment("scan").toSeq == Seq("sc", "an"))
    assert(BpeMerges.segment("query").toSeq == Seq("qu", "er", "y"))
    assert(BpeMerges.segment("window").toSeq == Seq("w", "in", "d", "ow"))
    assert(BpeMerges.segment("batch").toSeq == Seq("batch"))
    // merge rank decides, not piece length: "er" forms before "re" could
    assert(BpeMerges.segment("ere").toSeq == Seq("er", "e"))
    // leftmost-non-overlapping within one level: t h t h fuses both
    assert(BpeMerges.segment("thth").toSeq == Seq("th", "th"))
    // no applicable merge: stays characters
    assert(BpeMerges.segment("zzz").toSeq == Seq("z", "z", "z"))
    // tokenCount splits like the oracle regex (non-alphanumeric, lowercase)
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeMerges.tokenCount(UTF8String.fromString("The scan, the scan!")) == 6)
    assert(BpeMerges.tokenCount(UTF8String.fromString("")) == 0)
  }

  test("count_min_estimate: agrees with the library probe, never underestimates") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val words = Seq.tabulate(500)(i => s"w${i % 37}")
    val df = words.toDF("term")
    val skRow = df.agg(expr("count_min_sketch(term, 0.01d, 0.99d, 7)").as("sk")).head()
    val bytes = skRow.getAs[Array[Byte]](0)
    val lib = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val probed = df.distinct()
      .crossJoin(df.agg(expr("count_min_sketch(term, 0.01d, 0.99d, 7)").as("sk")))
      .select($"term", GraftFunctions.count_min_estimate($"sk", $"term").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    probed.foreach { case (t, est) =>
      assert(est == lib.estimateCount(t), s"native probe drifted from library for $t")
      assert(est >= exact(t), s"CMS underestimated $t: $est < ${exact(t)}")
    }
    // SQL registration path
    val viaSql = spark.sql(
      "SELECT count_min_estimate(count_min_sketch(t, 0.01d, 0.99d, 7), 'a') AS e " +
      "FROM VALUES ('a'), ('a'), ('b') AS v(t)").head().getLong(0)
    assert(viaSql >= 2L)
  }
}
