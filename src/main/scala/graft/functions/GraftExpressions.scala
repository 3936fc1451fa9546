package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the semantics Spark's builtins lack
  * (SURVEY.md §2.3 "custom" rows). All are null-safe unary/binary scalar
  * expressions; CodegenFallback keeps them inside the generated pipeline as
  * a single virtual call — fine off the per-row hot path, and the compression
  * pair operates on whole payloads where JNI cost dominates anyway.
  */

/** LZ4 block compress with self-describing length header (fixes the
  * reference's expected-size API wart, crypt.hpp:400-470). Binary→Binary. */
case class Lz4Compress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    GraftCodec.lz4Compress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Lz4Compress = copy(c)
}

case class Lz4Decompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    GraftCodec.lz4Decompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Lz4Decompress = copy(c)
}

/** Zstd frame compress at a given level (reference bytecode payloads are
  * zstd frames, bytecode.cpp:130-155). Binary→Binary. */
case class ZstdCompress(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    GraftCodec.zstdCompress(v.asInstanceOf[Array[Byte]], level)
  override protected def withNewChildInternal(c: Expression): ZstdCompress =
    copy(child = c)
}

case class ZstdDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    GraftCodec.zstdDecompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): ZstdDecompress = copy(c)
}

/** The reference's `crypt.hash` (djb2 → 16 hex digits, crypt.hpp:346-369),
  * kept hash-compatible. String→String. doGenCode (a static call into
  * [[HashOps]]) rather than CodegenFallback: these scalar hashes sit in
  * per-row projection hot paths and a fallback expression would force the
  * whole containing stage out of whole-stage codegen. */
case class Djb2Hash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    HashOps.djb2(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.djb2($c)")
  override protected def withNewChildInternal(c: Expression): Djb2Hash = copy(c)
}

/** Karp-Rabin rolling-hash document fingerprint. String→Long. Codegen'd
  * via [[HashOps]] like Djb2Hash. */
case class KarpRabinFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashOps.karpRabin(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.karpRabin($c)")
  override protected def withNewChildInternal(c: Expression): KarpRabinFingerprint =
    copy(c)
}

/** 64-bit SimHash over a token array: each token FNV-1a-hashed, per-bit
  * vote, sign → bit. Array[String]→Long. Near-dup distance is then
  * bit_count(a ^ b) — a builtin. Codegen'd via [[HashOps]]. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashOps.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** MinHash signature of length n over a pre-hashed shingle array: the i-th
  * component is min over shingles of the i-th universal hash
  * a_i*h + b_i (mod 2^64). Array[Long]→Array[Long]. Empty input → MaxValue
  * rows (no shingle can collide with them). This is the N2 signature stage;
  * banding happens in plain DataFrame ops on the result. Codegen'd via
  * [[HashOps]] so the signature projection stays inside whole-stage
  * codegen.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashOps.minhash(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.minhash($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Static hash kernels callable from generated code (the same pattern as
  * [[VectorOps]] — Scala object methods get static forwarders, so the
  * generated Java calls them directly). */
object HashOps {
  def djb2(s: UTF8String): UTF8String =
    UTF8String.fromString(GraftCodec.djb2Hex(s.getBytes))

  def karpRabin(s: UTF8String): Long = GraftCodec.karpRabin(s.getBytes)

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = GraftCodec.fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          // fixed odd multipliers/offsets: deterministic across runs/engines
          val a = 0x9E3779B97F4A7C15L * (2 * k + 1)
          val b = 0xBF58476D1CE4E5B9L * (k + 1)
          val hk = a * h + b
          if (hk < sig(k)) sig(k) = hk
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Decode the reference's RSB1 compressed-payload container (XOR-masked
  * magic+size header, zstd body — bytecode.cpp:130-155). Binary→Binary.
  * The N5 "opaque payload decode" stage for message values. */
case class Rsb1Decode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    GraftCodec.rsb1Decode(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Rsb1Decode = copy(c)
}

/** Deterministic byte expansion of a seed to n bytes via a SHA-256 counter
  * chain — the honest equivalent of the reference's `crypt.derive`
  * (crypt.hpp:371-398). String→Binary. */
case class DeriveBytes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = {
    val seed = v.asInstanceOf[UTF8String].getBytes
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val out = new Array[Byte](n)
    var filled = 0
    var ctr = 0
    while (filled < n) {
      md.reset()
      md.update(seed)
      md.update(Array[Byte](
        (ctr >>> 24).toByte, (ctr >>> 16).toByte, (ctr >>> 8).toByte, ctr.toByte))
      val block = md.digest()
      val take = math.min(block.length, n - filled)
      System.arraycopy(block, 0, out, filled, take)
      filled += take
      ctr += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): DeriveBytes =
    copy(child = c)
}

/** Cosine similarity of two float vectors, accumulated in double in index
  * order (deterministic). Array[Float]×Array[Float]→Double.
  *
  * Implements doGenCode (a static call into [[VectorOps]]) rather than
  * CodegenFallback: a fallback expression would force the whole containing
  * stage out of whole-stage codegen, which matters in the ANN cross-join
  * inner loop. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Merge-order BPE token count of a text — String→Int, codegen'd via a
  * static call into [[BpeMerges]] (per-thread word memo), so tokenizer-true
  * budget accounting stays inside whole-stage codegen. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    BpeMerges.tokenCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeMerges.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression): BpeTokenCount = copy(c)
}

/** Greedy longest-match subword tokenization against the fixed
  * [[SubwordVocab]] — String→Array[Int] of token ids (0 = UNK). Codegen'd
  * via a static call so corpus-wide token accounting stays inside
  * whole-stage codegen; see [[SubwordVocab]] for semantics and the
  * broadcast-vocab scale story. */
case class SubwordTokenIds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SubwordVocab.tokenizeIds(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordVocab.tokenizeIds($c)")
  override protected def withNewChildInternal(c: Expression): SubwordTokenIds = copy(c)
}

/** Probe a serialized Spark `CountMinSketch` for a term's estimated count.
  * (Binary, String)→Long. Replaces the one UDF that remained on the a11
  * surface: codegen'd via a static call into [[CmsProbe]], whose per-thread
  * last-sketch cache makes the deserialization amortize to once per task
  * even when the probe sits in a per-row projection (the broadcast sketch
  * bytes are the same object for every row in a partition). */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(sk: Any, term: Any): Any =
    CmsProbe.estimate(sk.asInstanceOf[Array[Byte]], term.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (sk, t) => s"graft.functions.CmsProbe.estimate($sk, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
    copy(left = l, right = r)
}

object CmsProbe {
  // (bytes-identity, deserialized sketch) — reference equality is the right
  // key: the sketch bytes arrive as one broadcast/literal object reused
  // across rows, so a task deserializes once, and a different sketch can
  // never alias the same array instance
  private val last = new ThreadLocal[(Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]
  def estimate(bytes: Array[Byte], term: UTF8String): Long = {
    val cached = last.get()
    val sk =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val s = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bytes))
        last.set((bytes, s))
        s
      }
    sk.estimateCount(term.toString)
  }
}

/** Intersection of two SORTED long arrays (strictly increasing, as
  * produced by `sort_array` over distinct elements) — a linear merge walk,
  * no per-row hash set. (Array, Array)→Array. The g4 triangle closure's
  * inner kernel: per oriented edge (u,v) the common out-neighborhood
  * N+(u) ∩ N+(v) IS the triangle set that edge closes, so the walk
  * replaces materializing the wedge stream (41M rows at sf0.1) and
  * hash-probing each wedge against the edge relation. */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.sortedIntersect(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.sortedIntersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersect =
    copy(left = l, right = r)
}

/** Static vector kernels callable from generated code. */
object VectorOps {
  def sortedIntersect(a: ArrayData, b: ArrayData)
      : org.apache.spark.sql.catalyst.expressions.UnsafeArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (k == out.length) out
        else java.util.Arrays.copyOf(out, k))
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}
