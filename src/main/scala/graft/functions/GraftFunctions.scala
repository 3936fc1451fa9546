package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftSqlShim.{column, expression}

/** Column-API surface for the custom expressions, plus SQL registration so
  * `spark.sql` text can call them too (the `spark.udf.register` analogue of
  * the reference's Utils::AddFunction pattern, utils.hpp:16-52).
  */
object GraftFunctions {
  def lz4_compress(c: Column): Column = column(Lz4Compress(expression(c)))
  def lz4_decompress(c: Column): Column = column(Lz4Decompress(expression(c)))
  def zstd_compress(c: Column, level: Int = 3): Column =
    column(ZstdCompress(expression(c), level))
  def zstd_decompress(c: Column): Column = column(ZstdDecompress(expression(c)))
  def djb2_hash(c: Column): Column = column(Djb2Hash(expression(c)))
  def kr_fingerprint(c: Column): Column = column(KarpRabinFingerprint(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def minhash_signature(c: Column, n: Int): Column =
    column(MinHashSignature(expression(c), n))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def derive_bytes(c: Column, n: Int): Column = column(DeriveBytes(expression(c), n))
  def rsb1_decode(c: Column): Column = column(Rsb1Decode(expression(c)))
  def subword_ids(c: Column): Column = column(SubwordTokenIds(expression(c)))
  def bpe_token_count(c: Column): Column = column(BpeTokenCount(expression(c)))
  def count_min_estimate(sk: Column, term: Column): Column =
    column(CountMinEstimate(expression(sk), expression(term)))
  def sorted_intersect(a: Column, b: Column): Column =
    column(SortedLongIntersect(expression(a), expression(b)))

  /** Register the scalar functions for SQL texts. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("lz4_compress", e => Lz4Compress(e.head), "built-in")
    reg.createOrReplaceTempFunction("lz4_decompress", e => Lz4Decompress(e.head), "built-in")
    reg.createOrReplaceTempFunction("zstd_compress", e => ZstdCompress(e.head, 3), "built-in")
    reg.createOrReplaceTempFunction("zstd_decompress", e => ZstdDecompress(e.head), "built-in")
    reg.createOrReplaceTempFunction("djb2_hash", e => Djb2Hash(e.head), "built-in")
    reg.createOrReplaceTempFunction("kr_fingerprint", e => KarpRabinFingerprint(e.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64", e => SimHash64(e.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", e => CosineSimilarity(e.head, e(1)), "built-in")
    reg.createOrReplaceTempFunction("count_min_estimate", e => CountMinEstimate(e.head, e(1)), "built-in")
    reg.createOrReplaceTempFunction("rsb1_decode", e => Rsb1Decode(e.head), "built-in")
    reg.createOrReplaceTempFunction("subword_ids", e => SubwordTokenIds(e.head), "built-in")
    reg.createOrReplaceTempFunction("bpe_token_count", e => BpeTokenCount(e.head), "built-in")
    // SQL forms take the size/width as a literal second argument
    reg.createOrReplaceTempFunction("derive_bytes",
      e => DeriveBytes(e.head, e(1).eval(null).toString.toInt), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      e => MinHashSignature(e.head, e(1).eval(null).toString.toInt), "built-in")
  }
}
