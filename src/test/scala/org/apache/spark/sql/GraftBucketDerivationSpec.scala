package org.apache.spark.sql

import org.apache.spark.sql.connector.expressions.{Expressions, LiteralValue}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types.LongType

/** Unit coverage for the RUNTIME (DSv2-predicate) leg of the bucket
  * derivation — the shapes Spark's dynamic-partition-pruning rule hands to
  * `Scan.filter`. In-package because `LiteralValue` is `private[sql]`; the
  * end-to-end DPP path (filter planted, files pruned) is pinned in
  * `CatalogSpec`. */
class GraftBucketDerivationSpec extends graft.SparkTestBase {

  private def lv(v: Long) = LiteralValue[Any](v, LongType)
  private def bucketOf(vs: Long*): Set[Int] = vs.map { v =>
    spark.sql(s"SELECT pmod(xxhash64(CAST($v AS BIGINT)), 8)")
      .head().getLong(0).toInt
  }.toSet

  test("IN and = predicates over the merge key derive exact buckets") {
    val d = new GraftBucketDerivation(Seq("k"), 8, "gbucket")
    val col = Expressions.column("k")
    val in = new Predicate("IN", Array(col, lv(7L), lv(13L)))
    assert(d.deriveBucketsV2(Array(in)) === Some(bucketOf(7L, 13L)))
    val eq = new Predicate("=", Array(lv(7L), col)) // literal-first order too
    assert(d.deriveBucketsV2(Array(eq)) === Some(bucketOf(7L)))
  }

  test("non-key predicates and partially-pinned compound keys derive nothing") {
    val d = new GraftBucketDerivation(Seq("k"), 8, "gbucket")
    val other = new Predicate("IN",
      Array(Expressions.column("nope"), lv(1L)))
    assert(d.deriveBucketsV2(Array(other)) === None)
    // compound merge key: ALL columns must be pinned (hash folds in order)
    val d2 = new GraftBucketDerivation(Seq("a", "b"), 8, "gbucket")
    val pa = new Predicate("=", Array(Expressions.column("a"), lv(1L)))
    val pb = new Predicate("=", Array(Expressions.column("b"), lv(2L)))
    assert(d2.deriveBucketsV2(Array(pa)) === None)
    val expect2 = spark.sql(
      "SELECT pmod(xxhash64(CAST(1 AS BIGINT), CAST(2 AS BIGINT)), 8)")
      .head().getLong(0).toInt
    assert(d2.deriveBucketsV2(Array(pa, pb)) === Some(Set(expect2)))
  }
}
