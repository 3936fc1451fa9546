package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, Literal, Or}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zone-map layer unit behavior: manifest write/read round-trips footer
  * stats, hard-link carry-over reuses entries, and the interval logic only
  * ever prunes provably-empty files. */
class GraftStatsSpec extends SparkTestBase {

  private val rowSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("name", StringType),
    StructField("amount", LongType)))

  private def attr(n: String, dt: DataType = LongType) =
    AttributeReference(n, dt)()

  private def stats(col: String, mn: Any, mx: Any, kind: String = "l",
      nulls: Long = 0L, rows: Long = 10L): GraftStats.FileStats =
    Map(col -> GraftStats.ColStats(kind, nulls, rows, Some(mn), Some(mx)))

  test("interval logic: comparison shapes, conjunction, disjunction") {
    val s = stats("amount", 100L, 200L)
    def skip(e: Expression) = !GraftStats.mayContain(Seq(e), s)
    val a = attr("amount")
    assert(skip(EqualTo(a, Literal(99L))))
    assert(!skip(EqualTo(a, Literal(100L))))
    assert(!skip(EqualTo(a, Literal(150L))))
    assert(skip(EqualTo(Literal(201L), a)))
    assert(skip(LessThan(a, Literal(100L))))
    assert(!skip(LessThan(a, Literal(101L))))
    assert(skip(GreaterThan(a, Literal(200L))))
    assert(!skip(GreaterThanOrEqual(a, Literal(200L))))
    assert(skip(GreaterThanOrEqual(a, Literal(201L))))
    assert(skip(In(a, Seq(Literal(1L), Literal(99L), Literal(300L)))))
    assert(!skip(In(a, Seq(Literal(1L), Literal(150L)))))
    assert(skip(And(EqualTo(a, Literal(150L)), EqualTo(a, Literal(50L)))))
    assert(skip(Or(EqualTo(a, Literal(50L)), EqualTo(a, Literal(300L)))))
    assert(!skip(Or(EqualTo(a, Literal(50L)), EqualTo(a, Literal(150L)))))
    // unknown column / shapes never skip
    assert(!skip(EqualTo(attr("other"), Literal(1L))))
    assert(!skip(EqualTo(a, attr("other"))))
  }

  test("interval logic: nulls, widening, domain mismatches, strings") {
    val a = attr("amount")
    // all-null file: no comparison can match, IS NULL can
    val allNull = Map("amount" ->
      GraftStats.ColStats("l", 10L, 10L, None, None))
    assert(!GraftStats.mayContain(Seq(EqualTo(a, Literal(1L))), allNull))
    assert(GraftStats.mayContain(Seq(IsNull(a)), allNull))
    assert(!GraftStats.mayContain(Seq(IsNotNull(a)), allNull))
    // no-null file: IS NULL proves empty
    assert(!GraftStats.mayContain(Seq(IsNull(a)), stats("amount", 1L, 2L)))
    // unknown null count (-1): never skip on null predicates
    val unknownNulls = Map("amount" ->
      GraftStats.ColStats("l", -1L, 10L, Some(1L), Some(2L)))
    assert(GraftStats.mayContain(Seq(IsNull(a)), unknownNulls))
    // widened column: INT32 footer stats vs BIGINT literals share a domain
    assert(!GraftStats.mayContain(Seq(EqualTo(a, Literal(500L))),
      stats("amount", 100L, 200L)))
    // fractional literal vs integral stats: domain mismatch, keep
    assert(GraftStats.mayContain(
      Seq(EqualTo(attr("amount", DoubleType), Literal(500.0))),
      stats("amount", 100L, 200L)))
    // strings compare by UTF-8 bytes
    val n = attr("name", StringType)
    val sStats = stats("name", "gamma", "gulf", kind = "s")
    assert(!GraftStats.mayContain(
      Seq(EqualTo(n, Literal.create("alpha", StringType))), sStats))
    assert(GraftStats.mayContain(
      Seq(EqualTo(n, Literal.create("golf", StringType))), sStats))
  }

  test("manifest round-trips footer stats; carried files reuse entries") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stats_spec").toString + "/t"
    GraftStore.create(dir, GraftTableMeta(rowSchema, Seq("k"), buckets = 2))
    def insert(lo: Long, hi: Long): Long = GraftStore.applyChanges(spark, dir,
      spark.range(lo, hi).select($"id".as("k"),
        concat(lit("name"), $"id").as("name"), ($"id" * 10).as("amount"))
        .withColumn(GraftStore.OpCol, lit("I")), allInserts = true)
    insert(0L, 50L)   // v1
    insert(50L, 90L)  // v2: v1's files carried by hard link
    val m1 = GraftStats.readManifest(GraftStore.versionDir(dir, 1L))
    val m2 = GraftStats.readManifest(GraftStore.versionDir(dir, 2L))
    assert(m1.nonEmpty && m2.size > m1.size)
    // carried entries byte-identical (no footer re-read can drift them)
    m1.foreach { case (rel, st) => assert(m2(rel) === st,
      s"carried entry for $rel must round-trip unchanged") }
    // amount stats cover the inserted ranges exactly
    val amounts = m2.values.flatMap(_.get("amount")).toSeq
    assert(amounts.nonEmpty)
    assert(amounts.flatMap(_.min).map(_.asInstanceOf[Long]).min === 0L)
    assert(amounts.flatMap(_.max).map(_.asInstanceOf[Long]).max === 890L)
    // string stats present with the string kind
    assert(m2.values.flatMap(_.get("name")).forall(_.kind == "s"))
    // a version with no manifest reads as empty (legacy: nothing skips)
    Files.delete(Paths.get(GraftStore.versionDir(dir, 2L), GraftStats.ManifestName))
    assert(GraftStats.readManifest(GraftStore.versionDir(dir, 2L)).isEmpty)
  }
}
