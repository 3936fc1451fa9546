package graft.functions

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests (SURVEY.md §5.5) over deterministic seeded samples:
  * codec round-trips on arbitrary byte content, hash stability, MinHash
  * estimation accuracy against exact Jaccard on random sets. */
class PropertySpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default.withSize(100), Seed(42L + i)))

  test("lz4/zstd round-trip arbitrary byte arrays including non-UTF8") {
    val gen = Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    for (bytes <- samples(gen, 60) :+ Array.empty[Byte] :+ Array.fill(1 << 20)(7.toByte)) {
      assert(GraftCodec.lz4Decompress(GraftCodec.lz4Compress(bytes)).sameElements(bytes))
      assert(GraftCodec.zstdDecompress(GraftCodec.zstdCompress(bytes, 3)).sameElements(bytes))
    }
  }

  test("hashes are stable and sensitive to single-byte changes") {
    val gen = Gen.alphaNumStr.suchThat(_.nonEmpty)
    for (s <- samples(gen, 50)) {
      val b = s.getBytes("UTF-8")
      assert(GraftCodec.djb2Hex(b) == GraftCodec.djb2Hex(b.clone()))
      assert(GraftCodec.karpRabin(b) == GraftCodec.karpRabin(b.clone()))
      val mutated = b.clone(); mutated(0) = (mutated(0) ^ 1).toByte
      assert(GraftCodec.fnv1a64(b) != GraftCodec.fnv1a64(mutated))
    }
  }

  test("minhash signature match-rate estimates jaccard within 0.15 (128 hashes)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val universe = (1 to 400).map(i => s"tok$i")
    val pairs = (1 to 8).map { _ =>
      val a = rnd.shuffle(universe).take(120).toSet
      val keep = rnd.nextInt(120)
      val b = rnd.shuffle(a.toSeq).take(keep).toSet ++ rnd.shuffle(universe.filterNot(a)).take(120 - keep)
      (a, b)
    }
    val df = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong * 2, a.toSeq), (i.toLong * 2 + 1, b.toSeq))
    }.toDF("id", "sh")
      .select($"id", GraftFunctions.minhash_signature(transform($"sh", x => xxhash64(x)), 128).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val est = sigs(i * 2L).zip(sigs(i * 2L + 1)).count { case (x, y) => x == y } / 128.0
      assert(math.abs(est - exact) < 0.15, s"pair $i: est $est vs exact $exact")
    }
  }

  test("derive_bytes is deterministic, length-exact, and seed-sensitive") {
    for (n <- Seq(1, 16, 31, 32, 33, 100)) {
      val e = DeriveBytes(org.apache.spark.sql.catalyst.expressions.Literal("seed"), n)
      val a = e.nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString("seed")).asInstanceOf[Array[Byte]]
      val b = e.nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString("seed")).asInstanceOf[Array[Byte]]
      val c = e.nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString("tead")).asInstanceOf[Array[Byte]]
      assert(a.length == n && a.sameElements(b) && !a.sameElements(c))
    }
  }
}
