package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for ad-hoc stage timing (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val sets = operators.DedupQueries.docShingles(spark, d).cache()
    time("sets materialize")(sets.count())
    val sig = sets
      .withColumn("hashes", transform($"sh", x => xxhash64(x)))
      .withColumn("sig", minhash_signature($"hashes", 128))
    time("sig count")(sig.count())
    val bands = sig.select($"doc_id",
        posexplode(transform(sequence(lit(0), lit(31)),
          b => hash(slice($"sig", b * 4 + 1, lit(4))))))
      .toDF("doc_id", "band_id", "band_hash")
    time("bands count")(bands.count())
    val bc = bands.cache()
    time("bands cache")(bc.count())
    val cand = bc.as("x").join(bc.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    time("cand count")(println("candidates: " + cand.count()))
    time("full n2")(SparkEntry.queries("n2_minhash_lsh")(spark, d).count())
    time("full n3 exact")(SparkEntry.queries("n3_ngram_jaccard")(spark, d).count())
    spark.stop()
  }
}
