package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for the 100 TB design point (SURVEY.md
  * §4 physical-execution choices). AQE's skew-join split handles most cases
  * at runtime; these are the explicit forms for when a hot key is known or
  * an aggregation funnels into few groups.
  */
object SkewUtils {

  /** Two-phase salted aggregation: spread a hot group key over `buckets`
    * partial groups, aggregate, then combine. Correct for any commutative
    * re-aggregatable pair (partial, combine) — e.g. (count, sum),
    * (sum, sum), (max, max).
    *
    * At scale: phase 1 shuffles on (key, salt) — `buckets`× more groups, no
    * single reducer receives the whole hot key; phase 2 shuffles only one
    * row per (key, salt).
    */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      buckets: Int,
      partial: Column => Column,
      valueCol: Column,
      combine: Column => Column): DataFrame = {
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(partial(valueCol).as("__partial"))
      .groupBy(col("__k"))
      .agg(combine(col("__partial")).as("__agg"))
  }

  /** Band (range) join via bucketing: |left.v - right.v| < width pairs can
    * only live in adjacent floor(v/width) buckets, so exploding one side to
    * its three candidate buckets turns the theta join into an equi join —
    * the J5 scale path (a BNLJ over two fact tables would be quadratic).
    * The exact predicate is re-applied after the bucket join, so the result
    * is identical to the naive form. */
  def bandJoin(
      left: DataFrame, leftVal: String,
      right: DataFrame, rightVal: String,
      width: Double): DataFrame = {
    val lb = left.withColumn("__b",
      explode(array(floor(col(leftVal) / width) - 1, floor(col(leftVal) / width),
        floor(col(leftVal) / width) + 1)))
    val rb = right.withColumn("__b", floor(col(rightVal) / width))
    lb.join(rb, lb("__b") === rb("__b") &&
        lb(leftVal) < rb(rightVal) && rb(rightVal) - lb(leftVal) < width)
      .drop("__b")
  }

  /** Salted join of a skewed fact against a dimension: the fact side gets a
    * random-ish deterministic salt in [0, buckets); the dim side is
    * replicated `buckets`× (explode) so every (key, salt) pair finds its
    * match. Use when one fact key dominates and the dim is too large to
    * broadcast outright but small enough to replicate `buckets`×.
    */
  def saltedJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factKey), spark_partition_id(), monotonically_increasing_id()), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))).withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(replicatedDim,
      saltedFact(factKey) === replicatedDim(dimKey) && saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
