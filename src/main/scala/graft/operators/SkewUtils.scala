package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

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
    * `saltOn` must be a stable row attribute (a value or id column): the
    * salt is its hash, so a retried task recomputes identical salts —
    * partition-id/monotonic-id salts would differ across retries and can
    * double- or drop-count rows when only part of a stage reruns.
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
      combine: Column => Column,
      saltOn: Column): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(saltOn), lit(buckets)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(partial(valueCol).as("__partial"))
      .groupBy(col("__k"))
      .agg(combine(col("__partial")).as("__agg"))
  }

  /** Distributed per-key row_number over a total order, without funneling
    * any single key through one reducer — the two-pass rank that replaces
    * `row_number()/percent_rank() over (partition by lowCardKey order by
    * ...)` when a key's row count exceeds one task's memory (a 5-value key
    * over 100 TB would otherwise hand ~20 TB to each of 5 reducers).
    *
    * Pass 1: range-repartition on (key ++ order) — each partition holds a
    * contiguous slice of the global order, bounded by N/numPartitions —
    * and rank locally within (partition, key). Pass 2: per-(partition,
    * key) row counts (a tiny aggregate: numPartitions × |keys| rows) are
    * prefix-summed into offsets and broadcast back. Global rank = local
    * rank + offset. `order` must be a total order within each key for a
    * deterministic result.
    *
    * Plan note: the local window re-exchanges on hash(__pid) after the
    * range exchange (Catalyst can't see that rows are already
    * pid-clustered), so the physical plan carries two linear shuffles.
    * Both are bounded by N/numPartitions per task — the point is that no
    * task ever holds a whole key, which is what kills the naive
    * `over (partition by lowCardKey)` at scale. */
  def rangedRowNumber(df: DataFrame, key: Seq[String], order: Seq[String],
                      numPartitions: Int, rankCol: String): DataFrame = {
    val sortCols = (key ++ order).map(col)
    val parts = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy((col("__pid") +: key.map(col)): _*)
      .orderBy(order.map(col): _*)
    val local = parts.withColumn("__ln", row_number().over(wLocal))
    val counts = local.groupBy((col("__pid") +: key.map(col)): _*)
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(key.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select((col("__pid") +: key.map(col)) :+ col("__off"): _*)
    local.join(broadcast(offsets), "__pid" +: key)
      .withColumn(rankCol, col("__off") + col("__ln"))
      .drop("__pid", "__ln", "__off")
  }

  /** Distributed global prefix sum over a total order — the two-pass
    * companion of [[rangedRowNumber]] for running totals with NO partition
    * key at all (`sum() over (order by ...)` puts the whole dataset on one
    * reducer). Pass 1: range-repartition on the order columns, local
    * running sum per partition. Pass 2: per-partition totals
    * (numPartitions rows — the only single-reducer step, bounded by the
    * partition count, not the data) prefix-summed into offsets, broadcast
    * back. `order` must be a total order for a deterministic result. */
  def rangedCumSum(df: DataFrame, order: Seq[String], valueCol: String,
                   numPartitions: Int, outCol: String): DataFrame = {
    val parts = df.repartitionByRange(numPartitions, order.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("__lc", sum(col(valueCol)).over(wLocal))
    val totals = local.groupBy(col("__pid")).agg(sum(col(valueCol)).as("__c"))
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__off") + col("__lc"))
      .drop("__pid", "__lc", "__off")
  }

  /** Keyed variant of [[rangedCumSum]]: running totals per key over a total
    * order within each key, without handing any whole key to one reducer —
    * `sum() over (partition by key order by ...)` funnels each key's entire
    * row set through a single task, which dies when one key holds TBs
    * (e.g. cumulative token counts per corpus source where one source
    * dominates). Pass 1: range-repartition on (key ++ order) — each
    * partition holds a contiguous slice of the (key, order) space — and
    * sum locally per (partition, key). Pass 2: per-(partition, key) totals
    * (a numPartitions × |keys-per-partition| aggregate) are prefix-summed
    * into per-key offsets and broadcast back. `order` must be a total
    * order within each key for a deterministic result. */
  def rangedCumSumByKey(df: DataFrame, key: Seq[String], order: Seq[String],
                        valueCol: String, numPartitions: Int, outCol: String): DataFrame = {
    val sortCols = (key ++ order).map(col)
    val parts = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy((col("__pid") +: key.map(col)): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("__lc", sum(col(valueCol)).over(wLocal))
    val totals = local.groupBy((col("__pid") +: key.map(col)): _*)
      .agg(sum(col(valueCol)).as("__c"))
    val wOff = Window.partitionBy(key.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select((col("__pid") +: key.map(col)) :+ col("__off"): _*)
    local.join(broadcast(offsets), "__pid" +: key)
      .withColumn(outCol, col("__off") + col("__lc"))
      .drop("__pid", "__lc", "__off")
  }

  /** Distributed EXCLUSIVE prefix-minimum over a total order — the
    * running-min companion of [[rangedCumSum]] (`min() over (order by ...
    * rows unbounded preceding and 1 preceding)` puts the whole dataset on
    * one reducer). Pass 1: range-repartition on the order columns, local
    * exclusive running min per partition. Pass 2: per-partition minima
    * (numPartitions rows — the only single-reducer step, bounded by the
    * partition count) prefix-combined exclusively into offsets, broadcast
    * back; the global exclusive prefix min is least(local, offset) — and
    * `least` skips nulls, so rows with no predecessor anywhere get null.
    * `order` must be a total order for a deterministic result.
    *
    * This is the 2-D skyline device (p10): sorted by (x, y), a distinct
    * point is Pareto-optimal iff every strict predecessor has a larger y —
    * i.e. its exclusive prefix-min of y is null or > y. */
  def rangedPrefixMin(df: DataFrame, order: Seq[String], valueCol: String,
                      numPartitions: Int, outCol: String): DataFrame = {
    val parts = df.repartitionByRange(numPartitions, order.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parts.withColumn("__lm", min(col(valueCol)).over(wLocal))
    val totals = local.groupBy(col("__pid")).agg(min(col(valueCol)).as("__m"))
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", min(col("__m")).over(wOff))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, least(col("__lm"), col("__off")))
      .drop("__pid", "__lm", "__off")
  }

  /** Point-in-interval join via bucket decomposition — the J9 scale path.
    * `points.pointTs ∈ [intervals.startTs, intervals.endTs)` is a theta
    * join that Spark can only execute as a broadcast-nested-loop (quadratic
    * when both sides are fact tables). Decomposing time into fixed
    * `bucketSeconds` buckets turns it into an equi join: a point lives in
    * exactly one bucket, an interval of length L covers at most
    * ceil(L/bucket)+1 buckets, so exploding the interval side by that small
    * constant and equi-joining on the bucket id shuffles both sides once on
    * a well-distributed key. The exact predicate is re-applied after the
    * bucket join, so the result is identical to the naive form. Pick
    * `bucketSeconds` ≈ the typical interval length: shorter buckets inflate
    * the interval explosion, longer ones inflate post-filter candidates. */
  def pointInIntervalJoin(points: DataFrame, pointTs: String,
                          intervals: DataFrame, startTs: String, endTs: String,
                          bucketSeconds: Long): DataFrame = {
    // a non-positive width would silently collapse every row into one
    // bucket (floor(x/0) saturates) — the all-pairs join this helper exists
    // to replace — rather than producing wrong answers; fail fast instead
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val w = lit(bucketSeconds * 1000000L)
    // cast handles TIMESTAMP_NTZ inputs (unix_micros only takes TIMESTAMP);
    // a session-TZ shift would move all buckets uniformly, which is
    // harmless — the exact predicate below re-filters candidates
    def micros(c: String) = unix_micros(col(c).cast(TimestampType))
    val ib = intervals.withColumn("__b", explode(sequence(
      floor(micros(startTs) / w), floor(micros(endTs) / w))))
    val pb = points.withColumn("__b", floor(micros(pointTs) / w))
    pb.join(ib, pb("__b") === ib("__b") &&
        pb(pointTs) >= ib(startTs) && pb(pointTs) < ib(endTs))
      .drop("__b")
  }

  /** Interval-overlap join via bucket decomposition — the two-sided
    * generalization of [[pointInIntervalJoin]] (J12). Half-open intervals
    * [aStart,aEnd) and [bStart,bEnd) overlap iff aStart < bEnd AND
    * bStart < aEnd — a theta join Spark can only run as a BNLJ. Both sides
    * explode to the fixed-width buckets they cover, so an overlapping pair
    * shares at least one bucket id; requiring the match to happen ONLY in
    * the bucket containing greatest(aStart, bStart) (the first bucket both
    * cover) makes each pair match exactly once — no post-join dedup
    * shuffle. The exact overlap predicate is re-applied, so the result is
    * identical to the naive form. Pick `bucketSeconds` ≈ the typical
    * interval length (same trade-off as pointInIntervalJoin). */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val w = lit(bucketSeconds * 1000000L)
    def micros(c: Column) = unix_micros(c.cast(TimestampType))
    def bucket(c: Column) = floor(micros(c) / w)
    val ab = a.withColumn("__b",
      explode(sequence(bucket(col(aStart)), bucket(col(aEnd)))))
    val bb = b.withColumn("__b",
      explode(sequence(bucket(col(bStart)), bucket(col(bEnd)))))
    ab.join(bb, ab("__b") === bb("__b") &&
        ab(aStart) < bb(bEnd) && bb(bStart) < ab(aEnd) &&
        ab("__b") === bucket(greatest(ab(aStart), bb(bStart))))
      .drop("__b")
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
    * deterministic salt in [0, buckets) hashed from (key, saltOn); the dim
    * side is replicated `buckets`× (explode) so every (key, salt) pair
    * finds its match. Use when one fact key dominates and the dim is too
    * large to broadcast outright but small enough to replicate `buckets`×.
    * `saltOn` must be a stable row attribute (see saltedAggregate): salts
    * derived from partition/monotonic ids change across task retries.
    */
  def saltedJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      buckets: Int,
      saltOn: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factKey), saltOn), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))).withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(replicatedDim,
      saltedFact(factKey) === replicatedDim(dimKey) && saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
