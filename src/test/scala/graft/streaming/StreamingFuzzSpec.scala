package graft.streaming

import java.sql.Timestamp

import scala.util.Random

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Differential fuzz for streaming EVICTION arithmetic — the watermark-cut
  * analogue of scripts/fuzz_oracle.py's SQL templates. Each seed draws
  * random gap/delay/band parameters and a random event set, runs the real
  * streaming query (MemoryStream, Append mode, random batch splits), and
  * compares against the batch mirror of the exact cut formula the
  * production oracles encode (StreamingQueries j7c/j7d/t2a/t8):
  *
  *   - session windows emit iff  s_end <= final_wm   (non-strict on ends)
  *   - outer-join null rows emit iff  ts < final_wm  (strict on rows)
  *   - final_wm = max(event time seen) - delay, min'd across sources
  *
  * Fixture discipline that makes the formula exact (same as the gates):
  * event times are drawn on a coarse grid so boundary TIES are common
  * (WatermarkTieSpec pins the conventions; this spec exercises them at
  * volume), feeds are globally ts-sorted so nothing is ever late-dropped,
  * and delay > 0 so the watermark strictly lags the feed. Batch-split
  * positions are random: emission must not depend on how the same sorted
  * stream is chopped into micro-batches. */
class StreamingFuzzSpec extends SparkTestBase {

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  // -- template 1: Append-mode session windows ------------------------------

  private def sessionSeed(seed: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(seed)
    val gapS = Seq(5L, 7L, 10L, 15L)(rng.nextInt(4))
    val delayS = Seq(5L, 10L, 20L)(rng.nextInt(3))
    val nKeys = 2 + rng.nextInt(3)
    val grid = Seq(1L, 5L, gapS)(rng.nextInt(3)) // coarse grids breed ties
    val events: Seq[(String, Long)] = (0 until (30 + rng.nextInt(40))).map { _ =>
      (s"k${rng.nextInt(nKeys)}", grid * rng.nextInt(60))
    }.sortBy(_._2)

    val input = MemoryStream[(String, Timestamp)]
    val agg = input.toDS().toDF("k", "ts")
      .withWatermark("ts", s"$delayS seconds")
      .groupBy($"k", session_window($"ts", s"$gapS seconds"))
      .agg(count(lit(1)).as("n"))
    val qn = s"fz_sess_${seed}_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      var rest = events
      while (rest.nonEmpty) {
        val take = 1 + rng.nextInt(rest.size)
        input.addData(rest.take(take).map { case (k, t) => (k, ts(t)) })
        q.processAllAvailable()
        rest = rest.drop(take)
      }
      val got = spark.table(qn)
        .select($"k", $"session_window.start".cast("long"),
          $"session_window.end".cast("long"), $"n")
        .as[(String, Long, Long, Long)].collect().toSet

      val finalWm = events.map(_._2).max - delayS
      val want = events.toDF("k", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
        .groupBy($"k", session_window($"ts", s"$gapS seconds"))
        .agg(count(lit(1)).as("n"))
        .select($"k", $"session_window.start".cast("long"),
          $"session_window.end".cast("long"), $"n")
        .as[(String, Long, Long, Long)].collect().toSet
        .filter(_._3 <= finalWm) // the t2a cut, non-strict on session end
      assert(got === want,
        s"seed=$seed gap=$gapS delay=$delayS wm=$finalWm:\n got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
    } finally q.stop()
  }

  // -- template 2: left-outer stream-stream band join ------------------------

  private def outerJoinSeed(seed: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(seed)
    val bandS = Seq(5L, 10L, 20L)(rng.nextInt(3))
    val delayS = Seq(5L, 10L, 15L)(rng.nextInt(3))
    val nUsers = 3 + rng.nextInt(3)
    val grid = Seq(1L, 5L)(rng.nextInt(2))
    // times start at 1, never 0: a row whose event time EQUALS the current
    // watermark at insert (only reachable at the epoch with the initial
    // wm=0) is matched-only — it is never stored in join state and never
    // emits a null row. The convention is pinned in WatermarkTieSpec
    // ("row arriving at ts == wm"); the fixture stays off that boundary
    // so the closed-form mirror below holds.
    def side(n: Int): Seq[(Long, Long)] = // (user, sec) sorted by time
      (0 until n).map(_ => (rng.nextInt(nUsers).toLong, grid * (1 + rng.nextInt(49))))
        .sortBy(_._2)
    val purchases = side(12 + rng.nextInt(10)).zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t) } // (pid, user, sec)
    val clicks = side(12 + rng.nextInt(10)).zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t) }

    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val pDf = pIn.toDS().toDF("pid", "p_user", "p_ts")
      .withWatermark("p_ts", s"$delayS seconds")
    val cDf = cIn.toDS().toDF("cid", "c_user", "c_ts")
      .withWatermark("c_ts", s"$delayS seconds")
    val joined = pDf.join(cDf,
      expr(s"p_user = c_user AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL $bandS SECONDS"),
      "leftOuter")
      .select($"pid", $"cid")
    val qn = s"fz_join_${seed}_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      // interleave: advance both sides together, each in sorted order
      var (pRest, cRest) = (purchases, clicks)
      while (pRest.nonEmpty || cRest.nonEmpty) {
        val pTake = if (pRest.isEmpty) 0 else 1 + rng.nextInt(pRest.size)
        val cTake = if (cRest.isEmpty) 0 else 1 + rng.nextInt(cRest.size)
        if (pTake > 0)
          pIn.addData(pRest.take(pTake).map { case (i, u, t) => (i, u, ts(t)) })
        if (cTake > 0)
          cIn.addData(cRest.take(cTake).map { case (i, u, t) => (i, u, ts(t)) })
        q.processAllAvailable()
        pRest = pRest.drop(pTake); cRest = cRest.drop(cTake)
      }
      val got = spark.table(qn).select($"pid", $"cid")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet

      // batch mirror: all matched pairs, plus null rows for unmatched
      // purchases STRICTLY below the final global watermark (j7c cut)
      val finalWm =
        math.min(purchases.map(_._3).max, clicks.map(_._3).max) - delayS
      val matched = for {
        (pid, pu, pt) <- purchases
        (cid, cu, ct) <- clicks
        if pu == cu && ct <= pt && ct > pt - bandS
      } yield (pid, cid)
      val matchedPids = matched.map(_._1).toSet
      val nullRows = purchases
        .filter(p => !matchedPids.contains(p._1) && p._3 < finalWm)
        .map(p => (p._1, -1L))
      val want = matched.toSet ++ nullRows
      assert(got === want,
        s"seed=$seed band=$bandS delay=$delayS wm=$finalWm:\n got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
    } finally q.stop()
  }

  for (seed <- 1 to 8)
    test(s"session-window eviction cut matches batch mirror (seed $seed)") {
      sessionSeed(seed)
    }

  for (seed <- 1 to 6)
    test(s"outer-join eviction cut matches batch mirror (seed $seed)") {
      outerJoinSeed(seed)
    }
}
