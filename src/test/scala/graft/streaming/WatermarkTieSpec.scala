package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Pins Spark's state-eviction tie conventions at exact watermark
  * boundaries, because the j7c/j7d/t2a/t8 oracles encode them as SQL
  * inequalities (StreamingQueries.scala): window/session *ends* use
  * non-strict `end <= wm` (the eviction predicate compares the exclusive
  * window end, so end == wm means the window's last instant is already
  * below the watermark), while plain event-time rows in outer-join state
  * use strict `ts < wm` (a row AT the watermark is not yet provably
  * unmatched). These are hand-built ties — micros-grained fixtures make
  * accidental ties vanishingly rare, so the gates themselves never hit
  * this; the spec exists so an sf/fixture change that does produce a tie
  * fails HERE with a named convention instead of as a driver hash diff. */
class WatermarkTieSpec extends SparkTestBase {

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("append window agg emits a window whose end equals the watermark (t8 convention: end <= wm)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Timestamp]
    val agg = input.toDS().toDF("ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "10 seconds")).agg(count(lit(1)).as("n"))
    val qn = s"wm_tie_win_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ts(5)); q.processAllAvailable()       // window [0,10)
      input.addData(ts(20)); q.processAllAvailable()      // wm = 20-10 = 10 == window end
      val ends = spark.table(qn).select($"window.end".cast("long")).as[Long].collect()
      assert(ends.contains(10L),
        s"window ending exactly at the watermark must emit (end <= wm), got ends=${ends.toList}")
      assert(!ends.contains(30L), "the open [20,30) window must stay in state")
    } finally q.stop()
  }

  test("append session window emits a session whose end equals the watermark (t2a convention: s_end <= wm)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val agg = input.toDS().toDF("k", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy($"k", session_window($"ts", "10 seconds"))
      .agg(count(lit(1)).as("n"))
    val qn = s"wm_tie_sess_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("a", ts(0))); q.processAllAvailable()   // session [0, 10)
      input.addData(("b", ts(20))); q.processAllAvailable()  // wm = 10 == a's session end
      val done = spark.table(qn)
        .select($"k", $"session_window.end".cast("long")).as[(String, Long)].collect()
      assert(done.contains(("a", 10L)),
        s"session ending exactly at the watermark must emit (s_end <= wm), got ${done.toList}")
      assert(!done.exists(_._1 == "b"), "b's open session must stay in state")
    } finally q.stop()
  }

  test("left-outer join null row needs strictly ts < wm (j7c convention): tie stays in state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Timestamp)] // (purchase_id, ts), user = purchase_id
    val cIn = MemoryStream[(Long, Timestamp)]
    val purchases = pIn.toDS().toDF("purchase_id", "p_ts")
      .withColumn("p_user", $"purchase_id").withWatermark("p_ts", "30 seconds")
    val clicks = cIn.toDS().toDF("click_id", "c_ts")
      .withColumn("c_user", $"click_id" + 1000).withWatermark("c_ts", "30 seconds")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 10 SECONDS"),
      "leftOuter")
      .select($"purchase_id", $"click_id")
    val qn = s"wm_tie_join_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted(): Set[Long] = spark.table(qn)
        .filter($"click_id".isNull).select($"purchase_id").as[Long].collect().toSet
      pIn.addData((1L, ts(100))); cIn.addData((900L, ts(100)))
      q.processAllAvailable()
      // both sides reach max ts 130 → global wm = 100 == purchase 1's ts: tie
      pIn.addData((2L, ts(130))); cIn.addData((901L, ts(130)))
      q.processAllAvailable()
      assert(!emitted().contains(1L),
        "a purchase AT the watermark must stay in state (oracle cut is strict p.ts < wm)")
      // push wm to 101 > 100 → the null row must now emit
      pIn.addData((3L, ts(131))); cIn.addData((902L, ts(131)))
      q.processAllAvailable()
      assert(emitted().contains(1L),
        "once wm passes p.ts the unmatched purchase must emit its null row")
    } finally q.stop()
  }

  test("row arriving at ts == wm is matched-only: never stored, never a null row") {
    // Found by StreamingFuzzSpec: the INSERT-side tie convention. A row
    // whose event time equals the current watermark when it arrives is
    // already at the join's state watermark — Spark joins it against
    // existing state but does NOT store it, so if unmatched it never emits
    // a null row, no matter how far the watermark later advances. (The
    // previous test is the EVICTION-side tie: a stored row AT the
    // watermark stays. Both inequalities matter: stored requires
    // ts > wm-at-insert, eviction requires wm > ts.) In production feeds
    // this is the late-data-beyond-allowance case; in fixtures it is also
    // reachable at the epoch, where ts=0 meets the initial wm=0 — which is
    // why the fuzz fixtures keep event times >= 1.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Timestamp)]
    val cIn = MemoryStream[(Long, Timestamp)]
    val purchases = pIn.toDS().toDF("purchase_id", "p_ts")
      .withColumn("p_user", $"purchase_id").withWatermark("p_ts", "30 seconds")
    val clicks = cIn.toDS().toDF("click_id", "c_ts")
      .withColumn("c_user", $"click_id" + 1000).withWatermark("c_ts", "30 seconds")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 10 SECONDS"),
      "leftOuter")
      .select($"purchase_id", $"click_id")
    val qn = s"wm_tie_insert_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      // advance the global watermark to exactly 100
      pIn.addData((1L, ts(130))); cIn.addData((901L, ts(130)))
      q.processAllAvailable()
      // purchase 2 arrives AT the watermark (ts == wm == 100), unmatched
      pIn.addData((2L, ts(100))); cIn.addData((902L, ts(131)))
      q.processAllAvailable()
      // drive wm far past everything so every stored row resolves
      pIn.addData((3L, ts(300))); cIn.addData((903L, ts(300)))
      q.processAllAvailable()
      pIn.addData((4L, ts(400))); cIn.addData((904L, ts(400)))
      q.processAllAvailable()
      val nulls = spark.table(qn)
        .filter($"click_id".isNull).select($"purchase_id").as[Long].collect().toSet
      assert(nulls.contains(1L) && nulls.contains(3L),
        s"stored unmatched purchases must emit null rows, got $nulls")
      assert(!nulls.contains(2L),
        "a purchase arriving AT the watermark is never stored: no null row")
    } finally q.stop()
  }
}
