package graft.operators

import graft.{Det, GraftQuery, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.2 W2–W3 (analytic windows, frames), T1–T2 batch-time-window
  * semantics, S6 topic compaction, J6 as-of join — all over the `events`
  * table (event_id, ts, user_id, event_type, value, props).
  *
  * Scale notes: every query here partitions by user_id (1.5k keys per sf —
  * millions at 100 TB), so window state stays bounded per key and the single
  * shuffle is on the natural key. The as-of join is the linear union+window
  * form (no pairwise blowup), the idiomatic Spark rewrite of the reference's
  * "latest message per consumer" queue semantics (globals.hpp:71-77).
  */
object EventQueries {
  import Det._

  private val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  val queries: Seq[GraftQuery] = Seq(

    // ----- W2: lag / lead / first / last
    GraftQuery("w2_lag_lead", (s, d) => {
      import s.implicits._
      val whole = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.events(s, d).select(
        $"user_id", $"event_id",
        lag($"event_id", 1).over(byUser).as("prev_event"),
        lead($"event_id", 1).over(byUser).as("next_event"),
        first($"event_id").over(whole).as("first_event"),
        last($"event_id").over(whole).as("last_event"))
        .orderBy($"user_id", $"event_id")
    }, Some("""
      SELECT user_id, event_id,
        LAG(event_id, 1) OVER w AS prev_event,
        LEAD(event_id, 1) OVER w AS next_event,
        FIRST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
        LAST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""")),

    // ----- W3: frames — running sum, moving window, range frame over seconds.
    // Sums run over exact integer cents so segment-tree vs sequential window
    // evaluation cannot produce FP drift.
    GraftQuery("w3_frames", (s, d) => {
      import s.implicits._
      val vc = vcents($"value")
      val bySec = Window.partitionBy($"user_id").orderBy($"sec")
      T.events(s, d)
        .withColumn("cents", vc)
        .withColumn("sec", $"ts".cast(LongType))
        .select(
          $"user_id", $"event_id",
          sum($"cents").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running_cents"),
          sum($"cents").over(byUser.rowsBetween(-2, 0)).as("mov3_cents"),
          sum($"cents").over(bySec.rangeBetween(-600, 0)).as("last10min_cents"))
        .orderBy($"user_id", $"event_id")
    }, Some(s"""
      WITH e AS (SELECT user_id, event_id, ts, ${sql.vcents("value")} AS cents,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
      SELECT user_id, event_id,
        CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
        CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_cents,
        CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY sec
          RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT) AS last10min_cents
      FROM e ORDER BY user_id, event_id"""), bench = true),

    // ----- W1b: distribution window functions (exact rational outputs).
    // event_type has ~5 values, so `over (partition by event_type)` would
    // hand each reducer a fifth of the dataset (~20 TB at the design
    // point). Two-pass form instead: range-partitioned distributed
    // row_number (SkewUtils.rangedRowNumber — largest task holds
    // N/numPartitions rows) + per-type counts joined back broadcast.
    // (value, event_id) is a total order per type, so rank = row_number
    // and cume_dist = rn/n exactly as the windowed form computes them.
    GraftQuery("w1_distribution", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val ranked = SkewUtils.rangedRowNumber(
        ev.select($"event_type", $"event_id", $"value"),
        key = Seq("event_type"), order = Seq("value", "event_id"),
        numPartitions = 32, rankCol = "rn")
      val nPer = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(nPer), "event_type")
        .select($"event_type", $"event_id",
          when($"n" === 1, 0.0)
            .otherwise(($"rn" - 1).cast(DoubleType) / ($"n" - 1)).as("pr"),
          ($"rn".cast(DoubleType) / $"n").as("cd"))
        .orderBy($"event_type", $"event_id")
    }, Some("""
      SELECT event_type, event_id,
        PERCENT_RANK() OVER w AS pr,
        CUME_DIST() OVER w AS cd
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_type, event_id""")),

    // ----- W2b: nth_value over the full frame
    GraftQuery("w2_nth_value", (s, d) => {
      import s.implicits._
      val whole = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.events(s, d).select(
        $"user_id", $"event_id",
        nth_value($"event_id", 2).over(whole).as("second_event"),
        nth_value($"event_id", 3).over(whole).as("third_event"))
        .orderBy($"user_id", $"event_id")
    }, Some("""
      SELECT user_id, event_id,
        NTH_VALUE(event_id, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_event,
        NTH_VALUE(event_id, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_event
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""")),

    // ----- T1: event-time tumbling window (batch semantics of the streaming
    // aggregation; the streaming form is exercised in StreamingQueries)
    GraftQuery("t1_window_tumbling", (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), sum(vcents($"value")).as("sum_cents"))
        .select(tsFmt($"w.start").as("w_start"), $"event_type", $"n", $"sum_cents")
        .orderBy($"w_start", $"event_type")
    }, Some(s"""
      SELECT strftime(make_timestamp(CAST(floor(epoch_ms(ts)/300000) AS BIGINT)*300000000),
               '%Y-%m-%d %H:%M:%S') AS w_start,
        event_type, COUNT(*) AS n,
        CAST(SUM(${sql.vcents("value")}) AS BIGINT) AS sum_cents
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""), bench = true),

    // ----- T1b: sliding window (10 min window, 5 min slide → 2 windows/event)
    GraftQuery("t1_window_sliding", (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(tsFmt($"w.start").as("w_start"), $"n")
        .orderBy($"w_start")
    }, Some("""
      WITH b AS (SELECT CAST(floor(epoch_ms(ts)/300000) AS BIGINT)*300000000 AS b0 FROM events),
      w AS (SELECT u.w_us FROM b, unnest([b0, b0 - 300000000]) AS u(w_us))
      SELECT strftime(make_timestamp(w_us), '%Y-%m-%d %H:%M:%S') AS w_start, COUNT(*) AS n
      FROM w GROUP BY 1 ORDER BY w_start""")),

    // ----- T2: session windows (10-minute gap), batch semantics
    GraftQuery("t2_session_window", (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(session_window($"ts", "10 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"), sum(vcents($"value")).as("sum_cents"))
        .select($"user_id", tsFmt($"w.start").as("s_start"), $"n", $"sum_cents")
        .orderBy($"user_id", $"s_start")
    }, Some(s"""
      WITH x AS (
        SELECT user_id, ts, ${sql.vcents("value")} AS cents,
          CASE WHEN LAG(ts) OVER w IS NULL
                 OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      y AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM x)
      SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM y GROUP BY user_id, sid ORDER BY user_id, s_start""")),

    // ----- T2 (dynamic gap): session windows whose gap depends on the
    // EVENT — purchases hold a session open 30 minutes, everything else 10
    // (the engagement-modeling shape: a conversion event extends the
    // session). Spark 4's session_window takes the gap as an expression;
    // semantics are window-merge: each event spawns [ts, ts+gap) and
    // overlapping windows coalesce, so a session's end is the running MAX
    // of per-event ends, not last-event + constant. The oracle mirrors
    // exactly that: a new session starts where ts >= MAX(prev ts+gap)
    // (end-exclusive), sid = running sum of boundaries. Emitting s_end
    // pins the max-end arithmetic, not just the partitioning. Scale shape:
    // one shuffle on user_id, per-key linear merge — same as fixed-gap
    // sessions; the gap expression is evaluated map-side.
    GraftQuery("t2d_dynamic_session", (s, d) => {
      import s.implicits._
      // session_window demands CalendarIntervalType — ANSI interval
      // literals arrive as DayTimeIntervalType, so the gap goes through
      // make_interval (legacy CalendarInterval) instead
      val gap = expr(
        "CASE WHEN event_type = 'purchase' THEN make_interval(0,0,0,0,0,30,0) " +
          "ELSE make_interval(0,0,0,0,0,10,0) END")
      T.events(s, d)
        .groupBy(session_window($"ts", gap).as("w"), $"user_id")
        .agg(count(lit(1)).as("n"), sum(vcents($"value")).as("sum_cents"))
        .select($"user_id", tsFmt($"w.start").as("s_start"),
          tsFmt($"w.end").as("s_end"), $"n", $"sum_cents")
        .orderBy($"user_id", $"s_start")
    }, Some(s"""
      WITH x AS (
        SELECT user_id, ts, event_id, ${sql.vcents("value")} AS cents,
          ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 30 MINUTE
                    ELSE INTERVAL 10 MINUTE END AS ev_end
        FROM events),
      y AS (
        SELECT *, CASE WHEN MAX(ev_end) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
            OR ts >= MAX(ev_end) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          THEN 1 ELSE 0 END AS new_s
        FROM x),
      z AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM y)
      SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        strftime(MAX(ev_end), '%Y-%m-%d %H:%M:%S') AS s_end,
        COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM z GROUP BY user_id, sid ORDER BY user_id, s_start""")),

    // ----- S6: topic compaction — latest value per key over the append log.
    // This is the batch compaction job from BASELINE.json's north star; the
    // key is user_id, the "offset" order is (ts, event_id).
    GraftQuery("s6_compaction", (s, d) => {
      import s.implicits._
      // max_by aggregate, not a row_number window: partial aggregation
      // combines map-side, so compaction never sorts whole partitions —
      // the shape that matters when the append log is 100 TB. (ts, event_id)
      // is a total order, so the kept row is deterministic.
      T.events(s, d)
        .groupBy($"user_id")
        .agg(max_by(
          struct($"event_id", $"event_type", $"ts", vcents($"value").as("cents")),
          struct($"ts", $"event_id")).as("last"))
        .select($"user_id", $"last.event_id".as("event_id"),
          $"last.event_type".as("event_type"),
          tsFmt($"last.ts").as("ts_s"), $"last.cents".as("cents"))
        .orderBy($"user_id")
    }, Some(s"""
      SELECT user_id, event_id, event_type, ${sql.tsFmt("ts")} AS ts_s,
        ${sql.vcents("value")} AS cents
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
            FROM events) t
      WHERE rn = 1 ORDER BY user_id"""), bench = true),

    // ----- A7: statistical aggregates with exact arithmetic — sums of
    // integer cents, variance/stddev from the closed formula, so the result
    // is bit-identical regardless of partition order (builtin var_samp's
    // Welford accumulation is order-dependent and cannot hash-match)
    GraftQuery("a7_stats", (s, d) => {
      import s.implicits._
      val vc = vcents($"value")
      T.events(s, d)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(vc).as("sx"),
          sum(vc * vc).as("sxx"))
        .withColumn("mean_cents", $"sx".cast(DoubleType) / $"n")
        .withColumn("var_cents2",
          ($"n".cast(DoubleType) * $"sxx" - $"sx".cast(DoubleType) * $"sx") /
            ($"n".cast(DoubleType) * ($"n" - 1)))
        .withColumn("stddev_cents", sqrt($"var_cents2"))
        .select($"event_type", $"n", $"sx", $"sxx",
          $"mean_cents", $"var_cents2", $"stddev_cents")
        .orderBy($"event_type")
    }, Some(s"""
      WITH t AS (SELECT event_type, ${sql.vcents("value")} AS vc FROM events),
      a AS (SELECT event_type, COUNT(*) AS n,
              CAST(SUM(vc) AS BIGINT) AS sx, CAST(SUM(vc*vc) AS BIGINT) AS sxx
            FROM t GROUP BY event_type)
      SELECT event_type, n, sx, sxx,
        CAST(sx AS DOUBLE) / n AS mean_cents,
        (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1)) AS var_cents2,
        sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1))) AS stddev_cents
      FROM a ORDER BY event_type""")),

    // ----- A8: mode (most frequent value, deterministic tiebreak)
    GraftQuery("a8_mode", (s, d) => {
      import s.implicits._
      val counts = T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_quantity")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"l_returnflag").orderBy($"c".desc, $"l_quantity")
      counts.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"l_returnflag", $"l_quantity".as("mode_qty"), $"c".as("freq"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS c
                 FROM lineitem GROUP BY l_returnflag, l_quantity),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                       ORDER BY c DESC, l_quantity) AS rn FROM c)
      SELECT l_returnflag, l_quantity AS mode_qty, c AS freq
      FROM r WHERE rn = 1 ORDER BY l_returnflag""")),

    // ----- ratio-to-report: each event's share of its type's total value
    // (exact integer cents divided at the end — deterministic).
    // groupBy + broadcast-join-back, NOT `sum() over (partition by
    // event_type)`: a whole-partition window over a ~5-value key puts the
    // entire dataset on 5 reducers; the aggregate partial-combines
    // map-side and the 5-row totals broadcast.
    GraftQuery("e3_value_share", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).withColumn("cents", vcents($"value"))
      val totals = ev.groupBy($"event_type").agg(sum($"cents").as("total"))
      ev.join(broadcast(totals), "event_type")
        .select($"event_type", $"event_id",
          ($"cents".cast(DoubleType) / $"total").as("share"))
        .orderBy($"event_type", $"event_id")
    }, Some(s"""
      WITH t AS (SELECT event_type, event_id, ${sql.vcents("value")} AS cents FROM events)
      SELECT event_type, event_id,
        CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT) AS share
      FROM t ORDER BY event_type, event_id""")),

    // ----- e4: z-score outlier flagging — per-type mean/std from ONE exact
    // integer-sum aggregate over cents (count/sum/sum-of-squares all
    // partial-combine map-side), broadcast-joined back; never a
    // whole-partition window over the 5-value type key (same de-skew shape
    // as e3). The z-score derives from exact integer sums with the same
    // double-op order in both engines, so the rounded values hash-match.
    GraftQuery("e4_zscore_outliers", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).withColumn("cents", vcents($"value"))
      val stats = ev.groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"cents").as("s1"),
        sum($"cents" * $"cents").as("s2"))
      val mean = $"s1".cast(DoubleType) / $"n"
      val variance =
        ($"s2".cast(DoubleType) - $"s1".cast(DoubleType) * $"s1" / $"n") / $"n"
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", round(($"cents".cast(DoubleType) - mean) / sqrt(variance), 4))
        .filter(abs($"z") >= 2.0)
        .select($"event_type", $"event_id", $"cents", $"z")
        .orderBy($"event_type", $"event_id")
    }, Some(s"""
      WITH t AS (SELECT event_type, event_id, ${sql.vcents("value")} AS cents FROM events),
      st AS (SELECT event_type, COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS s1,
               CAST(SUM(cents * cents) AS BIGINT) AS s2
             FROM t GROUP BY event_type),
      z AS (SELECT t.event_type, event_id, cents,
              round((CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n) /
                    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n), 4) AS z
            FROM t JOIN st USING (event_type))
      SELECT event_type, event_id, cents, z FROM z
      WHERE abs(z) >= 2.0 ORDER BY event_type, event_id""")),

    // ----- funnel: users who progressed signup → click → purchase in
    // event-time order; one aggregation pass (min ts per stage), no joins
    GraftQuery("e1_funnel", (s, d) => {
      import s.implicits._
      val stages = T.events(s, d)
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "signup", $"ts")).as("t_signup"),
          min(when($"event_type" === "click", $"ts")).as("t_click"),
          min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
      stages.select(
        $"user_id",
        $"t_signup".isNotNull.as("reached_signup"),
        ($"t_signup" < $"t_click").as("reached_click"),
        ($"t_signup" < $"t_click" && $"t_click" < $"t_purchase").as("converted"))
        .orderBy($"user_id")
    }, Some("""
      WITH s AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
          MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
          MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
      SELECT user_id,
        t_signup IS NOT NULL AS reached_signup,
        t_signup < t_click AS reached_click,
        t_signup < t_click AND t_click < t_purchase AS converted
      FROM s ORDER BY user_id""")),

    // ----- cohort retention: first-activity week × activity week matrix
    GraftQuery("e2_retention", (s, d) => {
      import s.implicits._
      val weeks = T.events(s, d)
        .select($"user_id",
          floor(($"ts".cast(LongType) - lit(1704067200L)) / 604800).cast(IntegerType).as("wk"))
      val cohort = weeks.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
      weeks.distinct()
        .join(cohort, "user_id")
        .groupBy($"cohort_wk", $"wk")
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_wk", $"wk")
    }, Some("""
      WITH w AS (SELECT DISTINCT user_id,
                   CAST(floor((epoch(ts) - 1704067200) / 604800) AS INT) AS wk
                 FROM events),
      c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id)
      SELECT cohort_wk, wk, COUNT(DISTINCT w.user_id) AS n_users
      FROM w JOIN c ON w.user_id = c.user_id
      GROUP BY cohort_wk, wk ORDER BY cohort_wk, wk""")),

    // ----- J6: as-of join — for each purchase, the latest click by the same
    // user at or before the purchase. Linear union+window form: one shuffle
    // on user_id, no pairwise candidate blowup, survives 100 TB.
    GraftQuery("j6_asof_join", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"),
          lit(null).cast(LongType).as("purchase_id"), lit(0).as("kind"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(null).cast(LongType).as("click_id"),
          $"event_id".as("purchase_id"), lit(1).as("kind"))
      // order: ts, then clicks before purchases at equal ts, then id
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"kind", coalesce($"click_id", $"purchase_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("last_click", last($"click_id", ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .select($"purchase_id", $"last_click".as("click_id"))
        .orderBy($"purchase_id")
    }, Some("""
      WITH p AS (SELECT event_id AS pid, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT event_id AS cid, user_id, ts FROM events WHERE event_type = 'click'),
           j AS (SELECT p.pid, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.ts DESC, c.cid DESC) AS rn
                 FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
      SELECT p.pid AS purchase_id, j.cid AS click_id
      FROM p LEFT JOIN (SELECT pid, cid FROM j WHERE rn = 1) j ON p.pid = j.pid
      ORDER BY purchase_id"""), bench = true),

    // ----- J6b: as-of join with staleness tolerance — the feature-store
    // freshness contract: the latest click still counts only if it is at
    // most 1 hour old at purchase time; a staler match is a MISS (null),
    // not a stale read. One carried struct decides (the latest
    // at-or-before row either passes the tolerance or nothing does), so
    // the plan is the same single-shuffle union+window as j6 — no
    // pairwise candidates, no second join. Emitting the exact match age
    // in microseconds pins the boundary arithmetic: an off-by-one in the
    // <= tolerance comparison or a seconds-vs-micros slip breaks the
    // hash, not just a row count.
    GraftQuery("j6b_asof_tolerance", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
      graft.Graft.asofJoinWithin(purchases, "p_ts", "purchase_id",
          clicks, "ts", "click_id", "user_id", "click_id",
          toleranceSeconds = 3600L)
        .select($"purchase_id", $"click_id", $"asof_age_us")
        .orderBy($"purchase_id")
    }, Some("""
      WITH p AS (SELECT event_id AS pid, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT event_id AS cid, user_id, ts FROM events WHERE event_type = 'click'),
           j AS (SELECT p.pid, c.cid, epoch_us(p.ts) - epoch_us(c.ts) AS age_us,
                   ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.ts DESC, c.cid DESC) AS rn
                 FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
                   AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000)
      SELECT p.pid AS purchase_id, j.cid AS click_id, j.age_us AS asof_age_us
      FROM p LEFT JOIN (SELECT pid, cid, age_us FROM j WHERE rn = 1) j ON p.pid = j.pid
      ORDER BY purchase_id""")),

    // ----- J10: SCD2 (slowly-changing-dimension) join — enrich each fact
    // row with the dimension VERSION valid at its event time. The dim
    // history is derived deterministically from supplier (three versions
    // effective 1995/1997/1999, balance-cents recomputable from v), and
    // the fact side is matched through the real SCD2 machinery:
    // Graft.asofJoinLatest on (supplier key, effective_from <= shipdate) —
    // one shuffle on the key, linear union+window, no interval blowup.
    // The oracle derives each line's version in closed form (shipdate
    // banding), so a single wrong as-of boundary (e.g. an exclusive <)
    // shifts rows between versions and breaks the hash. Aggregated per
    // (supplier, version) to keep the output compact at any sf.
    GraftQuery("j10_scd2_join", (s, d) => {
      import s.implicits._
      val dim = T.supplier(s, d)
        .select($"s_suppkey".as("l_suppkey"),
          round($"s_acctbal" * 100).cast(LongType).as("bal0"),
          explode(array(lit(0), lit(1), lit(2))).as("v"))
        .select($"l_suppkey", $"v",
          to_timestamp(concat(lit(1995) + $"v" * 2, lit("-01-01 00:00:00"))).as("eff_from"),
          struct($"v".as("version"), ($"bal0" * (lit(10) + $"v")).as("bal_cents")).as("payload"))
      val pts = T.lineitem(s, d).select($"l_suppkey", $"l_shipdate", $"l_quantity")
      graft.Graft.asofJoinLatest(pts, "l_shipdate", "l_quantity",
          dim, "eff_from", "payload", "l_suppkey", "v")
        .groupBy($"l_suppkey", $"payload.version".as("version"),
          $"payload.bal_cents".as("bal_cents"))
        .agg(count(lit(1)).as("n_lines"),
          sum($"l_quantity").cast(LongType).as("sum_qty"))
        .orderBy($"l_suppkey", $"version")
    }, Some("""
      WITH m AS (
        SELECT l_suppkey,
          CASE WHEN l_shipdate < TIMESTAMP '1997-01-01 00:00:00' THEN 0
               WHEN l_shipdate < TIMESTAMP '1999-01-01 00:00:00' THEN 1
               ELSE 2 END AS version,
          l_quantity
        FROM lineitem)
      SELECT m.l_suppkey, version,
        CAST(round(s_acctbal * 100) AS BIGINT) * (10 + version) AS bal_cents,
        COUNT(*) AS n_lines, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      FROM m JOIN supplier ON m.l_suppkey = s_suppkey
      GROUP BY 1, 2, 3 ORDER BY l_suppkey, version""")),

    // ----- E5: time-series resample + gap fill — project each user's event
    // history onto a regular daily grid and forward-fill the last observed
    // value into gap days (the "as-of snapshot per calendar day" shape every
    // metrics store needs). Three bounded pieces: a per-(user, day) last-value
    // snapshot (max_by aggregate — partial-combines map-side, never sorts a
    // partition), a per-user day grid (sequence() explode, bounded by the
    // user's own active span — no global calendar cross join), and a
    // forward-fill window per user ordered by day (state bounded per key).
    // Everything shuffles on user_id / (user_id, day) — the natural keys —
    // so the plan is linear at any corpus size.
    GraftQuery("e5_gap_fill", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).withColumn("day", to_date($"ts"))
      val snap = ev.groupBy($"user_id", $"day")
        .agg(max_by(vcents($"value"), struct($"ts", $"event_id")).as("day_cents"))
      val grid = ev.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"user_id",
          explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
      val ff = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(snap, Seq("user_id", "day"), "left")
        .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
          last($"day_cents", ignoreNulls = true).over(ff).as("filled_cents"),
          $"day_cents".isNull.as("is_gap"))
        .orderBy($"user_id", $"day")
    }, Some(s"""
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
                   ${sql.vcents("value")} AS cents FROM events),
      snap AS (SELECT user_id, day, cents AS day_cents
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
                       ORDER BY ts DESC, event_id DESC) AS rn FROM e)
               WHERE rn = 1),
      b AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM e GROUP BY 1),
      grid AS (SELECT user_id, CAST(u.g AS DATE) AS day
               FROM b, unnest(generate_series(CAST(d0 AS TIMESTAMP),
                 CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS u(g)),
      f AS (SELECT g.user_id, g.day, s.day_cents
            FROM grid g LEFT JOIN snap s
              ON g.user_id = s.user_id AND g.day = s.day)
      SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        LAST_VALUE(day_cents IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS filled_cents,
        day_cents IS NULL AS is_gap
      FROM f ORDER BY user_id, day""")),

    // ----- E6: interval concurrency via a distributed sweep line — "how
    // many 30-minute sessions were simultaneously live" (connection-count /
    // capacity-planning analytics). Each event opens a half-open interval
    // [ts, ts+30min): +1 at the start, -1 at the end, ends applied before
    // starts at the same instant (key = 2*us + is_start). Deltas are first
    // aggregated per unique boundary key (map-side combinable; makes the
    // running value peer-inclusive and hence order-deterministic), then the
    // global running sum is the two-pass SkewUtils.rangedCumSum — never a
    // single-reducer `sum() over (order by ts)`. Output is the per-day max
    // of the concurrency at boundary instants (between boundaries the value
    // is constant, so boundary maxima are exact).
    GraftQuery("e6_concurrency", (s, d) => {
      import s.implicits._
      val us = unix_micros($"ts")
      val ev = T.events(s, d)
      val starts = ev.select((us * 2 + 1).as("k"), lit(1L).as("delta"))
      val ends = ev.select(((us + 1800000000L) * 2).as("k"), lit(-1L).as("delta"))
      val net = starts.unionByName(ends)
        .groupBy($"k").agg(sum($"delta").as("net"))
      SkewUtils.rangedCumSum(net, Seq("k"), "net", 32, "conc")
        .withColumn("day",
          date_format(timestamp_micros(shiftright($"k", 1)), "yyyy-MM-dd"))
        .groupBy($"day")
        .agg(max($"conc").as("max_conc"), count(lit(1)).as("n_boundaries"))
        .orderBy($"day")
    }, Some("""
      WITH pts AS (
        SELECT epoch_us(ts) * 2 + 1 AS k, 1 AS delta FROM events
        UNION ALL
        SELECT (epoch_us(ts) + 1800000000) * 2 AS k, -1 AS delta FROM events),
      g AS (SELECT k, SUM(delta) AS net FROM pts GROUP BY k),
      r AS (SELECT k, SUM(net) OVER (ORDER BY k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
            FROM g)
      SELECT strftime(make_timestamp(k // 2), '%Y-%m-%d') AS day,
        CAST(MAX(conc) AS BIGINT) AS max_conc, COUNT(*) AS n_boundaries
      FROM r GROUP BY 1 ORDER BY day"""), bench = true),

    // ----- e7: robust per-key anomaly detection — median + MAD (median
    // absolute deviation), the outlier gate that, unlike e4's z-score, a
    // single extreme value cannot poison (mean/stddev break down at 50%
    // contamination, median/MAD at 0%... up to half). Two exact-percentile
    // aggregations per key with the deviations joined back between them;
    // every stage is a keyed hash agg or equi join on user_id — no window
    // over a whole key, no driver collection. Exact `percentile` on
    // integer cents keeps the interpolated midpoints (.5) bit-identical
    // to DuckDB's quantile_cont. At 100 TB swap `percentile` for
    // `approx_percentile(.., 10000)` per key (same plan shape, bounded
    // sketch memory) — exact here because the oracle needs equality.
    GraftQuery("e7_anomaly_mad", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        WITH c AS (SELECT user_id, CAST(round(value*100) AS BIGINT) AS cents FROM events),
        m AS (SELECT user_id, percentile(cents, 0.5) AS med FROM c GROUP BY user_id),
        d AS (SELECT c.user_id, abs(c.cents - m.med) AS adev, c.cents, m.med
              FROM c JOIN m USING (user_id)),
        md AS (SELECT user_id, percentile(adev, 0.5) AS mad FROM d GROUP BY user_id)
        SELECT d.user_id, MAX(d.med) AS med, MAX(md.mad) AS mad,
          CAST(SUM(CASE WHEN md.mad > 0 AND d.adev > 3*md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        FROM d JOIN md USING (user_id) GROUP BY d.user_id ORDER BY d.user_id""")
    }, Some("""
      WITH c AS (SELECT user_id, CAST(round(value*100) AS BIGINT) AS cents FROM events),
      m AS (SELECT user_id, quantile_cont(cents, 0.5) AS med FROM c GROUP BY user_id),
      d AS (SELECT c.user_id, abs(c.cents - m.med) AS adev, c.cents, m.med
            FROM c JOIN m USING (user_id)),
      md AS (SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY user_id)
      SELECT d.user_id, MAX(d.med) AS med, MAX(md.mad) AS mad,
        CAST(SUM(CASE WHEN md.mad > 0 AND d.adev > 3*md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out
      FROM d JOIN md USING (user_id) GROUP BY d.user_id ORDER BY d.user_id""")),

    // ----- w4: sequence pattern matching — MATCH_RECOGNIZE semantics as a
    // per-key encode-then-regex: each user's event stream (totally ordered
    // by ts, event_id) collapses to a one-char-per-event string, and
    // episode patterns become regexes over it (signup→purchase episodes
    // without an intervening purchase; longest uninterrupted view streak).
    // Per-key state is one char per event — a 1M-event user is a 1 MB
    // string, so the collect stays bounded where a row-per-event
    // self-join blowup would not; the regex pass is embarrassingly
    // parallel per user. Both engines run RE2-compatible patterns
    // (non-greedy classes only — no backtracking-dependent constructs).
    GraftQuery("w4_pattern_match", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        WITH seq AS (
          SELECT user_id,
            concat_ws('', transform(
              array_sort(collect_list(struct(ts, event_id, substring(event_type, 1, 1)))),
              x -> x.col3)) AS sq
          FROM events GROUP BY user_id)
        SELECT user_id, length(sq) AS seq_len,
          size(regexp_extract_all(sq, 's[^p]*p', 0)) AS n_episodes,
          coalesce(array_max(transform(regexp_extract_all(sq, 'v+', 0), x -> length(x))), 0) AS max_vstreak
        FROM seq ORDER BY user_id""")
    }, Some("""
      WITH seq AS (
        SELECT user_id,
          string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS sq
        FROM events GROUP BY user_id)
      SELECT user_id, CAST(length(sq) AS INT) AS seq_len,
        CAST(len(regexp_extract_all(sq, 's[^p]*p')) AS INT) AS n_episodes,
        CAST(COALESCE(list_max(list_transform(regexp_extract_all(sq, 'v+'), x -> length(x))), 0) AS INT) AS max_vstreak
      FROM seq ORDER BY user_id""")),

    // ----- e8: interval coalesce (union of overlapping intervals) — merge
    // each user's 30-minute activity windows into maximal covered spans:
    // the span-merge primitive behind contamination span dedup, sessionized
    // coverage, and downtime accounting. One pass: running MAX(end) over
    // the start order marks gap boundaries, a running sum of the flags
    // numbers the merged groups, and a keyed agg closes them. All windows
    // are per-user (bounded); a single giant key would use the
    // SkewUtils.rangedCumSumByKey two-pass instead — same flag+cumsum
    // algebra.
    GraftQuery("e8_interval_coalesce", (s, d) => {
      T.registerAll(s, d)
      s.sql("""
        WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
        m AS (SELECT user_id, s, e,
                MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
              FROM iv),
        g AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS new_g FROM m),
        r AS (SELECT *, SUM(new_g) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid FROM g),
        c AS (SELECT user_id, gid, MIN(s) AS gs, MAX(e) AS ge FROM r GROUP BY user_id, gid)
        SELECT user_id, COUNT(*) AS n_spans,
          CAST(SUM(unix_micros(CAST(ge AS TIMESTAMP)) - unix_micros(CAST(gs AS TIMESTAMP))) AS BIGINT) AS covered_us,
          CAST(MAX(unix_micros(CAST(ge AS TIMESTAMP)) - unix_micros(CAST(gs AS TIMESTAMP))) AS BIGINT) AS max_span_us
        FROM c GROUP BY user_id ORDER BY user_id""")
    }, Some("""
      WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
      m AS (SELECT user_id, s, e,
              MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
            FROM iv),
      g AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS new_g FROM m),
      r AS (SELECT *, SUM(new_g) OVER (PARTITION BY user_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid FROM g),
      c AS (SELECT user_id, gid, MIN(s) AS gs, MAX(e) AS ge FROM r GROUP BY user_id, gid)
      SELECT user_id, COUNT(*) AS n_spans,
        CAST(SUM(epoch_us(ge - gs)) AS BIGINT) AS covered_us,
        CAST(MAX(epoch_us(ge - gs)) AS BIGINT) AS max_span_us
      FROM c GROUP BY user_id ORDER BY user_id""")),

    // ----- w5: time-weighted average — the metrics/IoT rollup where each
    // observation holds until the next one, so its weight is the interval
    // it covered, not 1. Per-key window (lead over user_id — bounded state
    // per key), then one hash agg; all arithmetic in integer micros×cents
    // (max interval ~5e11 us × 1e5 cents = 5e16 per term, sums well inside
    // int64), floor division at the end so both engines agree bit-for-bit.
    // Users with a single event have no covered interval and drop out via
    // the WHERE, not a divide-by-zero.
    GraftQuery("w5_time_weighted_avg", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .select($"user_id", $"ts", $"event_id", vcents($"value").as("cents"))
        .withColumn("nxt", lead($"ts", 1).over(w))
        .filter($"nxt".isNotNull)
        .withColumn("dur_us", unix_micros($"nxt") - unix_micros($"ts"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"dur_us").as("covered_us"),
          sum($"cents" * $"dur_us").as("weighted"))
        .select($"user_id", $"n_intervals", $"covered_us",
          expr("weighted div covered_us").as("twa_cents"))
        .orderBy($"user_id")
    }, Some(s"""
      WITH x AS (SELECT user_id, ts, event_id, ${sql.vcents("value")} AS cents,
                   LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                 FROM events),
      iv AS (SELECT user_id, cents, epoch_us(nxt) - epoch_us(ts) AS dur_us
             FROM x WHERE nxt IS NOT NULL)
      SELECT user_id, COUNT(*) AS n_intervals,
        CAST(SUM(dur_us) AS BIGINT) AS covered_us,
        CAST(SUM(cents * dur_us) AS BIGINT) // CAST(SUM(dur_us) AS BIGINT) AS twa_cents
      FROM iv GROUP BY user_id ORDER BY user_id""")),

    // ----- E9: running distinct over time — daily actives plus the
    // cumulative "total distinct users to date" curve. Exact running
    // COUNT(DISTINCT) is unbounded-state in general; the standard exact
    // reduction is first-seen attribution: a user contributes to the
    // cumulative curve only on their min(day), so the curve is the
    // running SUM of per-day first-seen counts. Scale shape: two hash
    // aggs (user-day dedup, min-day per user) — both shuffle on bounded
    // keys — then the running sum runs over the per-DAY aggregate, whose
    // cardinality is calendar-bounded (like d3's ranked buckets), so the
    // unpartitioned window is over dozens of rows, not the event log.
    GraftQuery("e9_running_distinct", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val days = T.events(s, d).select($"user_id", to_date($"ts").as("day"))
      val dau = days.distinct()
        .groupBy($"day").agg(count(lit(1)).as("dau"))
      val firstSeen = days.groupBy($"user_id").agg(min($"day").as("day"))
        .groupBy($"day").agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(firstSeen, Seq("day"), "left_outer")
        .select($"day", $"dau", coalesce($"n_new", lit(0L)).as("n_new"))
        .withColumn("cum_users", sum($"n_new").over(w))
        .orderBy($"day")
        .select(date_format($"day", "yyyy-MM-dd").as("day"),
          $"dau", $"n_new", $"cum_users")
    }, Some("""
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
      fs AS (SELECT day, COUNT(*) AS n_new FROM
               (SELECT user_id, MIN(day) AS day FROM ud GROUP BY user_id) f
             GROUP BY day)
      SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau,
        COALESCE(fs.n_new, 0) AS n_new,
        CAST(SUM(COALESCE(fs.n_new, 0)) OVER (ORDER BY dau.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      FROM dau LEFT JOIN fs ON dau.day = fs.day
      ORDER BY dau.day"""))
  )
}
