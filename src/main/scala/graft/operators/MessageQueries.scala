package graft.operators

import graft.{Det, GraftQuery, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The message/topic view of the engine (FIXTURES.md §B1): the
  * Kafka-source-shaped record the north star names —
  * (topic, offset, ts, key, value binary, headers map) — derived
  * deterministically from the `events` table, plus the compaction job over
  * it. At scale this is the landed form of the reference's ingest queue
  * (length-prefixed frames → FIFO, server.cpp:77-98, globals.hpp:75);
  * offsets are the explicit analogue of the queue's implicit vector index.
  */
object MessageQueries {
  import Det._

  /** Deterministic message log: topic partitioned by event_type, offset =
    * event_id, key groups users (dup keys → compaction does real work). */
  def messages(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.events(s, d).select(
      $"event_type".as("topic"),
      $"event_id".as("offset"),
      $"ts",
      concat(lit("k"), ($"user_id" % 50).cast(StringType)).as("key"),
      $"props".cast(BinaryType).as("value"),
      map(lit("src"), lit("events"), lit("uid"), $"user_id".cast(StringType)).as("headers"))
  }

  val queries: Seq[GraftQuery] = Seq(

    // latest message per (topic, key) — the S6 compaction job on the
    // message schema; max_by aggregate, same scale shape as s6_compaction
    GraftQuery("m2_message_compaction", (s, d) => {
      import s.implicits._
      messages(s, d)
        .groupBy($"topic", $"key")
        .agg(max_by(struct($"offset", $"ts", $"value"), $"offset").as("last"),
          count(lit(1)).as("n_superseded"))
        .select($"topic", $"key".as("msg_key"),
          $"last.offset".as("msg_offset"),
          tsFmt($"last.ts").as("ts_s"),
          $"last.value".cast(StringType).as("value_str"),
          $"n_superseded")
        .orderBy($"topic", $"msg_key")
    }, Some(s"""
      WITH m AS (SELECT event_type AS topic, event_id AS m_off, ts,
                   'k' || CAST(user_id % 50 AS VARCHAR) AS m_key, props AS m_val
                 FROM events)
      SELECT topic, m_key AS msg_key,
        arg_max(m_off, m_off) AS msg_offset,
        ${sql.tsFmt("arg_max(ts, m_off)")} AS ts_s,
        arg_max(m_val, m_off) AS value_str,
        COUNT(*) AS n_superseded
      FROM m GROUP BY topic, m_key ORDER BY topic, msg_key""")),

    // per-topic consumer-lag-style stats over the message log
    GraftQuery("m3_topic_stats", (s, d) => {
      import s.implicits._
      messages(s, d)
        .groupBy($"topic")
        .agg(count(lit(1)).as("n_msgs"),
          min($"offset").as("min_offset"),
          max($"offset").as("max_offset"),
          countDistinct($"key").as("n_keys"),
          sum(length($"value")).cast(LongType).as("bytes"))
        .orderBy($"topic")
    }, Some("""
      SELECT event_type AS topic, COUNT(*) AS n_msgs,
        MIN(event_id) AS min_offset, MAX(event_id) AS max_offset,
        COUNT(DISTINCT 'k' || CAST(user_id % 50 AS VARCHAR)) AS n_keys,
        CAST(SUM(length(props)) AS BIGINT) AS bytes
      FROM events GROUP BY event_type ORDER BY topic"""))
  )
}
