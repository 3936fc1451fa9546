package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StringType

/** Declarative config for the Kafka leg of the S3 ingest contract — the
  * scale deployment of what [[FrameBusProvider]] stands in for in dev/test
  * (same role as the reference's TCP ingest server, server.cpp:18-111:
  * admit frames, track offsets, replay on restart).
  *
  * Exactly one of `topics` (explicit subscribe list) or `topicPattern`
  * (regex subscription) must be set. `extra` passes broker/client tuning
  * through; every key must carry the `kafka.` prefix the connector expects
  * for client properties, so a typo'd option can't silently shadow one of
  * the translated keys.
  */
final case class KafkaBusConfig(
    bootstrapServers: String,
    topics: Seq[String] = Nil,
    topicPattern: Option[String] = None,
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = None,
    failOnDataLoss: Boolean = true,
    extra: Map[String, String] = Map.empty)

/** Option-mapping shim between the bus-shaped ingest surface and the
  * `spark-sql-kafka-0-10` connector. The sandbox has no broker and no
  * connector jar, so [[reader]] stops at a configured `DataStreamReader`
  * (calling `.load()` requires the connector on the classpath — see
  * DESIGN.md "Kafka deployment recipe"); [[options]] and [[normalize]]
  * are pure and fully unit-tested.
  *
  * Contract parity with [[FrameBusProvider]]:
  *   - offsets: Kafka's (partition, offset) replaces the bus's per-topic
  *     frame index; checkpointed resume is identical (offsets in the
  *     query checkpoint, not the broker's consumer group).
  *   - admission: `maxOffsetsPerTrigger` maps 1:1.
  *   - schema: [[normalize]] projects the connector's output onto the bus
  *     schema (topic, offset, ts, key, value), so every pipeline written
  *     against the dev source runs unchanged at scale.
  */
object KafkaBridge {

  /** Translate a [[KafkaBusConfig]] to the connector's reader options. */
  def options(c: KafkaBusConfig): Map[String, String] = {
    require(c.bootstrapServers.nonEmpty, "bootstrapServers must be set")
    require(c.topics.nonEmpty ^ c.topicPattern.nonEmpty,
      "exactly one of topics / topicPattern must be set")
    require(c.topics.forall(_.matches("[A-Za-z0-9._-]+")),
      s"topic names must be simple names: ${c.topics.mkString(",")}")
    val badExtra = c.extra.keys.filterNot(_.startsWith("kafka."))
    require(badExtra.isEmpty,
      s"extra options must be kafka.-prefixed client properties, got: " +
        badExtra.mkString(","))
    // the kafka. prefix alone doesn't protect the translated keys that
    // themselves carry it — an extra "kafka.bootstrap.servers" appended
    // last would silently win over the typed field
    val shadowed = c.extra.keys.filter(k =>
      k.equalsIgnoreCase("kafka.bootstrap.servers"))
    require(shadowed.isEmpty,
      s"extra options may not shadow translated keys: ${shadowed.mkString(",")}")
    val subscription: (String, String) =
      if (c.topics.nonEmpty) "subscribe" -> c.topics.mkString(",")
      else "subscribePattern" -> c.topicPattern.get
    Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      subscription,
      "startingOffsets" -> c.startingOffsets,
      "failOnDataLoss" -> c.failOnDataLoss.toString) ++
      c.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      c.extra
  }

  /** A `format("kafka")` reader carrying [[options]]. Deferred: `.load()`
    * needs the spark-sql-kafka connector jar (not in this sandbox). */
  def reader(s: SparkSession, c: KafkaBusConfig): DataStreamReader =
    options(c).foldLeft(s.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }

  /** Project the Kafka source schema (key/value binary, topic, partition,
    * offset, timestamp, timestampType) onto the bus schema
    * (topic, offset, ts, key, value) — [[FrameBusSource.Schema]] minus
    * nullability, which the broker cannot promise for keys. */
  def normalize(df: DataFrame): DataFrame =
    df.select(
      col("topic"),
      col("offset"),
      col("timestamp").as("ts"),
      col("key").cast(StringType).as("key"),
      col("value"))
}
