package graft.streaming

import graft.SparkTestBase
import java.sql.Timestamp

/** Option-translation and schema-normalization contract of the Kafka shim.
  * No broker exists in this sandbox, so `.load()` is never called — these
  * pin exactly the parts that are pure: the option map the connector would
  * receive and the projection from its output schema to the bus schema. */
class KafkaBridgeSpec extends SparkTestBase {

  test("options: subscribe list, admission, passthrough") {
    val opts = KafkaBridge.options(KafkaBusConfig(
      bootstrapServers = "b1:9092,b2:9092",
      topics = Seq("orders", "events.v2"),
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(50000L),
      failOnDataLoss = false,
      extra = Map("kafka.security.protocol" -> "SSL")))
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "orders,events.v2",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "50000",
      "kafka.security.protocol" -> "SSL"))
  }

  test("options: pattern subscription, defaults") {
    val opts = KafkaBridge.options(KafkaBusConfig(
      bootstrapServers = "b:9092", topicPattern = Some("logs-.*")))
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribePattern" -> "logs-.*",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "true"))
  }

  test("options: invalid configs are rejected, not mistranslated") {
    val base = KafkaBusConfig("b:9092", topics = Seq("t"))
    // both or neither subscription mode
    intercept[IllegalArgumentException](
      KafkaBridge.options(base.copy(topicPattern = Some("x.*"))))
    intercept[IllegalArgumentException](
      KafkaBridge.options(base.copy(topics = Nil)))
    // un-prefixed extra keys could shadow translated options
    intercept[IllegalArgumentException](
      KafkaBridge.options(base.copy(extra = Map("subscribe" -> "evil"))))
    // comma in a topic name would corrupt the subscribe list
    intercept[IllegalArgumentException](
      KafkaBridge.options(base.copy(topics = Seq("a,b"))))
    // a kafka.-prefixed extra that IS a translated key would silently win
    // (extras are appended last) — rejected instead
    intercept[IllegalArgumentException](
      KafkaBridge.options(base.copy(
        extra = Map("kafka.bootstrap.servers" -> "stale:9092"))))
    intercept[IllegalArgumentException](
      KafkaBridge.options(base.copy(bootstrapServers = "")))
  }

  test("reader: carries format kafka without needing the connector jar") {
    // building the reader is pure config; only .load() needs the jar
    KafkaBridge.reader(spark, KafkaBusConfig("b:9092", topics = Seq("t")))
  }

  test("normalize: kafka output schema projects onto the bus schema") {
    import spark.implicits._
    // the connector's fixed output schema, built as a static frame
    val kafkaShaped = Seq(
      ("k1".getBytes("UTF-8"), "v1".getBytes("UTF-8"), "orders", 0,
        7L, new Timestamp(1700000000000L), 0),
      (null.asInstanceOf[Array[Byte]], "v2".getBytes("UTF-8"), "orders", 1,
        9L, new Timestamp(1700000001000L), 0)
    ).toDF("key", "value", "topic", "partition", "offset", "timestamp",
      "timestampType")
    val out = KafkaBridge.normalize(kafkaShaped)
    assert(out.schema.map(f => (f.name, f.dataType.typeName)) ==
      FrameBusSource.Schema.map(f => (f.name, f.dataType.typeName)),
      "normalized shape must equal the dev source's schema")
    val rows = out.orderBy("offset").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("orders", "orders"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(7L, 9L))
    assert(rows(0).getString(3) == "k1" && rows(1).getString(3) == null,
      "binary keys decode to strings; null keys stay null")
    assert(new String(rows(0).getAs[Array[Byte]](4), "UTF-8") == "v1")
  }
}
