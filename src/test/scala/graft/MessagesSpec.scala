package graft

import graft.functions.{GraftCodec, GraftFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FIXTURES.md family-B semantics: wire frames, RSB1 payload container,
  * the HTTP response record, and the logs table (reference shapes cited in
  * FIXTURES.md §B1-B4). */
class MessagesSpec extends SparkTestBase {

  test("length-prefixed frames round-trip and enforce the 8 MiB cap") {
    val payloads = Seq("a", "", "print('hi')", "x" * 100000).map(_.getBytes("UTF-8"))
    val stream = payloads.flatMap(p => GraftCodec.frameEncode(p).toSeq).toArray
    val back = GraftCodec.frameDecode(stream)
    assert(back.map(new String(_, "UTF-8")) == payloads.map(new String(_, "UTF-8")))
    intercept[IllegalArgumentException] {
      GraftCodec.frameEncode(new Array[Byte](GraftCodec.MaxFrameBytes + 1))
    }
    intercept[IllegalArgumentException] {
      GraftCodec.frameDecode(Array[Byte](0, 0, 0, 9, 1, 2)) // truncated
    }
  }

  test("RSB1 container decodes through the expression pipeline") {
    import spark.implicits._
    val scripts = Seq("print('hello')", "local x = 1", "" , "y" * 5000)
    val ok = scripts.map(s => new String(GraftCodec.rsb1Decode(
      GraftCodec.rsb1Encode(s.getBytes("UTF-8"))), "UTF-8"))
    assert(ok == scripts)
    // through the Catalyst expression on a DataFrame of encoded payloads
    val df = scripts.map(s => GraftCodec.rsb1Encode(s.getBytes("UTF-8"))).toDF("payload")
      .select(GraftFunctions.rsb1_decode($"payload").cast(StringType).as("src"))
    assert(df.collect().map(_.getString(0)).toSeq == scripts)
    // corrupt magic rejected
    intercept[Exception] { GraftCodec.rsb1Decode("XXXX0000garbage".getBytes) }
  }

  test("HTTP response record: from_json, nested projection, success rule") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("Success", BooleanType), StructField("StatusCode", IntegerType),
      StructField("StatusMessage", StringType),
      StructField("Headers", MapType(StringType, StringType)),
      StructField("Cookies", MapType(StringType, StringType)),
      StructField("Body", StringType)))
    val rows = Seq(
      """{"Success":true,"StatusCode":200,"StatusMessage":"OK","Headers":{"ct":"text/html"},"Cookies":{},"Body":"hi"}""",
      """{"Success":true,"StatusCode":204,"StatusMessage":"No Content","Headers":{},"Cookies":{},"Body":""}""",
      """{"Success":false,"StatusCode":404,"StatusMessage":"Not Found","Headers":{"ct":"text/plain"},"Cookies":{"s":"1"},"Body":"nope"}""",
      """{"Success":false,"StatusCode":500,"StatusMessage":"Internal Server Error","Headers":{},"Cookies":{},"Body":""}""")
    val df = rows.toDF("raw").select(from_json($"raw", schema).as("r")).select($"r.*")
    // the Success rule (http.hpp:469): 2xx <=> Success
    val mismatches = df.filter(($"StatusCode".between(200, 299)) =!= $"Success").count()
    assert(mismatches == 0)
    assert(df.filter($"StatusCode" === 404).select(element_at($"Headers", "ct")).head.getString(0) == "text/plain")
    assert(df.select(explode(map_keys($"Cookies"))).count() == 1)
    // to_json round-trip preserves the record
    val rt = df.select(to_json(struct($"Success", $"StatusCode"))).head.getString(0)
    assert(rt.contains("\"StatusCode\":200"))
  }

  test("logs table: tumbling counts per level, latest-N, LIKE filter") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val levels = Seq("INFO", "WARN", "ERROR", "DEBUG")
    val logs = (0 until 50).map { i =>
      (new java.sql.Timestamp(base + i * 7000L), levels(i % 4),
        if (i % 10 == 0) s"call blocked: api$i" else s"msg $i")
    }.toDF("ts", "level", "message")
    // T1: tumbling minute counts per level
    val counts = logs.groupBy(window($"ts", "1 minute"), $"level").count()
    assert(counts.agg(sum($"count")).head.getLong(0) == 50)
    // W1: latest 2 per level
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"level").orderBy($"ts".desc)
    val latest = logs.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(latest.count() == 8)
    // P2: the blocklist-log filter (env.cpp:67 analogue)
    assert(logs.filter($"message".like("%blocked%")).count() == 5)
  }
}
