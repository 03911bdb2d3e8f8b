package graft.ingest

import graft.flow.{FlowFeaturizer, PacketRow}
import graft.sink.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The Kafka source's frame, field for field (kafka-0-10-sql docs).
  * Top-level: Spark encoders can't instantiate spec-inner classes.
  */
case class KafkaFrame(key: Array[Byte], value: Array[Byte], topic: String,
    partition: Int, offset: Long, timestamp: Timestamp, timestampType: Int)

/** S1/K1b wire-contract proof without a broker.
  *
  * No Kafka connector or broker exists in this environment (zero
  * egress, /opt/spark/jars has no kafka jars), so the one thing a live
  * test could add — the socket — is out of reach. Everything else IS
  * testable: Spark's Kafka source emits a fixed frame schema
  * (key/value BINARY, topic STRING, partition INT, offset LONG,
  * timestamp TIMESTAMP, timestampType INT), and the reference consumes
  * exactly `CAST(value AS STRING)` → from_json → data.* from it
  * (spark_app/main.py:1032-1035). These tests drive the engine's full
  * streaming path from a MemoryStream of that exact frame shape —
  * decode (S2), typed packet rows, stateful featurizer timeout row
  * (A1) — and pin the producer-side serialization of the `ddos_result`
  * sink (K1b) the indexer consumes (indexer/indexer.py:26-34).
  */
class KafkaContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def frame(json: String, offset: Long): KafkaFrame =
    KafkaFrame(null, json.getBytes("UTF-8"), "ddos_packets_raw", 0, offset,
      new Timestamp(1700000000000L + offset), 0)

  private def packetJson(tsFrac: String, srcIp: String, srcPort: Int, length: Int): String =
    s"""{"timestamp":"2024-01-01 00:00:$tsFrac","src_ip":"$srcIp","dst_ip":"10.0.0.9",
       |"length":$length,"protocol":6,"src_port":$srcPort,"dst_port":443,
       |"tcp_len":${math.max(length - 60, 0)},"fin_flag":0,"syn_flag":1,"rst_flag":0,
       |"psh_flag":1,"ack_flag":0,"urg_flag":0,"cwr_flag":0,"ece_flag":0}""".stripMargin.replace("\n", "")

  test("batch decode of the Kafka frame: binary value → typed packets, malformed → nulls") {
    import spark.implicits._
    val frames = Seq(
      frame(packetJson("00.123456", "10.0.0.1", 1000, 120), 0L),
      frame("not json at all", 1L),
      frame(packetJson("01.000001", "10.0.0.2", 1001, 80), 2L)
    ).toDS().toDF()
    // exact Kafka source frame schema
    assert(frames.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      "key" -> "binary", "value" -> "binary", "topic" -> "string",
      "partition" -> "integer", "offset" -> "long",
      "timestamp" -> "timestamp", "timestampType" -> "integer"))
    val decoded = PacketIngest.decodePackets(frames).collect()
    assert(decoded.length == 3)
    val good = decoded.filter(_.getAs[String]("src_ip") != null)
    assert(good.map(_.getAs[String]("src_ip")).toSet == Set("10.0.0.1", "10.0.0.2"))
    // PERMISSIVE parse parity: malformed JSON → all-null row, not a failure
    assert(decoded.count(r => r.getAs[String]("src_ip") == null) == 1)
    val rows = PacketIngest.toPacketRows(PacketIngest.decodePackets(frames))
      .filter("src_ip IS NOT NULL").collect()
    val byPort = rows.map(r => r.getAs[Long]("src_port") -> r).toMap
    assert(byPort(1000L).getAs[Long]("ts_us") % 1000000L == 123456L)
    assert(byPort(1000L).getAs[Long]("tcp_len") == 60L)
    assert(byPort(1001L).getAs[Long]("ts_us") % 1000000L == 1L)
    assert(rows.forall(_.getAs[Long]("syn_flag") == 1L))
  }

  test("streaming e2e from the Kafka frame shape: decode → featurize → _TIMEOUT row") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[KafkaFrame]
    val packets = PacketIngest.toPacketRows(
      PacketIngest.decodePackets(input.toDF()))
      .filter("src_ip IS NOT NULL") // malformed wire records drop here
      .as[PacketRow]
    val q = FlowFeaturizer.featurize(packets, timeoutMs = 500)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("kafka_contract_e2e")
      .start()
    try {
      input.addData(
        frame(packetJson("00.000000", "10.0.0.1", 1000, 120), 0L),
        frame(packetJson("00.250000", "10.0.0.1", 1000, 90), 1L),
        frame("garbage value", 2L))
      val deadline = System.currentTimeMillis() + 30000
      var rows = spark.table("kafka_contract_e2e").collect()
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); rows = spark.table("kafka_contract_e2e").collect()
      }
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[String]("flow_id") == "10.0.0.1:1000-10.0.0.9:443-6_TIMEOUT")
      assert(r.getAs[Long]("total_fwd_packets") == 2)
      assert(r.getAs[Long]("flow_iat_mean") == 250000L)
    } finally q.stop()
  }

  test("ddos_result sink serialization: key = flow_id bytes, value = row JSON (indexer contract)") {
    import spark.implicits._
    val flows = Seq(
      ("1.1.1.1:10-2.2.2.2:20-6_TIMEOUT", 12L, 34L, "DDoS"),
      ("3.3.3.3:30-4.4.4.4:40-17_TIMEOUT", 5L, 6L, "Normal")
    ).toDF("flow_id", "total_fwd_packets", "total_backward_packets", "Label")
    val recs = Sinks.toKafkaRecords(flows)
    assert(recs.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq("key" -> "binary", "value" -> "binary"))
    val collected = recs.collect()
      .map(r => (new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toMap
    assert(collected.keySet == Set(
      "1.1.1.1:10-2.2.2.2:20-6_TIMEOUT", "3.3.3.3:30-4.4.4.4:40-17_TIMEOUT"))
    // value roundtrips through a JSON reader to the original rows —
    // what indexer.py's json.loads sees
    val back = spark.read.json(collected.values.toSeq.toDS())
      .select("flow_id", "total_fwd_packets", "total_backward_packets", "Label")
      .collect().map(_.toSeq).toSet
    assert(back == flows.collect().map(_.toSeq).toSet)
  }
}
