package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Packet-stream ingestion (S1/S2): the Kafka source contract of the
  * reference (spark_app/main.py:1023-1035) — subscribe to the raw topic,
  * cast value to string, parse the declared JSON schema, flatten.
  *
  * The JSON contract follows DATA_CONTRACT.md:7-36 / input_schema
  * (main.py:21-49); malformed JSON yields null fields via from_json,
  * matching the reference's PERMISSIVE behavior.
  *
  * Scale: one Kafka partition maps to one Spark input partition; the
  * downstream shuffle to flow-key partitioning is the first (and only)
  * wide exchange. `startingOffsets` defaults to latest like the
  * reference (main.py:1027); checkpointing gives at-least-once.
  */
object PacketIngest {

  /** input_schema, main.py:21-49 (timestamp parsed from the producer's
    * "%Y-%m-%d %H:%M:%S.%f" strings).
    */
  val packetJsonSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("src_ip", StringType, nullable = false),
    StructField("dst_ip", StringType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("protocol", IntegerType, nullable = false),
    StructField("src_port", IntegerType, nullable = false),
    StructField("dst_port", IntegerType, nullable = false),
    StructField("udp_len", IntegerType),
    StructField("tcp_seq", IntegerType),
    StructField("tcp_ack", IntegerType),
    StructField("tcp_win", IntegerType),
    StructField("tcp_len", IntegerType),
    StructField("cwr_flag", IntegerType),
    StructField("ece_flag", IntegerType),
    StructField("urg_flag", IntegerType),
    StructField("ack_flag", IntegerType),
    StructField("psh_flag", IntegerType),
    StructField("rst_flag", IntegerType),
    StructField("syn_flag", IntegerType),
    StructField("fin_flag", IntegerType)))

  /** S1: the Kafka stream source (config parity with
    * main.py:1023-1028). Needs a live broker to START, but everything
    * downstream of the socket — the source's frame schema, the decode,
    * the typed packet path into the featurizer — is proven broker-less
    * by KafkaContractSpec, which drives a MemoryStream shaped exactly
    * like this source's output.
    */
  def kafkaStream(spark: SparkSession, bootstrap: String,
      topic: String = "ddos_packets_raw",
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** S2: value decode — works on both the Kafka frame (binary `value`)
    * and any test frame with a string `value` column.
    */
  def decodePackets(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame
      .select(from_json(col("value").cast("string"), packetJsonSchema).as("data"))
      .select("data.*")

  /** Typed packet rows (engine-internal µs representation) from the
    * decoded JSON frame.
    */
  def toPacketRows(decoded: DataFrame): DataFrame =
    decoded.selectExpr(
      // deterministic per-row id (streaming-safe, unlike
      // monotonically_increasing_id): only used as a stable sort
      // tiebreak for identical timestamps within a flow
      "xxhash64(src_ip, dst_ip, src_port, dst_port, timestamp, length) AS event_id",
      "unix_micros(timestamp) AS ts_us",
      "CAST(protocol AS BIGINT) AS protocol",
      "CAST(length AS BIGINT) AS length",
      "src_ip", "dst_ip",
      "CAST(src_port AS BIGINT) AS src_port",
      "CAST(dst_port AS BIGINT) AS dst_port",
      "CAST(coalesce(tcp_len, 0) AS BIGINT) AS tcp_len",
      "CAST(coalesce(udp_len, 0) AS BIGINT) AS udp_len",
      "CAST(coalesce(fin_flag, 0) AS BIGINT) AS fin_flag",
      "CAST(coalesce(syn_flag, 0) AS BIGINT) AS syn_flag",
      "CAST(coalesce(rst_flag, 0) AS BIGINT) AS rst_flag",
      "CAST(coalesce(psh_flag, 0) AS BIGINT) AS psh_flag",
      "CAST(coalesce(ack_flag, 0) AS BIGINT) AS ack_flag",
      "CAST(coalesce(urg_flag, 0) AS BIGINT) AS urg_flag",
      "CAST(coalesce(cwr_flag, 0) AS BIGINT) AS cwr_flag",
      "CAST(coalesce(ece_flag, 0) AS BIGINT) AS ece_flag")
}
