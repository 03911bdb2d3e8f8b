package graft.ingest

import graft.flow.PacketRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S2/S3/S4 ingest surface: JSON packet decode (contract roundtrip,
  * malformed-row behavior) and CSV load with the reference's cleaning
  * chain.
  */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("packet JSON contract roundtrip: replay -> decode") {
    import spark.implicits._
    val tcp = PacketRow(0, 1700000000123456L, 6, 120, "1.2.3.4", "5.6.7.8",
      1234, 80, 60, 0, 1, 1, 0, 1, 1, 0, 0, 0)
    val udp = PacketRow(1, 1700000000500000L, 17, 90, "5.6.7.8", "1.2.3.4",
      53, 9999, 0, 82, 0, 0, 0, 0, 0, 0, 0, 0)
    val json = Seq(PacketReplay.toJson(tcp), PacketReplay.toJson(udp),
      """{"not valid json""")
    val decoded = PacketIngest.decodePackets(json.toDF("value")).collect()
    assert(decoded.length == 3)
    val t = decoded(0)
    assert(t.getAs[java.sql.Timestamp]("timestamp").getTime == 1700000000123L)
    assert(t.getAs[String]("src_ip") == "1.2.3.4")
    assert(t.getAs[Int]("length") == 120)
    assert(t.getAs[Int]("tcp_len") == 60)
    assert(t.getAs[Int]("syn_flag") == 1)
    assert(t.isNullAt(t.fieldIndex("udp_len"))) // tcp packet: udp fields null
    val u = decoded(1)
    assert(u.getAs[Int]("udp_len") == 82)
    assert(u.isNullAt(u.fieldIndex("tcp_len")))
    // malformed JSON -> all-null row (PERMISSIVE), matching main.py:1033
    assert(decoded(2).isNullAt(decoded(2).fieldIndex("src_ip")))
  }

  test("typed packet rows from decoded frame feed the featurizer") {
    import spark.implicits._
    val ps = Seq(
      PacketRow(0, 1000000L, 6, 100, "a", "b", 1, 2, 40, 0, 0, 1, 0, 0, 1, 0, 0, 0),
      PacketRow(1, 2000000L, 6, 200, "b", "a", 2, 1, 140, 0, 0, 0, 0, 1, 1, 0, 0, 0))
    val decoded = PacketIngest.decodePackets(ps.map(PacketReplay.toJson).toDF("value"))
    val rows = PacketIngest.toPacketRows(decoded).as[PacketRow].collect()
    val feats = graft.flow.FlowFeaturizer.features(
      graft.flow.FlowFeaturizer.foldBatch(None, rows.toSeq), "")
    assert(feats.total_fwd_packets == 1)
    assert(feats.total_backward_packets == 1)
    assert(feats.total_length_of_fwd_packets == 100)
    assert(feats.syn_flag_count == 1)
  }

  test("CSV load: name cleaning, meta drop, inf scrub, label derivation") {
    val dir = Files.createTempDirectory("csvflows").toFile
    val f = new java.io.File(dir, "part1.csv")
    val w = new java.io.PrintWriter(f)
    w.println("Unnamed: 0, Flow Duration,Total Fwd. Packets,Flow ID, Label")
    w.println("0,100.5,3,f1,BENIGN")
    w.println("1,Infinity,4,f2,DrDoS_DNS")
    w.println("2,7.25,5,f3, benign ")
    w.close()
    val schema = StructType(Seq(
      StructField("Unnamed: 0", IntegerType),
      StructField(" Flow Duration", DoubleType),
      StructField("Total Fwd. Packets", IntegerType),
      StructField("Flow ID", StringType),
      StructField(" Label", StringType)))
    val df = CsvFlows.load(spark, f.getAbsolutePath, Some(schema))
    assert(df.columns.toSeq == Seq("Unnamed:_0", "Flow_Duration", "Total_Fwd__Packets", "Flow_ID", "Label"))
    val dropped = CsvFlows.dropMeta(df)
    assert(!dropped.columns.contains("Flow_ID"))
    assert(!dropped.columns.contains("Unnamed:_0"))
    val cleaned = CsvFlows.withBinaryLabel(
      CsvFlows.scrubInf(dropped, Seq("Flow_Duration")))
    val rows = cleaned.orderBy("Flow_Duration").collect()
    assert(rows.length == 2) // Infinity row scrubbed -> null -> dropped
    assert(rows.map(_.getAs[Double]("binary_label")).toSeq == Seq(0.0, 0.0))
    assert(rows.map(_.getAs[String]("Label")).toSeq == Seq(Seq("BENIGN"), Seq("BENIGN")).flatten)
  }
}
