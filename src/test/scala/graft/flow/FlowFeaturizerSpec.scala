package graft.flow

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class FlowFeaturizerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming (single batch) == batch featurizer, bit for bit") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = BatchFlowFeaturizer.fromEvents(events).collect()
      .map(r => r.getAs[String]("flow_id").stripSuffix("_TIMEOUT") ->
        r.toSeq.drop(1)).toMap
    val stream = FlowFeaturizer.runFileStream(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[String]("flow_id") -> r.toSeq.drop(1)).toMap
    assert(batch.keySet == stream.keySet)
    for ((k, v) <- batch) assert(stream(k) == v, s"flow $k differs")
    assert(batch.nonEmpty)
  }

  test("cross-batch IAT seam: two micro-batches == one batch") {
    val pkts = (0 until 10).map { i =>
      PacketRow(i.toLong, i.toLong * 250000, 6, 100 + 10 * i,
        "1.1.1.1", "2.2.2.2", 10, 20, 40, 0, 0, 0, 0, i % 2, 1, 0, 0, 0)
    }
    val (b1, b2) = pkts.splitAt(4)
    val once = FlowFeaturizer.features(FlowFeaturizer.foldBatch(None, pkts), "")
    val twice = FlowFeaturizer.features(
      FlowFeaturizer.foldBatch(Some(FlowFeaturizer.foldBatch(None, b1)), b2), "")
    // bulk counters are per-batch by design; everything else must agree
    assert(once == twice)
  }

  test("processing-time timeout emits _TIMEOUT row and removes state") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PacketRow]
    // NOTE: with ProcessingTimeTimeout the engine runs continuous
    // timer-check micro-batches, which livelocks processAllAvailable —
    // poll the sink instead; timers fire without any further input.
    val q = FlowFeaturizer.featurize(input.toDS(), timeoutMs = 500)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("timeout_test")
      .start()
    def pollRows(n: Int): Array[org.apache.spark.sql.Row] = {
      val deadline = System.currentTimeMillis() + 30000
      var rows = spark.table("timeout_test").collect()
      while (rows.length < n && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        rows = spark.table("timeout_test").collect()
      }
      rows
    }
    try {
      input.addData(PacketRow(0, 0, 6, 100, "9.9.9.9", "8.8.8.8", 1, 2, 40, 0,
        0, 1, 0, 0, 1, 0, 0, 0))
      val rows = pollRows(1)
      assert(rows.length == 1) // nothing until the timeout fired
      val r = rows.head
      assert(r.getAs[String]("flow_id") == "9.9.9.9:1-8.8.8.8:2-6_TIMEOUT")
      assert(r.getAs[Long]("total_fwd_packets") == 1)
      assert(r.getAs[Long]("syn_flag_count") == 1)
      // a second flow must also flush, and the first must NOT re-emit
      // (state removed on timeout)
      input.addData(PacketRow(1, 99, 17, 50, "7.7.7.7", "6.6.6.6", 3, 4, 0, 2,
        0, 0, 0, 0, 0, 0, 0, 0))
      val rows2 = pollRows(2)
      assert(rows2.length == 2)
      val ids = rows2.map(_.getString(0)).toSet
      assert(ids.contains("7.7.7.7:3-6.6.6.6:4-17_TIMEOUT"))
    } finally q.stop()
  }

  test("canonical key is orientation-invariant") {
    val p = PacketRow(0, 0, 6, 100, "b.b.b.b", "a.a.a.a", 1, 2, 40, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    val swapped = p.copy(src_ip = p.dst_ip, dst_ip = p.src_ip,
      src_port = p.dst_port, dst_port = p.src_port)
    assert(FlowKey.of(p) == FlowKey.of(swapped))
  }
}
