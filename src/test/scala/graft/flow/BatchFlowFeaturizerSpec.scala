package graft.flow

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

case class P(
    event_id: Long, ts_us: Long, protocol: Long, length: Long,
    src_ip: String, dst_ip: String, src_port: Long, dst_port: Long,
    tcp_len: Long, udp_len: Long,
    fin_flag: Long, syn_flag: Long, rst_flag: Long, psh_flag: Long,
    ack_flag: Long, urg_flag: Long, cwr_flag: Long, ece_flag: Long)

/** Hand-computed oracle values for the batch flow featurizer, covering
  * the reference's edge semantics (SURVEY.md §2.7): empty→0, n≤1 std→0,
  * duration floor 0.001s, int truncation, first-packet orientation,
  * single-batch bulk, fixed header constants.
  */
class BatchFlowFeaturizerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tcpP(id: Long, t: Long, s: String, d: String, sp: Long, dp: Long,
      len: Long, psh: Long) =
    P(id, t, 6, len, s, d, sp, dp, math.max(len - 60, 0), 0, 0, 0, 0, psh, 1, 0, 0, 0)

  lazy val rows: Map[String, org.apache.spark.sql.Row] = {
    import spark.implicits._
    val pkts = Seq(
      // flow 1: A→B tcp; fwd = p0,p2 (A→B), bwd = p1; bulk packet in fwd
      tcpP(0, 0L, "10.0.0.1", "10.0.0.2", 1000, 2000, 100, 1),
      tcpP(1, 1000000L, "10.0.0.2", "10.0.0.1", 2000, 1000, 200, 0),
      tcpP(2, 3000000L, "10.0.0.1", "10.0.0.2", 1000, 2000, 1500, 1),
      // flow 2: first packet goes from the LARGER ip — orientation ≠ canonical
      P(3, 10000000L, 17, 300, "10.0.0.9", "10.0.0.3", 5000, 53, 0, 252, 0, 0, 0, 0, 0, 0, 0, 0),
      P(4, 10500000L, 17, 80, "10.0.0.3", "10.0.0.9", 53, 5000, 0, 32, 0, 0, 0, 0, 0, 0, 0, 0),
      // flow 3: single packet — duration floor kicks in
      P(5, 20000000L, 17, 50, "10.0.0.7", "10.0.0.8", 1, 2, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0)
    )
    val out = BatchFlowFeaturizer.features(pkts.toDF()).collect()
    assert(out.length == 3)
    out.map(r => r.getAs[String]("flow_id") -> r).toMap
  }

  private def f(flowId: String, col: String): Long =
    rows(flowId).getAs[Long](col)

  val f1 = "10.0.0.1:1000-10.0.0.2:2000-6_TIMEOUT"
  val f2 = "10.0.0.9:5000-10.0.0.3:53-17_TIMEOUT"
  val f3 = "10.0.0.7:1-10.0.0.8:2-17_TIMEOUT"

  test("direction split & byte totals") {
    assert(f(f1, "total_fwd_packets") == 2)
    assert(f(f1, "total_backward_packets") == 1)
    assert(f(f1, "total_length_of_fwd_packets") == 1600)
    assert(f(f1, "total_length_of_bwd_packets") == 200)
    assert(f(f1, "subflow_fwd_bytes") == 1600)
  }

  test("length stats incl. exact std and n<=1 -> 0") {
    assert(f(f1, "fwd_packet_length_max") == 1500)
    assert(f(f1, "fwd_packet_length_min") == 100)
    assert(f(f1, "fwd_packet_length_mean") == 800)
    assert(f(f1, "fwd_packet_length_std") == 700) // exact: var=490000
    assert(f(f1, "bwd_packet_length_std") == 0)   // n=1
    assert(f(f1, "packet_length_mean") == 600)
    assert(f(f1, "packet_length_std") == 637)     // floor(637.70...)
    assert(f(f1, "packet_length_variance") == 406666)
  }

  test("IAT families") {
    assert(f(f1, "flow_iat_mean") == 1500000)
    assert(f(f1, "flow_iat_std") == 500000)
    assert(f(f1, "flow_iat_max") == 2000000)
    assert(f(f1, "flow_iat_min") == 1000000)
    assert(f(f1, "fwd_iat_total") == 3000000)
    assert(f(f1, "fwd_iat_mean") == 3000000)
    assert(f(f1, "fwd_iat_std") == 0) // n=1
    assert(f(f1, "bwd_iat_total") == 0)
    assert(f(f1, "bwd_iat_max") == 0) // empty -> 0
  }

  test("rates and ratios with int truncation") {
    assert(f(f1, "flow_bytes_s") == 600)   // 1800B / 3s
    assert(f(f1, "flow_packets_s") == 1)
    assert(f(f1, "fwd_packets_s") == 0)    // floor(2/3)
    assert(f(f1, "down_up_ratio") == 0)    // floor(200/1600)
    assert(f(f1, "average_packet_size") == 600)
    assert(f(f1, "avg_fwd_segment_size") == 800)
    assert(f(f1, "avg_bwd_segment_size") == 200)
  }

  test("flags, headers, act_data") {
    assert(f(f1, "fwd_psh_flags") == 2)
    assert(f(f1, "bwd_psh_flags") == 0)
    assert(f(f1, "psh_flag_count") == 2)
    assert(f(f1, "ack_flag_count") == 3)
    assert(f(f1, "fwd_header_length") == 40) // 2 tcp × 20
    assert(f(f1, "bwd_header_length") == 20)
    assert(f(f1, "act_data_pkt_fwd") == 2)
  }

  test("bulk (single-batch semantics)") {
    assert(f(f1, "fwd_avg_bytes_bulk") == 1500)
    assert(f(f1, "fwd_avg_packets_bulk") == 1)
    assert(f(f1, "fwd_avg_bulk_rate") == 500) // 1500/3s
    assert(f(f1, "bwd_avg_bytes_bulk") == 0)
  }

  test("orientation from first packet, not canonical order") {
    val r = rows(f2)
    assert(r.getAs[String]("source_ip") == "10.0.0.9")
    assert(r.getAs[String]("destination_ip") == "10.0.0.3")
    assert(f(f2, "total_fwd_packets") == 1)
    assert(f(f2, "total_backward_packets") == 1)
    assert(f(f2, "fwd_header_length") == 8) // udp constant
    assert(f(f2, "flow_bytes_s") == 760)    // 380B / 0.5s
    assert(f(f2, "flow_packets_s") == 4)
    assert(f(f2, "act_data_pkt_fwd") == 1)  // udp_len 252 > 0
  }

  test("single-packet flow: duration floor 0.001s, empties -> 0") {
    assert(f(f3, "flow_bytes_s") == 50000) // 50B / 0.001s
    assert(f(f3, "flow_packets_s") == 1000)
    assert(f(f3, "flow_iat_mean") == 0)
    assert(f(f3, "packet_length_std") == 0)
    assert(f(f3, "min_packet_length") == 50)
    assert(f(f3, "max_packet_length") == 50)
    assert(f(f3, "total_backward_packets") == 0)
    assert(f(f3, "bwd_packet_length_min") == 0) // inf-untouched -> 0
  }

  test("degenerate parity columns are 0") {
    for (c <- Seq("active_mean", "active_std", "active_max", "active_min",
        "idle_mean", "idle_std", "idle_max", "idle_min",
        "init_win_bytes_forward", "init_win_bytes_backward", "min_seg_size_forward"))
      assert(f(f1, c) == 0, c)
  }

  test("events-derived packets: conservation invariants at sf0.001") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val n = events.count()
    val feats = BatchFlowFeaturizer.fromEvents(events)
    val agg = feats.selectExpr(
      "sum(total_fwd_packets + total_backward_packets) AS pkts",
      "sum(CASE WHEN subflow_fwd_packets = total_fwd_packets THEN 0 ELSE 1 END) AS bad_alias",
      "sum(CASE WHEN flow_iat_max > 0 AND flow_iat_min > flow_iat_max THEN 1 ELSE 0 END) AS bad_minmax"
    ).collect()(0)
    assert(agg.getAs[Long]("pkts") == n)
    assert(agg.getAs[Long]("bad_alias") == 0)
    assert(agg.getAs[Long]("bad_minmax") == 0)
  }
}
