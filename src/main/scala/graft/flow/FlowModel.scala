package graft.flow

/** Typed model for the streaming featurizer.
  *
  * The reference keeps state as 60 loosely-typed fields with JSON-string
  * arrays and hand-maintained tuple order (spark_app/main.py:141-232,
  * 943-976); a case class makes that unrepresentable, and the capped
  * sample arrays (main.py:288-292) are replaced by O(1) exact moment
  * accumulators — constant-size state per flow regardless of packet
  * count, which is what survives a 100 TB stream.
  */

/** One packet — matches the batch featurizer's packet stage exactly
  * (JSON contract of producer/reader/simulator.py re-expressed).
  */
case class PacketRow(
    event_id: Long, ts_us: Long, protocol: Long, length: Long,
    src_ip: String, dst_ip: String, src_port: Long, dst_port: Long,
    tcp_len: Long, udp_len: Long,
    fin_flag: Long, syn_flag: Long, rst_flag: Long, psh_flag: Long,
    ack_flag: Long, urg_flag: Long, cwr_flag: Long, ece_flag: Long)

/** Canonical bidirectional flow key (main.py:234-250): lexicographic
  * string-order on IPs picks the normalized endpoint pair.
  */
case class FlowKey(nSrcIp: String, nDstIp: String, nSrcPort: Long, nDstPort: Long, protocol: Long)

object FlowKey {
  def of(p: PacketRow): FlowKey =
    if (p.src_ip < p.dst_ip) FlowKey(p.src_ip, p.dst_ip, p.src_port, p.dst_port, p.protocol)
    else FlowKey(p.dst_ip, p.src_ip, p.dst_port, p.src_port, p.protocol)
}

/** Exact streaming moments: count, sum, min/max, and sum-of-squares held
  * as a split word (hi = Σ x²>>30, lo = Σ x²&(2³⁰−1)) so the exact
  * integer Σx² is recoverable without Long overflow — x up to ~3e12 (µs
  * IATs) squares to ~1e25, beyond Int64 but exactly representable as
  * (hi<<30)+lo. Matches the batch path's DECIMAL sums bit-for-bit after
  * the single round-to-double.
  */
case class Acc(n: Long, sum: Long, sqHi: Long, sqLo: Long, mn: Long, mx: Long) {
  def add(x: Long): Acc = {
    Acc(n + 1, sum + x,
      sqHi + Acc.sqHiOf(x), sqLo + Acc.sqLoOf(x),
      math.min(mn, x), math.max(mx, x))
  }
  def sumsqD: Double = ((BigInt(sqHi) << 30) + BigInt(sqLo)).toDouble
  def minOr0: Long = if (n > 0) mn else 0L
  def maxOr0: Long = if (n > 0) mx else 0L
}
object Acc {
  val Mask: Long = (1L << 30) - 1
  val empty: Acc = Acc(0L, 0L, 0L, 0L, Long.MaxValue, Long.MinValue)

  /** allocation-free exact x² split: the 128-bit square via
    * multiplyHigh, shifted into the (hi<<30 | lo) accumulator words.
    * Valid for x ≥ 0 (lengths and IATs are non-negative).
    */
  def sqHiOf(x: Long): Long = {
    val lo64 = x * x // low 64 bits (wrapping)
    val hi64 = java.lang.Math.multiplyHigh(x, x)
    (hi64 << 34) | (lo64 >>> 30)
  }
  def sqLoOf(x: Long): Long = (x * x) & Mask
}

/** Mutable fold mirror of the five Acc families + counters — the
  * per-packet hot loop must not copy the 40-field immutable state
  * (2-4 case-class copies per packet showed up as the dominant
  * streaming cost). Converted to/from the immutable FlowState at
  * micro-batch boundaries only.
  */
private[flow] final class MutAcc(var n: Long, var sum: Long, var sqHi: Long,
    var sqLo: Long, var mn: Long, var mx: Long) {
  def add(x: Long): Unit = {
    n += 1; sum += x
    sqHi += Acc.sqHiOf(x); sqLo += Acc.sqLoOf(x)
    if (x < mn) mn = x
    if (x > mx) mx = x
  }
  def toAcc: Acc = Acc(n, sum, sqHi, sqLo, mn, mx)
}
private[flow] object MutAcc {
  def of(a: Acc): MutAcc = new MutAcc(a.n, a.sum, a.sqHi, a.sqLo, a.mn, a.mx)
}

/** Per-flow state: orientation from the first observed packet, exact
  * accumulators per stat family, previous timestamps for the IAT seam
  * across micro-batches (main.py:709-719), flag/bulk counters.
  */
case class FlowState(
    flowSrcIp: String, flowDstIp: String, flowSrcPort: Long, flowDstPort: Long,
    protocol: Long,
    firstUs: Long, lastUs: Long,
    prevFwdUs: Long, prevBwdUs: Long, prevFlowUs: Long, // MinValue = unset
    fwdLen: Acc, bwdLen: Acc,
    fwdIat: Acc, bwdIat: Acc, flowIat: Acc,
    fin: Long, syn: Long, rst: Long, psh: Long, ack: Long, urg: Long, cwr: Long, ece: Long,
    fwdPsh: Long, bwdPsh: Long, fwdUrg: Long, bwdUrg: Long,
    fwdHdr: Long, bwdHdr: Long,
    actDataFwd: Long,
    fwdBulkBytes: Long, fwdBulkPkts: Long, fwdBulkCount: Long,
    bwdBulkBytes: Long, bwdBulkPkts: Long, bwdBulkCount: Long)

object FlowState {
  val Unset: Long = Long.MinValue

  def init(p: PacketRow): FlowState = FlowState(
    p.src_ip, p.dst_ip, p.src_port, p.dst_port, p.protocol,
    p.ts_us, p.ts_us, Unset, Unset, Unset,
    Acc.empty, Acc.empty, Acc.empty, Acc.empty, Acc.empty,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0,
    0, 0, 0,
    0, 0, 0, 0, 0, 0)
}

/** The 82-column flow-feature record (output_schema main.py:54-138,
  * names per expected_features.txt). Uniform BIGINT features, matching
  * the batch featurizer's column set exactly.
  */
case class FlowFeatures(
    flow_id: String, source_ip: String, source_port: Long,
    destination_ip: String, destination_port: Long, protocol: Long,
    timestamp_us: Long,
    total_fwd_packets: Long, total_backward_packets: Long,
    total_length_of_fwd_packets: Long, total_length_of_bwd_packets: Long,
    fwd_packet_length_max: Long, fwd_packet_length_min: Long,
    fwd_packet_length_mean: Long, fwd_packet_length_std: Long,
    bwd_packet_length_max: Long, bwd_packet_length_min: Long,
    bwd_packet_length_mean: Long, bwd_packet_length_std: Long,
    flow_bytes_s: Long, flow_packets_s: Long,
    flow_iat_mean: Long, flow_iat_std: Long, flow_iat_max: Long, flow_iat_min: Long,
    fwd_iat_total: Long, fwd_iat_mean: Long, fwd_iat_std: Long,
    fwd_iat_max: Long, fwd_iat_min: Long,
    bwd_iat_total: Long, bwd_iat_mean: Long, bwd_iat_std: Long,
    bwd_iat_max: Long, bwd_iat_min: Long,
    fwd_psh_flags: Long, bwd_psh_flags: Long, fwd_urg_flags: Long, bwd_urg_flags: Long,
    fwd_header_length: Long, bwd_header_length: Long,
    fwd_packets_s: Long, bwd_packets_s: Long,
    min_packet_length: Long, max_packet_length: Long,
    packet_length_mean: Long, packet_length_std: Long, packet_length_variance: Long,
    fin_flag_count: Long, syn_flag_count: Long, rst_flag_count: Long,
    psh_flag_count: Long, ack_flag_count: Long, urg_flag_count: Long,
    cwe_flag_count: Long, ece_flag_count: Long,
    down_up_ratio: Long, average_packet_size: Long,
    avg_fwd_segment_size: Long, avg_bwd_segment_size: Long,
    fwd_avg_bytes_bulk: Long, fwd_avg_packets_bulk: Long, fwd_avg_bulk_rate: Long,
    bwd_avg_bytes_bulk: Long, bwd_avg_packets_bulk: Long, bwd_avg_bulk_rate: Long,
    subflow_fwd_packets: Long, subflow_fwd_bytes: Long,
    subflow_bwd_packets: Long, subflow_bwd_bytes: Long,
    init_win_bytes_forward: Long, init_win_bytes_backward: Long,
    act_data_pkt_fwd: Long, min_seg_size_forward: Long,
    active_mean: Long, active_std: Long, active_max: Long, active_min: Long,
    idle_mean: Long, idle_std: Long, idle_max: Long, idle_min: Long)
