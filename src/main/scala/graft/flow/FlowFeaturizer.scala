package graft.flow

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming flow featurizer — the engine's core custom operator.
  *
  * Re-expresses the reference's `applyInPandasWithState` aggregation
  * (spark_app/main.py:1041-1053, update_state :254-990) as
  * `flatMapGroupsWithState` over typed state: no Arrow/Python boundary,
  * no JSON-string state arrays, no hand-maintained tuple order. State is
  * O(1) per flow (exact moment accumulators), session-ized by a
  * processing-time timeout exactly like the reference (60 s default,
  * main.py:981): on timeout the final feature row is emitted with the
  * `_TIMEOUT` marker (main.py:411,489-492) and state is removed.
  *
  * Scale: state partitioning follows the 5-column canonical key — the
  * same single shuffle as the batch path; per-key state is a few hundred
  * bytes regardless of flow length, so the state store holds ~flows, not
  * ~packets. No watermark, matching the reference (late data folds into
  * live state; the timeout bounds state growth).
  */
object FlowFeaturizer {

  val DefaultTimeoutMs = 60000L

  // ---- per-packet fold (pure; unit-testable without a stream) ----

  private def isFwd(s: FlowState, p: PacketRow): Boolean =
    p.src_ip == s.flowSrcIp && p.dst_ip == s.flowDstIp &&
      p.src_port == s.flowSrcPort && p.dst_port == s.flowDstPort

  /** Folds one sorted micro-batch of packets into state. Bulk counters
    * use the reference's per-batch semantics (main.py:738-742): one
    * "bulk" per direction per micro-batch that contains >1000 B packets.
    */
  def foldBatch(init: Option[FlowState], packets: Seq[PacketRow]): FlowState = {
    require(packets.nonEmpty)
    val sorted = packets.sortBy(p => (p.ts_us, p.event_id))
    val s0 = init.getOrElse(FlowState.init(sorted.head))
    // mutable mirror for the hot loop; same math, no per-packet copies
    val fwdLen = MutAcc.of(s0.fwdLen); val bwdLen = MutAcc.of(s0.bwdLen)
    val fwdIat = MutAcc.of(s0.fwdIat); val bwdIat = MutAcc.of(s0.bwdIat)
    val flowIat = MutAcc.of(s0.flowIat)
    var lastUs = s0.lastUs
    var prevFwdUs = s0.prevFwdUs; var prevBwdUs = s0.prevBwdUs
    var prevFlowUs = s0.prevFlowUs
    var fin = s0.fin; var syn = s0.syn; var rst = s0.rst; var psh = s0.psh
    var ack = s0.ack; var urg = s0.urg; var cwr = s0.cwr; var ece = s0.ece
    var fwdPsh = s0.fwdPsh; var bwdPsh = s0.bwdPsh
    var fwdUrg = s0.fwdUrg; var bwdUrg = s0.bwdUrg
    var fwdHdr = s0.fwdHdr; var bwdHdr = s0.bwdHdr
    var actDataFwd = s0.actDataFwd
    var fwdBulkBytes = s0.fwdBulkBytes; var fwdBulkPkts = s0.fwdBulkPkts
    var bwdBulkBytes = s0.bwdBulkBytes; var bwdBulkPkts = s0.bwdBulkPkts
    var fwdBulk = false
    var bwdBulk = false
    for (p <- sorted) {
      val fwd = isFwd(s0, p)
      val hdr = if (p.protocol == 6) 20L else 8L
      // whole-flow IAT seam (main.py:807-819)
      if (prevFlowUs != FlowState.Unset) flowIat.add(p.ts_us - prevFlowUs)
      if (p.ts_us > lastUs) lastUs = p.ts_us
      prevFlowUs = p.ts_us
      fin += p.fin_flag; syn += p.syn_flag; rst += p.rst_flag; psh += p.psh_flag
      ack += p.ack_flag; urg += p.urg_flag; cwr += p.cwr_flag; ece += p.ece_flag
      if (fwd) {
        if (prevFwdUs != FlowState.Unset) fwdIat.add(p.ts_us - prevFwdUs)
        if (p.length > 1000) {
          fwdBulk = true; fwdBulkBytes += p.length; fwdBulkPkts += 1
        }
        fwdLen.add(p.length); prevFwdUs = p.ts_us
        fwdPsh += p.psh_flag; fwdUrg += p.urg_flag; fwdHdr += hdr
        if (p.tcp_len > 0 || p.udp_len > 0) actDataFwd += 1
      } else {
        if (prevBwdUs != FlowState.Unset) bwdIat.add(p.ts_us - prevBwdUs)
        if (p.length > 1000) {
          bwdBulk = true; bwdBulkBytes += p.length; bwdBulkPkts += 1
        }
        bwdLen.add(p.length); prevBwdUs = p.ts_us
        bwdPsh += p.psh_flag; bwdUrg += p.urg_flag; bwdHdr += hdr
      }
    }
    FlowState(
      s0.flowSrcIp, s0.flowDstIp, s0.flowSrcPort, s0.flowDstPort, s0.protocol,
      s0.firstUs, lastUs, prevFwdUs, prevBwdUs, prevFlowUs,
      fwdLen.toAcc, bwdLen.toAcc, fwdIat.toAcc, bwdIat.toAcc, flowIat.toAcc,
      fin, syn, rst, psh, ack, urg, cwr, ece,
      fwdPsh, bwdPsh, fwdUrg, bwdUrg, fwdHdr, bwdHdr, actDataFwd,
      fwdBulkBytes, fwdBulkPkts, s0.fwdBulkCount + (if (fwdBulk) 1L else 0L),
      bwdBulkBytes, bwdBulkPkts, s0.bwdBulkCount + (if (bwdBulk) 1L else 0L))
  }

  // ---- feature emission (mirrors FlowFeatureSql.finalExprs bit-for-bit) ----

  private def fdiv(num: Double, den: Double): Long = math.floor(num / den).toLong
  private def meanI(sum: Long, n: Long): Long = if (n > 0) fdiv(sum.toDouble, n.toDouble) else 0L
  private def stdD(a: Acc): Double =
    math.sqrt(math.max(a.n.toDouble * a.sumsqD - a.sum.toDouble * a.sum.toDouble, 0.0) /
      (a.n.toDouble * a.n.toDouble))
  private def stdI(a: Acc): Long = if (a.n > 1) math.floor(stdD(a)).toLong else 0L

  def features(s: FlowState, suffix: String): FlowFeatures = {
    val nFwd = s.fwdLen.n
    val nBwd = s.bwdLen.n
    val nAll = nFwd + nBwd
    val fwdBytes = s.fwdLen.sum
    val bwdBytes = s.bwdLen.sum
    val allLen = Acc(nAll, fwdBytes + bwdBytes,
      s.fwdLen.sqHi + s.bwdLen.sqHi, s.fwdLen.sqLo + s.bwdLen.sqLo,
      math.min(s.fwdLen.mn, s.bwdLen.mn), math.max(s.fwdLen.mx, s.bwdLen.mx))
    val durS = math.max((s.lastUs - s.firstUs).toDouble / 1000000.0, 0.001)
    val allStdD = if (nAll > 1) stdD(allLen) else 0.0
    FlowFeatures(
      flow_id = s"${s.flowSrcIp}:${s.flowSrcPort}-${s.flowDstIp}:${s.flowDstPort}-${s.protocol}$suffix",
      source_ip = s.flowSrcIp, source_port = s.flowSrcPort,
      destination_ip = s.flowDstIp, destination_port = s.flowDstPort,
      protocol = s.protocol,
      timestamp_us = s.lastUs,
      total_fwd_packets = nFwd, total_backward_packets = nBwd,
      total_length_of_fwd_packets = fwdBytes, total_length_of_bwd_packets = bwdBytes,
      fwd_packet_length_max = s.fwdLen.maxOr0, fwd_packet_length_min = s.fwdLen.minOr0,
      fwd_packet_length_mean = meanI(fwdBytes, nFwd), fwd_packet_length_std = stdI(s.fwdLen),
      bwd_packet_length_max = s.bwdLen.maxOr0, bwd_packet_length_min = s.bwdLen.minOr0,
      bwd_packet_length_mean = meanI(bwdBytes, nBwd), bwd_packet_length_std = stdI(s.bwdLen),
      flow_bytes_s = fdiv((fwdBytes + bwdBytes).toDouble, durS),
      flow_packets_s = fdiv(nAll.toDouble, durS),
      flow_iat_mean = meanI(s.flowIat.sum, s.flowIat.n), flow_iat_std = stdI(s.flowIat),
      flow_iat_max = s.flowIat.maxOr0, flow_iat_min = s.flowIat.minOr0,
      fwd_iat_total = s.fwdIat.sum,
      fwd_iat_mean = meanI(s.fwdIat.sum, s.fwdIat.n), fwd_iat_std = stdI(s.fwdIat),
      fwd_iat_max = s.fwdIat.maxOr0, fwd_iat_min = s.fwdIat.minOr0,
      bwd_iat_total = s.bwdIat.sum,
      bwd_iat_mean = meanI(s.bwdIat.sum, s.bwdIat.n), bwd_iat_std = stdI(s.bwdIat),
      bwd_iat_max = s.bwdIat.maxOr0, bwd_iat_min = s.bwdIat.minOr0,
      fwd_psh_flags = s.fwdPsh, bwd_psh_flags = s.bwdPsh,
      fwd_urg_flags = s.fwdUrg, bwd_urg_flags = s.bwdUrg,
      fwd_header_length = s.fwdHdr, bwd_header_length = s.bwdHdr,
      fwd_packets_s = fdiv(nFwd.toDouble, durS), bwd_packets_s = fdiv(nBwd.toDouble, durS),
      min_packet_length = allLen.minOr0, max_packet_length = allLen.maxOr0,
      packet_length_mean = meanI(fwdBytes + bwdBytes, nAll),
      packet_length_std = if (nAll > 1) math.floor(allStdD).toLong else 0L,
      packet_length_variance = if (nAll > 1) math.floor(allStdD * allStdD).toLong else 0L,
      fin_flag_count = s.fin, syn_flag_count = s.syn, rst_flag_count = s.rst,
      psh_flag_count = s.psh, ack_flag_count = s.ack, urg_flag_count = s.urg,
      cwe_flag_count = s.cwr, ece_flag_count = s.ece,
      down_up_ratio = if (fwdBytes > 0) fdiv(bwdBytes.toDouble, fwdBytes.toDouble) else 0L,
      average_packet_size = meanI(fwdBytes + bwdBytes, nAll),
      avg_fwd_segment_size = meanI(fwdBytes, nFwd),
      avg_bwd_segment_size = meanI(bwdBytes, nBwd),
      fwd_avg_bytes_bulk = if (s.fwdBulkCount > 0) fdiv(s.fwdBulkBytes.toDouble, s.fwdBulkCount.toDouble) else 0L,
      fwd_avg_packets_bulk = if (s.fwdBulkCount > 0) fdiv(s.fwdBulkPkts.toDouble, s.fwdBulkCount.toDouble) else 0L,
      fwd_avg_bulk_rate = fdiv(s.fwdBulkBytes.toDouble, durS),
      bwd_avg_bytes_bulk = if (s.bwdBulkCount > 0) fdiv(s.bwdBulkBytes.toDouble, s.bwdBulkCount.toDouble) else 0L,
      bwd_avg_packets_bulk = if (s.bwdBulkCount > 0) fdiv(s.bwdBulkPkts.toDouble, s.bwdBulkCount.toDouble) else 0L,
      bwd_avg_bulk_rate = fdiv(s.bwdBulkBytes.toDouble, durS),
      subflow_fwd_packets = nFwd, subflow_fwd_bytes = fwdBytes,
      subflow_bwd_packets = nBwd, subflow_bwd_bytes = bwdBytes,
      init_win_bytes_forward = 0L, init_win_bytes_backward = 0L,
      act_data_pkt_fwd = s.actDataFwd, min_seg_size_forward = 0L,
      active_mean = 0L, active_std = 0L, active_max = 0L, active_min = 0L,
      idle_mean = 0L, idle_std = 0L, idle_max = 0L, idle_min = 0L)
  }

  // ---- the streaming operator ----

  /** emitOnUpdate mirrors the reference's per-batch progress rows
    * (main.py:990, filtered out downstream at :1077 — wasteful); the
    * default emits only finalized (_TIMEOUT) rows.
    */
  def updateFlow(timeoutMs: Long, emitOnUpdate: Boolean)(
      key: FlowKey, packets: Iterator[PacketRow],
      state: GroupState[FlowState]): Iterator[FlowFeatures] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(features(_, "_TIMEOUT")).iterator
      state.remove()
      out
    } else {
      val batch = packets.toSeq
      if (batch.isEmpty) Iterator.empty
      else {
        val s = foldBatch(state.getOption, batch)
        state.update(s)
        if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
        if (emitOnUpdate) Iterator.single(features(s, "")) else Iterator.empty
      }
    }
  }

  /** packets (streaming or batch Dataset) → flow-feature stream.
    * timeoutMs = 0 disables session timeouts (NoTimeout) — needed for
    * terminating runs (Trigger.AvailableNow never stops while
    * processing-time timers are pending).
    */
  def featurize(packets: Dataset[PacketRow], timeoutMs: Long = DefaultTimeoutMs,
      emitOnUpdate: Boolean = false): Dataset[FlowFeatures] = {
    import packets.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    packets
      .groupByKey(FlowKey.of)
      .flatMapGroupsWithState[FlowState, FlowFeatures](
        OutputMode.Update, timeoutConf)(
        updateFlow(timeoutMs, emitOnUpdate))
  }

  /** Typed packet stream from a streaming (or batch) events DataFrame. */
  def packetsOf(events: DataFrame): Dataset[PacketRow] = {
    import events.sparkSession.implicits._
    BatchFlowFeaturizer.packetsFromEvents(events).as[PacketRow]
  }

  /** End-to-end streaming run over the events parquet as a file-stream
    * source, collected through a memory sink. One file → one micro-batch
    * → emitted update rows are complete per-flow features, equal to the
    * batch featurizer's output (same oracle, no _TIMEOUT suffix).
    */
  def runFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    val events = graft.Tables.eventsStream(spark, sfDir)
    val sinkName = graft.GraftSession.newSinkName(spark, "flow_stream")
    val q = featurize(packetsOf(events), timeoutMs = 0, emitOnUpdate = true)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName).orderBy("flow_id")
  }

  val qFlowFeaturesStream = Q(
    "q_flow_features_stream",
    (spark, dir) => graft.GraftSession.withStreamingShuffle(spark,
      graft.GraftSession.adaptiveStreamParts(spark, dir)) {
      runFileStream(spark, dir)
    },
    // single-batch update rows == batch featurizer output, sans suffix
    Some(FlowFeatureSql.oracleSql.replace(" || '_TIMEOUT'", ""))
  )

  val all: Seq[Q] = Seq(qFlowFeaturesStream)
}
