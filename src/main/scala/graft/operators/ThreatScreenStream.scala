package graft.operators

import graft.{Q, Tables}
import graft.functions.{MisraGries, QDigest}
import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** The LIVE threat screen — [[ThreatScreen]]'s verdicts produced while
  * the stream is flowing, with the full streaming lifecycle the triad
  * queries demonstrate piecewise, composed into ONE operator:
  *
  *  - ONE `transformWithState` pass holds all three sketches per
  *    (window, salt) group in a single ValueState — the Misra–Gries
  *    talker summary, the q-digest length histogram, and the HLL
  *    source sketch — so the stream is read once and the state store
  *    is opened once, not three times;
  *  - emission is FINAL-ON-CLOSE: data batches only update state; the
  *    event-time close timer (window end + watermark) emits the
  *    group's finished summary exactly once and clears the state —
  *    the push model a paging/alerting consumer wants, in contrast to
  *    the triad queries' emit-per-batch + last-wins report;
  *  - the batch report runs [[ThreatScreen.screenFromCounts]] VERBATIM
  *    over the emitted summaries (in the exact regime the MG entries
  *    ARE the per-source counts and the q-digest leaves ARE the length
  *    histogram), so the live screen provably computes the batch
  *    screen's verdicts — same trailing baseline, same integer
  *    arithmetic — plus an HLL-vs-exact tolerance boolean
  *    (`hll_within`, the `q_approx_distinct_users` discipline; beyond
  *    the exact regime HLL is what survives, MG keeps the top end).
  *
  * Oracle horizon (the `q_stream_stream_left_join` precedent): a
  * window's verdict emits only when the final watermark
  * (max event time − 10 min, on Spark's ms grid) passes its close —
  * windows still open at end-of-stream are CORRECTLY absent, and the
  * oracle states exactly that horizon. Because closed windows form a
  * PREFIX of the window sequence, the trailing baseline over emitted
  * windows equals the batch baseline restricted to the horizon —
  * filter-then-window and window-then-filter agree.
  *
  * Scale: state is O(open windows × salts × (m + nodes + 2^lgK)) —
  * each component individually hard-bounded (MG cap, q-digest
  * compress trigger, the DataSketches image ceiling ScaleSmoke gates)
  * and the lifetime watermark-bounded by the close timers. Emission
  * is ONE summary row per group per WINDOW (not per batch). The
  * report is window-sized. Raise [[Salts]] on a wide cluster; the
  * merges (disjoint-key MG union, keywise leaf sum, HLL union) are
  * lossless under salting by construction.
  */
object ThreatScreenStream {

  val WinUs: Long = ThreatScreen.WinUs
  val WmUs: Long = 600L * 1000000
  val Salts = 2
  val MgCap = 512
  val QdCap = 4096
  val LgK = 12

  case class SRow(win: Long, salt: Int, src: String, len: Long)
  // hitCap: latched true the first time the MG update takes the
  // global-decrement branch for this (win, salt) group. The FINAL
  // summary size cannot stand in for it — subtractCompact drops
  // zero-count keys, so a degraded summary usually closes UNDER
  // MgCap, and a summary with exactly MgCap distinct sources and no
  // eviction is still exact (r16 ADVICE).
  case class ScreenState(
      mgKeys: Array[String], mgCounts: Array[Long],
      qdIds: Array[Long], qdCounts: Array[Long], qdW: Long,
      hll: Array[Byte], nSeen: Long, hitCap: Boolean)
  case class ScreenEmit(
      win: Long, salt: Int,
      srcs: Array[String], srcCnts: Array[Long],
      lenVals: Array[Long], lenCnts: Array[Long],
      hll: Array[Byte], n: Long, hitCap: Boolean)

  /** @param winMs window width in ms — close timer at `(win+1)*winMs`,
    *   the [[MgStream.TopTalkersProcessor]] grid. This processor is
    *   EventTime-only by design: final-on-close emission has no
    *   TimeMode.None spelling (nothing would ever emit).
    */
  class ScreenProcessor(mgCap: Int, qdCap: Int, lgK: Int,
      winMs: Long = WinUs / 1000)
      extends WindowedProcessor[SRow, ScreenEmit](winMs) {
    @transient private var state: ValueState[ScreenState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      require(timeMode == TimeMode.EventTime(),
        "ScreenProcessor emits on close timers — EventTime only")
      state = getHandle.getValueState[ScreenState](
        "scr", Encoders.product[ScreenState], TTLConfig.NONE)
      trackTimeMode(timeMode)
    }

    override def handleInputRows(key: (Long, Int), rows: Iterator[SRow],
        timerValues: TimerValues): Iterator[ScreenEmit] = {
      if (windowClosed(key, timerValues)) {
        // late rows for a window whose final summary already emitted:
        // a second (partial) emission would double-report the window —
        // drop them, the triad processors' guard
        rows.foreach(_ => ())
        return Iterator.empty
      }
      val prior =
        if (state.exists()) state.get()
        else ScreenState(Array.empty, Array.empty, Array.empty, Array.empty,
          0L, new HllSketch(lgK).toUpdatableByteArray, 0L, hitCap = false)
      var mg = MisraGries.Summary(prior.mgKeys, prior.mgCounts)
      var qd = QDigest.Digest(prior.qdIds, prior.qdCounts, prior.qdW)
      val hll = HllSketch.heapify(prior.hll)
      var n = prior.nSeen
      var hitCap = prior.hitCap
      rows.foreach { r =>
        val (nmg, hit) = MisraGries.updateTracked(mg, r.src, mgCap)
        mg = nmg
        hitCap ||= hit
        qd = QDigest.update(qd, r.len, qdCap)
        hll.update(r.src)
        n += 1
      }
      // compress the digest before persisting so the ValueState image
      // honors the ≤ sizeBound(k) node bound, not update()'s larger
      // 6k+64 amortization buffer (the QdStream rationale — a no-op in
      // the exact regime)
      qd = QDigest.compress(qd, qdCap)
      state.update(ScreenState(mg.keys, mg.counts, qd.ids, qd.counts, qd.n,
        hll.toUpdatableByteArray, n, hitCap))
      armCloseTimer(key)
      Iterator.empty // final-on-close: data batches emit nothing
    }

    /** Window closed: emit the finished summary ONCE, free the group. */
    override def handleExpiredTimer(key: (Long, Int),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ScreenEmit] = {
      if (!state.exists()) return Iterator.empty
      val s = state.get()
      state.clear()
      // decode q-digest ids to length values (exact regime: leaves;
      // above capacity an internal node reports its max value — the
      // QdStream convention)
      val vals = new Array[Long](s.qdIds.length)
      var i = 0
      while (i < vals.length) {
        val id = s.qdIds(i)
        val lvl = 63 - java.lang.Long.numberOfLeadingZeros(id)
        val width = QDigest.Universe >> lvl
        vals(i) = (id - (1L << lvl)) * width + width - 1
        i += 1
      }
      Iterator.single(ScreenEmit(key._1, key._2, s.mgKeys, s.mgCounts,
        vals, s.qdCounts, HllSketch.heapify(s.hll).toCompactByteArray, s.nSeen,
        s.hitCap))
    }
  }

  /** Batch verdict report over the timer-emitted summaries: salt-merge
    * each component (disjoint-key MG union, keywise leaf sum), run the
    * SHARED [[ThreatScreen.screenFromCounts]] verdict logic, and price
    * the HLL estimate against the MG-exact source count as a 6σ
    * boolean. Timer emission is exactly-once per group by construction
    * (the emit clears the state it read), so no stamp filter is
    * needed; a replayed batch re-emits bit-identical rows which the
    * keywise sums would double — `dropDuplicates` on the group key
    * guards the report against exactly that replay.
    */
  private[graft] def screenReport(emitted: DataFrame): DataFrame = {
    val spark = emitted.sparkSession
    import spark.implicits._
    val uniq = emitted.dropDuplicates("win", "salt")
    // every branch re-aliases `win` (fresh expression ids): all three
    // descend from the same `uniq` lineage, and the joins inside
    // screenFromCounts plus the est join below would otherwise see the
    // SAME `win` attribute on both sides ("Conflicting attributes")
    val perSrc = uniq
      .select($"win", explode(arrays_zip($"srcs", $"srcCnts")).as("z"))
      .select($"win".as("win"), $"z.srcs".as("src_ip"), $"z.srcCnts".as("cnt"))
      .groupBy($"win", $"src_ip").agg(sum($"cnt").cast("bigint").as("cnt"))
    val hist = uniq
      .select($"win", explode(arrays_zip($"lenVals", $"lenCnts")).as("z"))
      .select($"win".as("win"), $"z.lenVals".as("length"), $"z.lenCnts".as("cnt"))
      .groupBy($"win", $"length").agg(sum($"cnt").cast("bigint").as("cnt"))
    // fresh aliases (new expression ids) — est's lineage shares `win`
    // with both screenFromCounts inputs, and the final join would
    // otherwise carry the same attribute on both sides
    val est = uniq.select($"win".as("est_win"), $"hll".as("est_hll"),
        $"hitCap".as("est_hit"))
      .groupBy($"est_win")
      .agg(hll_sketch_estimate(hll_union_agg($"est_hll")).as("hll_est"),
        max($"est_hit".cast("int")).as("hit_any"))
      .select(($"est_win" * lit(WinUs)).as("est_ws"), $"hll_est", $"hit_any")
    ThreatScreen.screenFromCounts(perSrc, hist)
      .join(est, $"window_start_us" === $"est_ws")
      // hll_within prices the estimate against n_src, which is the
      // MG-retained key count — EXACT only while no (win, salt) summary
      // ever hit capacity (no decrement fired, so every source is
      // retained). The screen's regime note assumed that; now it is
      // ENFORCED on the latched per-group `hitCap` flag (r16 ADVICE):
      // the final summary SIZE can't stand in for it — the global
      // decrement drops zero-count keys, so a degraded summary usually
      // closes under MgCap, and a summary holding exactly MgCap
      // distinct sources with no eviction is still exact. A group
      // whose update ever took the decrement branch means n_src may
      // undercount the true distinct count, and the 10% band would
      // silently measure drift against a degraded baseline — fail
      // loudly instead of emitting an opaque boolean. (Beyond the
      // exact regime the right spelling is the q_hll_distinct_stream
      // one: carry an exact side out-of-band.)
      .withColumn("hll_within",
        when($"hit_any" === lit(1), raise_error(concat(
          lit(s"MG summary hit capacity $MgCap for window start "),
          $"window_start_us".cast("string"),
          lit(" — n_src is no longer the exact distinct-source count; " +
            "raise MgCap or carry an exact side like q_hll_distinct_stream"))))
          .otherwise(abs($"hll_est" - $"n_src") <= lit(0.10) * $"n_src"))
      .drop("hll_est", "est_ws", "hit_any")
      .orderBy("window_start_us")
  }

  val qThreatScreenStream = Q(
    "q_threat_screen_stream",
    (spark, dir) => {
      import spark.implicits._
      val sinkName = graft.GraftSession.newSinkName(spark, "tscr")
      StatefulTotals.withRocksDb(spark) {
        // the close timers fire in the terminating watermark batch —
        // the no-data batch MUST stay (the left-join rule)
        graft.GraftSession.withStreamingShuffle(spark,
            graft.GraftSession.adaptiveStreamParts(spark, dir)) {
          val q = graft.flow.BatchFlowFeaturizer
            .packetsFromEvents(Tables.eventsStream(spark, dir))
            .withColumn("pt", timestamp_micros($"ts_us"))
            .withWatermark("pt", "10 minutes")
            .selectExpr(s"ts_us DIV $WinUs AS win",
              s"CAST(pmod(xxhash64(src_ip), $Salts) AS INT) AS salt",
              "src_ip AS src", "length AS len")
            .as[SRow]
            .groupByKey(r => (r.win, r.salt))
            .transformWithState(new ScreenProcessor(MgCap, QdCap, LgK),
              TimeMode.EventTime(), OutputMode.Update(),
              Encoders.product[ScreenEmit])
            .writeStream.outputMode("update")
            .format("memory").queryName(sinkName)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      screenReport(spark.table(sinkName))
    },
    // the verdict chain is ThreatScreen.verdictSql VERBATIM (the SQL
    // counterpart of sharing screenFromCounts) — this oracle adds only
    // the watermark horizon and the degenerate hll_within column
    Some(s"""
WITH p0 AS (SELECT ${graft.flow.FlowFeatureSql.packetStage0(graft.flow.FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${graft.flow.FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
pk AS (SELECT ts_us // ${ThreatScreen.WinUs} AS win, src_ip, length FROM packets),
wm AS (SELECT max(ts_us) // 1000 - ${WmUs / 1000} AS wm_ms FROM packets),${
      ThreatScreen.verdictSql(
        extraCols = ",\n       true AS hll_within",
        where = s"WHERE (win + 1) * ${WinUs / 1000} <= (SELECT wm_ms FROM wm)")}"""))

  val all: Seq[Q] = Seq(qThreatScreenStream)
}
