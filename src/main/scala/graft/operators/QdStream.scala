package graft.operators

import graft.{Q, Tables}
import graft.functions.QDigest
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** In-stream packet-size quantiles per window — the distribution-shape
  * screen next to [[MgStream]]'s top talkers: amplification and
  * flood attacks shift the packet-LENGTH distribution (fixed-size
  * floods collapse it, amplification fattens the tail) long before any
  * single source tops the talker list. p50/p99 length per hour window,
  * maintained in-stream with bounded state.
  *
  * Deployment shape = the [[MgStream]] recipe exactly: the STREAM owns
  * one [[graft.functions.QDigest]] summary per (window, salt) in
  * `transformWithState` ValueState — bounded at [[QDigest.update]]'s
  * compress trigger of 6k+64 buffer slots per group whatever the
  * window's packet count (once compression fires the summary shrinks
  * to ≤ 4k nodes; in the exact t = 0 regime compress is a no-op and
  * state is value-DOMAIN-sized, ~1.2k leaf ids here — far under the
  * trigger either way), updated by the same
  * [[QDigest.update]] step the batch aggregator runs — and the
  * quantile REPORT is a batch rollup over the final summaries: last
  * emission per group wins (monotone rows-seen stamp), leaf histograms
  * merge by keywise sum, the per-window rank rule picks p50/p99.
  *
  * Regime: packet length is 40 + ⌊value·20⌋ (FlowFeatureSql
  * packetStage0) — a ~1.2k-point domain — and per-(window, salt)
  * weight stays far under [[QdStreamCap]] = 4096 at every probed SF
  * (≈ 1.4k packets per FULL window even at sf1, then split by salt),
  * so t = 0, nothing compresses, summaries are provably EXACT leaf
  * histograms and the oracle is the textbook per-window discrete
  * quantile. Above capacity the identical update/merge code degrades
  * under the bound `q_qdigest_est_error` audits.
  *
  * Scale: state is O(OPEN windows × salts × nodes) in RocksDB; the
  * shuffle key is (window, salt) so hot windows fan across [[QdSalts]]
  * tasks; the report is histogram-sized (windows × length domain),
  * never packet-sized. State LIFETIME is watermark-bounded exactly as
  * in [[MgStream.TopTalkersProcessor]]: under `TimeMode.EventTime` one
  * close timer per group at window end clears the group once the
  * watermark passes, and late rows for a closed window are dropped
  * instead of resurrecting an empty digest — a live multi-week stream
  * holds state only for open windows. The catalog query runs THIS
  * EventTime shape (r15 VERDICT task 2 — see [[MgStream]]); under
  * `TimeMode.None` (the durability harness) the guard and arming are
  * no-ops. GC + late-row drop pinned by
  * `StreamStateGcSpec` (reads the state store); restart durability:
  * `MgStreamDurabilitySpec` (same ValueState product-array shape,
  * pinned there for the digest too).
  */
object QdStream {

  val WinUs: Long = 3600L * 1000000
  val QdStreamCap = 4096
  val QdSalts = 2

  case class QdRow(win: Long, salt: Int, v: Long)
  case class QdGroupState(ids: Array[Long], counts: Array[Long], w: Long,
      nSeen: Long)
  case class QdEmit(win: Long, salt: Int, v: Long, cnt: Long, n_seen: Long)

  /** @param winMs window width in ms — the event-time close timer for
    *   group (win, salt) is registered at `(win + 1) * winMs`
    *   (window end on the watermark's ms grid), mirroring
    *   [[MgStream.TopTalkersProcessor]].
    */
  class WindowQuantileProcessor(cap: Int, winMs: Long = WinUs / 1000)
      extends WindowedProcessor[QdRow, QdEmit](winMs) {
    @transient private var state: ValueState[QdGroupState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[QdGroupState](
        "qd", Encoders.product[QdGroupState], TTLConfig.NONE)
      trackTimeMode(timeMode)
    }

    override def handleInputRows(key: (Long, Int), rows: Iterator[QdRow],
        timerValues: TimerValues): Iterator[QdEmit] = {
      if (windowClosed(key, timerValues)) {
        // watermark already closed this window: drop the late rows,
        // leave state absent (see the WindowedProcessor rationale)
        rows.foreach(_ => ())
        return Iterator.empty
      }
      val prior =
        if (state.exists()) state.get()
        else QdGroupState(Array.empty, Array.empty, 0L, 0L)
      var digest = QDigest.Digest(prior.ids, prior.counts, prior.w)
      var n = prior.nSeen
      rows.foreach { r =>
        digest = QDigest.update(digest, r.v, cap)
        n += 1
      }
      // Compress BEFORE persisting (r15 VERDICT task 6): update()'s
      // amortization window lets the working buffer grow to 6k+64
      // slots between compressions, and persisting that interim buffer
      // made the ValueState bound "≤ the compress trigger" instead of
      // the scaladoc's ≤ sizeBound(k) = 4k nodes. One compress per
      // batch pins the PERSISTED image to the hard bound (a no-op in
      // the exact t = 0 regime, where the buffer is value-domain-sized
      // and already ≤ weight < k); the ScaleSmoke qdst gate measures
      // this against sizeBound while weight is replicated far past k.
      digest = QDigest.compress(digest, cap)
      state.update(QdGroupState(digest.ids, digest.counts, digest.n, n))
      armCloseTimer(key)
      val (win, salt) = key
      // exact regime: ids are leaves (Universe + v); emit the value
      // back out of the leaf id — above capacity an internal node
      // reports its max value, the q-digest answer convention
      val out = new Array[QdEmit](digest.ids.length)
      var i = 0
      while (i < out.length) {
        val id = digest.ids(i)
        val lvl = 63 - java.lang.Long.numberOfLeadingZeros(id)
        val width = QDigest.Universe >> lvl
        val lo = (id - (1L << lvl)) * width
        out(i) = QdEmit(win, salt, lo + width - 1, digest.counts(i), n)
        i += 1
      }
      out.iterator
    }

    /** Window closed: free the group. Emits nothing — the last data
      * batch already emitted the final histogram, so the report's
      * max-stamp pick is final before the timer fires.
      */
    override def handleExpiredTimer(key: (Long, Int),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[QdEmit] = {
      state.clear()
      Iterator.empty
    }
  }

  /** Batch rollup over the stream's emitted summaries: final emission
    * per (window, salt) group, keywise histogram merge, per-window
    * rank rule at 50% and 99%.
    *
    * Emission idempotence (the [[MgStream.topTalkersReport]] note):
    * n_seen is strictly monotone per (win, salt) under both time modes
    * — every emission follows at least one input row, and EventTime
    * close timers emit nothing — so the max-stamp filter is sound; and because exact-regime summaries are leaf
    * histograms (one row per distinct value), a hypothetical repeated
    * emission at an unchanged stamp is bit-identical and collapsed by
    * the post-filter max(cnt) per (win, salt, v) rather than
    * double-counted by the sum. That collapse clusters on the stamp
    * window's own (win, salt) partitioning — idempotence without an
    * extra shuffle (the [[MgStream]] measurement).
    */
  private[graft] def windowQuantileReport(emitted: DataFrame): DataFrame = {
    val spark = emitted.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val last = emitted
      .withColumn("mx", max($"n_seen").over(Window.partitionBy($"win", $"salt")))
      .where($"n_seen" === $"mx")
      .groupBy($"win", $"salt", $"v").agg(max($"cnt").as("cnt"))
    val hist = last.groupBy($"win", $"v")
      .agg(sum($"cnt").cast("bigint").as("cnt"))
    val cum = hist
      .withColumn("cum", sum($"cnt").over(
        Window.partitionBy($"win").orderBy($"v")))
      .withColumn("n_w", sum($"cnt").over(Window.partitionBy($"win")))
    cum.groupBy($"win")
      .agg(max($"n_w").as("n_w"),
        min(when($"cum" >= expr("(5000 * n_w + 9999) DIV 10000"), $"v"))
          .as("p50_len"),
        min(when($"cum" >= expr("(9900 * n_w + 9999) DIV 10000"), $"v"))
          .as("p99_len"))
      .selectExpr(s"win * $WinUs AS window_start_us", "n_w", "p50_len",
        "p99_len")
      .orderBy("window_start_us")
  }

  /** Per-group PERSISTED-state image built with the exact calls
    * [[WindowQuantileProcessor.handleInputRows]] makes — update per
    * row, then the one pre-persist compress — so the ScaleSmoke gate
    * sizes the arrays a (window, salt) group's ValueState would
    * actually hold after a batch, against [[QDigest.sizeBound]], while
    * weight is replicated ×m past the exact regime (the
    * [[HllStream.stateProbe]] pattern).
    */
  private[graft] def stateProbe(rows: org.apache.spark.sql.Dataset[QdRow],
      cap: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(r => (r.win, r.salt))
      .mapGroups { (key: (Long, Int), it: Iterator[QdRow]) =>
        var d = QDigest.Digest(Array.empty, Array.empty, 0L)
        var n = 0L
        it.foreach { r => d = QDigest.update(d, r.v, cap); n += 1 }
        d = QDigest.compress(d, cap)
        (key._1, key._2, d.ids.length, d.n, n)
      }
      .toDF("win", "salt", "state_nodes", "weight", "n_rows")
  }

  val qQdigestStream = Q(
    "q_qdigest_stream",
    (spark, dir) => {
      import spark.implicits._
      val sinkName = graft.GraftSession.newSinkName(spark, "qds")
      StatefulTotals.withRocksDb(spark) {
        // DEPLOYED shape (r15 VERDICT task 2): EventTime + watermark —
        // the [[MgStream]] rationale verbatim. Timers emit nothing, so
        // the report and oracle are unchanged; only state LIFETIME is
        // affected (closed windows are GC'd in the terminating batch).
        graft.GraftSession.withStreamingShuffle(spark,
            graft.GraftSession.adaptiveStreamParts(spark, dir)) {
          val q = graft.flow.BatchFlowFeaturizer
            .packetsFromEvents(Tables.eventsStream(spark, dir))
            .withColumn("pt", timestamp_micros($"ts_us"))
            .withWatermark("pt", "10 minutes")
            // salt on the SOURCE, not the value: a fixed-size flood
            // (every packet the same length) still spreads across
            // groups, and exact-regime leaf histograms merge by plain
            // keywise sum whether or not salt groups share values
            .selectExpr(s"ts_us DIV $WinUs AS win",
              s"CAST(pmod(xxhash64(src_ip), $QdSalts) AS INT) AS salt",
              "length AS v")
            .as[QdRow]
            .groupByKey(r => (r.win, r.salt))
            .transformWithState(new WindowQuantileProcessor(QdStreamCap),
              TimeMode.EventTime(), OutputMode.Update(), Encoders.product[QdEmit])
            .writeStream.outputMode("update")
            .format("memory").queryName(sinkName)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      windowQuantileReport(spark.table(sinkName))
    },
    Some(s"""
WITH p0 AS (SELECT ${graft.flow.FlowFeatureSql.packetStage0(graft.flow.FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${graft.flow.FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
w AS (SELECT ts_us // $WinUs AS win, length AS v FROM packets),
t AS (SELECT win, CAST(count(*) AS BIGINT) AS n_w FROM w GROUP BY win),
h AS (SELECT win, v, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY win, v),
r AS (SELECT win, v, CAST(sum(cnt) OVER (PARTITION BY win ORDER BY v) AS BIGINT) AS cum
      FROM h)
SELECT t.win * $WinUs AS window_start_us, t.n_w,
       (SELECT min(v) FROM r WHERE r.win = t.win
          AND cum >= (5000 * t.n_w + 9999) // 10000) AS p50_len,
       (SELECT min(v) FROM r WHERE r.win = t.win
          AND cum >= (9900 * t.n_w + 9999) // 10000) AS p99_len
FROM t
ORDER BY window_start_us"""))

  val all: Seq[Q] = Seq(qQdigestStream)
}
