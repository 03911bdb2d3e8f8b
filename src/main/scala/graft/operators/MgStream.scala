package graft.operators

import graft.{Q, Tables}
import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** In-stream top talkers per window — the anti-DDoS screen the
  * mitigation family lacked: entropy/EWMA detect that a DISTRIBUTION
  * shifted, this NAMES the top-k sources driving each window, with
  * bounded state, while the stream is still flowing.
  *
  * Deployment shape (the `q_src_entropy_stream` split): the STREAM owns
  * a Misra–Gries summary per (window, salt) in `transformWithState`
  * ValueState — ≤ [[MgStreamCap]] counters per group, whatever the
  * source cardinality, updated by the exact
  * [[graft.functions.MisraGries.update]] step the batch aggregator
  * runs — and the top-k REPORT is a batch rollup over the maintained
  * summaries ([[topTalkersReport]]): last emission per group wins
  * (emissions carry a monotone rows-seen stamp), groups merge keywise
  * (salting partitions the key space, so the union is disjoint — the
  * degenerate, always-exact case of the PODS-2012 merge), then
  * rank ≤ [[TopK]] per window on (count DESC, ip ASC).
  *
  * Regime: the packet generator's source domain is structurally ≤ 350
  * addresses at ANY scale factor (src_ip is a function of user_id
  * mod 300 / mod 50 — FlowFeatureSql.packetStage0), so with capacity
  * 512 per salt group neither the decrement nor the merge cut ever
  * fires and the summaries are provably EXACT — the oracle is the
  * plain per-window GROUP BY top-k. The above-capacity behavior of the
  * identical update/merge code is pinned by `MisraGriesSpec`/
  * `MisraGriesPropertiesSpec` and driver-checked by `q_mg_est_error`.
  *
  * Scale: state is O(OPEN windows × salts × m) in RocksDB and the
  * shuffle key is (window, salt), so one hot window fans across
  * [[Salts]] tasks instead of one — raise Salts for a 1000-executor
  * deployment and the report's merge is unchanged (that is what
  * "mergeable" buys). Emission is O(m) rows per active group per
  * micro-batch. State LIFETIME is watermark-bounded: under
  * `TimeMode.EventTime` the processor registers one event-time timer
  * per group at window end; when the watermark passes it the group's
  * state is cleared and later (late) rows for that window are ignored
  * rather than resurrecting an empty summary — so a live multi-week
  * stream holds state only for windows the watermark hasn't closed,
  * not for every window ever seen. (The report is immune to the
  * timer by construction: timers emit nothing, and the max-stamp +
  * max(est) collapse already absorbs repeated emissions.) The catalog
  * query runs THIS EventTime shape (r15 VERDICT task 2) — its
  * terminating AvailableNow run fires every closed window's timer in
  * the final watermark batch, so the oracle gates the deployed
  * lifecycle, not a timerless twin. Under `TimeMode.None` (the
  * durability harness) the guard and arming are no-ops — no watermark
  * exists to bound anything. GC + late-row drop pinned by
  * `StreamStateGcSpec` (reads the state store to assert the closed
  * window's key is GONE); restart-from-checkpoint durability:
  * `MgStreamDurabilitySpec`.
  */
object MgStream {

  val WinUs: Long = 3600L * 1000000
  val MgStreamCap = 512
  val Salts = 2
  val TopK = 5

  case class MgRow(win: Long, salt: Int, k: String)
  case class MgGroupState(keys: Array[String], counts: Array[Long], nSeen: Long)
  case class MgEmit(win: Long, salt: Int, k: String, est: Long, n_seen: Long)

  /** @param winMs window width in ms — the event-time close timer for
    *   group (win, salt) is registered at `(win + 1) * winMs`, i.e.
    *   window end on the watermark's ms grid.
    */
  class TopTalkersProcessor(cap: Int, winMs: Long = WinUs / 1000)
      extends WindowedProcessor[MgRow, MgEmit](winMs) {
    @transient private var state: ValueState[MgGroupState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[MgGroupState](
        "mg", Encoders.product[MgGroupState], TTLConfig.NONE)
      trackTimeMode(timeMode)
    }

    override def handleInputRows(key: (Long, Int), rows: Iterator[MgRow],
        timerValues: TimerValues): Iterator[MgEmit] = {
      val (win, salt) = key
      if (windowClosed(key, timerValues)) {
        // watermark already closed this window (its timer fired and
        // cleared state, or will this batch): a late row must not
        // resurrect an empty summary that the stamp filter would
        // ignore anyway — drop it, leave state absent
        rows.foreach(_ => ())
        return Iterator.empty
      }
      val prior =
        if (state.exists()) state.get()
        else MgGroupState(Array.empty, Array.empty, 0L)
      var summary = MisraGries.Summary(prior.keys, prior.counts)
      var n = prior.nSeen
      rows.foreach { r =>
        summary = MisraGries.update(summary, r.k, cap)
        n += 1
      }
      state.update(MgGroupState(summary.keys, summary.counts, n))
      armCloseTimer(key)
      val out = new Array[MgEmit](summary.keys.length)
      var i = 0
      while (i < out.length) {
        out(i) = MgEmit(win, salt, summary.keys(i), summary.counts(i), n)
        i += 1
      }
      out.iterator
    }

    /** Window closed: free the group. Emits nothing — the last data
      * batch already emitted the final summary (every input row is
      * followed by an emission, and rows past the watermark never
      * reach the summary), so the report's max-stamp pick is already
      * final before the timer can fire.
      */
    override def handleExpiredTimer(key: (Long, Int),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[MgEmit] = {
      state.clear()
      Iterator.empty
    }
  }

  /** Batch top-k report over the stream's emitted summaries. Each
    * micro-batch re-emits a group's full summary stamped with its
    * monotone rows-seen count, so "the final summary" is exactly the
    * rows carrying the group's max stamp — batch-split independent.
    *
    * Emission idempotence: the max-stamp filter relies on n_seen being
    * STRICTLY monotone per (win, salt), which [[TopTalkersProcessor]]
    * guarantees under BOTH time modes (handleInputRows only fires with
    * data, every input row bumps the stamp, and EventTime close timers
    * emit nothing). Should a future
    * timer-driven emission ever re-emit a summary at an unchanged
    * stamp, those rows are bit-identical to the first emission (a
    * summary's keys are unique, so one emission never carries
    * duplicate rows) — the max(est) collapse below absorbs them
    * instead of letting the keywise sum double-count. It runs AFTER
    * the stamp filter and clusters on (win, salt, ·), so it reuses the
    * window's (win, salt) exchange — idempotence costs an in-partition
    * aggregate, not a shuffle (a pre-filter dropDuplicates measured
    * ~0.6 s of extra exchange on this query at sf0.1).
    */
  private[graft] def topTalkersReport(emitted: DataFrame,
      topK: Int = TopK): DataFrame = {
    val spark = emitted.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val last = emitted
      .withColumn("mx", max($"n_seen").over(Window.partitionBy($"win", $"salt")))
      .where($"n_seen" === $"mx")
      .groupBy($"win", $"salt", $"k").agg(max($"est").as("est"))
    last.groupBy($"win", $"k")
      .agg(sum($"est").cast("bigint").as("mg_count")) // disjoint-key union
      .withColumn("rk", row_number().over(
        Window.partitionBy($"win").orderBy($"mg_count".desc, $"k")))
      .where($"rk" <= topK)
      .selectExpr(s"win * $WinUs AS window_start_us", "k AS src_ip",
        "mg_count", "CAST(rk AS BIGINT) AS rk")
      .orderBy("window_start_us", "rk")
  }

  val qMgHeavyHittersStream = Q(
    "q_mg_heavy_hitters_stream",
    (spark, dir) => {
      import spark.implicits._
      val sinkName = graft.GraftSession.newSinkName(spark, "mghh")
      StatefulTotals.withRocksDb(spark) {
        // DEPLOYED shape (r15 VERDICT task 2): EventTime + watermark,
        // so the catalog gates the same timer/GC lifecycle a live
        // deployment runs — the close timers fire in the terminating
        // watermark batch (the no-data batch MUST stay, the left-join
        // rule) and clear every closed window's state. Emissions all
        // happen in DATA batches (timers emit nothing), so the
        // max-stamp report — and therefore the oracle — is unchanged
        // from the TimeMode.None spelling: no watermark horizon
        // applies to the output, only to state lifetime.
        graft.GraftSession.withStreamingShuffle(spark,
            graft.GraftSession.adaptiveStreamParts(spark, dir)) {
          val q = graft.flow.BatchFlowFeaturizer
            .packetsFromEvents(Tables.eventsStream(spark, dir))
            .withColumn("pt", timestamp_micros($"ts_us"))
            .withWatermark("pt", "10 minutes")
            .selectExpr(s"ts_us DIV $WinUs AS win",
              s"CAST(pmod(xxhash64(src_ip), $Salts) AS INT) AS salt",
              "src_ip AS k")
            .as[MgRow]
            .groupByKey(r => (r.win, r.salt))
            .transformWithState(new TopTalkersProcessor(MgStreamCap),
              TimeMode.EventTime(), OutputMode.Update(), Encoders.product[MgEmit])
            .writeStream.outputMode("update")
            .format("memory").queryName(sinkName)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      topTalkersReport(spark.table(sinkName))
    },
    Some(s"""
WITH p0 AS (SELECT ${graft.flow.FlowFeatureSql.packetStage0(graft.flow.FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${graft.flow.FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
per AS (SELECT ts_us // $WinUs AS win, src_ip, CAST(count(*) AS BIGINT) AS cnt
        FROM packets GROUP BY 1, 2),
r AS (SELECT win, src_ip, cnt,
             row_number() OVER (PARTITION BY win ORDER BY cnt DESC, src_ip) AS rk
      FROM per)
SELECT win * $WinUs AS window_start_us, src_ip, cnt AS mg_count,
       CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= $TopK
ORDER BY window_start_us, rk"""))

  val all: Seq[Q] = Seq(qMgHeavyHittersStream)
}
