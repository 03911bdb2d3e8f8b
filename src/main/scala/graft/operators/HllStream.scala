package graft.operators

import graft.{Q, Tables}
import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** In-stream distinct sources per window — the third classic DDoS
  * screen next to [[MgStream]]'s top talkers and [[QdStream]]'s length
  * quantiles: reflection and carpet-bombing attacks show up as a
  * SOURCE-CARDINALITY explosion (thousands of reflectors each sending
  * a little) that never trips a top-talker or volume threshold.
  * Distinct src_ip per hour window, maintained in-stream with bounded
  * state, completes the in-stream sketch triad.
  *
  * Deployment shape = the [[MgStream]] recipe exactly: the STREAM owns
  * one mergeable DataSketches HLL sketch per (window, salt) in
  * `transformWithState` ValueState — ≤ `O(2^lgK)` bytes per group
  * whatever the source cardinality (lgK = [[LgK]] ⇒ ≤ ~2.5 KiB dense;
  * sparse far smaller) — and the cardinality REPORT is a batch rollup
  * over the final summaries: last emission per group wins (monotone
  * rows-seen stamp), per-window sketches union via Spark's own
  * `hll_union_agg` (the emitted bytes are the standard DataSketches
  * HLL image, so the engine's batch sketch algebra consumes them
  * directly — the same interop `q_hll_sketch_merge` gates for the
  * batch side), and `hll_sketch_estimate` prices each window.
  *
  * Oracle discipline (the `q_approx_distinct_users` house rule): the
  * raw estimate is engine-local, so the EXACT per-window distinct
  * count rides to the oracle as a BIGINT and the estimate rides inside
  * a tolerance boolean, |est − exact| ≤ 10% · exact. At lgK = 12 the
  * HLL rsd is 1.04/√4096 ≈ 1.63%, so 10% ≈ 6σ (two-sided tail ~2·10⁻⁹
  * per window) — and on this corpus the sketches never leave sparse
  * coupon mode (the generator's source domain is structurally ≤ 350
  * addresses — see [[MgStream]] — far under the ~512-coupon sparse
  * ceiling), where the estimate is exact up to the ~5·10⁻⁹-per-pair
  * coupon-collision probability the 10% band absorbs with room to
  * spare. A broken stream still fails hard: no emissions → inner join
  * drops every window → row-count mismatch; a wildly-wrong sketch →
  * boolean flips → hash mismatch.
  *
  * Scale: state is O(OPEN windows × salts × sketch) in RocksDB; the
  * shuffle key is (window, salt) so one hot window fans across
  * [[Salts]] tasks (raise Salts for a 1000-executor deployment — HLL
  * union over disjoint salt partitions is lossless, that is what
  * "mergeable" buys); emission is ONE sketch-sized row per active
  * group per micro-batch, never packet-sized. State LIFETIME is
  * watermark-bounded exactly as in [[MgStream.TopTalkersProcessor]]:
  * under `TimeMode.EventTime` one close timer per group at window end
  * clears the group once the watermark passes, and late rows for a
  * closed window are dropped instead of resurrecting an empty sketch.
  * The catalog query runs THIS EventTime shape (r15 VERDICT task 2 —
  * see [[MgStream]]); under `TimeMode.None` (the durability harness)
  * the guard and arming are no-ops. GC + late-row
  * drop pinned by `StreamStateGcSpec`; restart-from-checkpoint
  * durability by `MgStreamDurabilitySpec` (HLL case).
  */
object HllStream {

  val WinUs: Long = 3600L * 1000000
  val LgK = 12
  val Salts = 2

  case class HsRow(win: Long, salt: Int, k: String)
  case class HsState(sk: Array[Byte], nSeen: Long)
  case class HsEmit(win: Long, salt: Int, sk: Array[Byte], n_seen: Long)

  /** @param winMs window width in ms — the event-time close timer for
    *   group (win, salt) is registered at `(win + 1) * winMs`
    *   (window end on the watermark's ms grid), mirroring
    *   [[MgStream.TopTalkersProcessor]].
    */
  class DistinctSourcesProcessor(lgK: Int, winMs: Long = WinUs / 1000)
      extends WindowedProcessor[HsRow, HsEmit](winMs) {
    @transient private var state: ValueState[HsState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[HsState](
        "hs", Encoders.product[HsState], TTLConfig.NONE)
      trackTimeMode(timeMode)
    }

    override def handleInputRows(key: (Long, Int), rows: Iterator[HsRow],
        timerValues: TimerValues): Iterator[HsEmit] = {
      val (win, salt) = key
      if (windowClosed(key, timerValues)) {
        // watermark already closed this window: drop the late rows,
        // leave state absent (see the WindowedProcessor rationale)
        rows.foreach(_ => ())
        return Iterator.empty
      }
      val (sketch, n0) =
        if (state.exists()) {
          val s = state.get()
          (HllSketch.heapify(s.sk), s.nSeen)
        } else (new HllSketch(lgK), 0L)
      var n = n0
      rows.foreach { r => sketch.update(r.k); n += 1 }
      state.update(HsState(sketch.toUpdatableByteArray, n))
      armCloseTimer(key)
      // compact image out: read-only downstream (union/estimate), and
      // it is the canonical interchange form Spark's hll_* wrap
      Iterator.single(HsEmit(win, salt, sketch.toCompactByteArray, n))
    }

    /** Window closed: free the group. Emits nothing — the last data
      * batch already emitted the final sketch, so the report's
      * max-stamp pick is final before the timer fires.
      */
    override def handleExpiredTimer(key: (Long, Int),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[HsEmit] = {
      state.clear()
      Iterator.empty
    }
  }

  /** Batch cardinality report over the stream's emitted sketches:
    * final emission per (window, salt) group, per-window
    * `hll_union_agg` across salts (disjoint key spaces — the salt is a
    * hash of the value — so the union is lossless), estimate priced
    * against the exact per-window distinct count as a 6σ boolean.
    *
    * Emission idempotence (the [[MgStream.topTalkersReport]] note):
    * n_seen is strictly monotone per (win, salt) under both time modes
    * (EventTime close timers emit nothing), so the max-stamp filter
    * keeps exactly one emission per group; a
    * hypothetical repeated emission at an unchanged stamp is
    * bit-identical (one sketch row per group per batch) and collapsed
    * by the post-filter max(sk) — which clusters on the stamp window's
    * own (win, salt) partitioning, so idempotence costs an
    * in-partition aggregate, not a shuffle.
    */
  private[graft] def distinctSourcesReport(emitted: DataFrame,
      exact: DataFrame): DataFrame = {
    val spark = emitted.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val last = emitted
      .withColumn("mx", max($"n_seen").over(Window.partitionBy($"win", $"salt")))
      .where($"n_seen" === $"mx")
      .groupBy($"win", $"salt").agg(max($"sk").as("sk"))
    val est = last.groupBy($"win")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("hll_est"))
    exact.join(est, Seq("win"))
      .select(
        ($"win" * lit(WinUs)).as("window_start_us"),
        $"n_src_exact",
        (abs($"hll_est" - $"n_src_exact") <= lit(0.10) * $"n_src_exact")
          .as("within_bound"))
      .orderBy("window_start_us")
  }

  /** Per-group state image built with the exact calls
    * [[DistinctSourcesProcessor.handleInputRows]] makes (fresh sketch,
    * update per row, updatable byte array) — the ScaleSmoke gate sizes
    * THIS, i.e. the bytes a (window, salt) group's ValueState would
    * hold after a batch, against the DataSketches published hard
    * ceiling, while cardinality is replicated ×m past the sparse
    * regime.
    */
  private[graft] def stateProbe(rows: org.apache.spark.sql.Dataset[HsRow])
      : DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(r => (r.win, r.salt))
      .mapGroups { (key: (Long, Int), it: Iterator[HsRow]) =>
        val sk = new HllSketch(LgK)
        var n = 0L
        val seen = new java.util.HashSet[String]()
        it.foreach { r => sk.update(r.k); seen.add(r.k); n += 1 }
        (key._1, key._2, sk.toUpdatableByteArray.length, sk.getEstimate.round,
          seen.size.toLong, n)
      }
      .toDF("win", "salt", "state_bytes", "est", "n_exact", "n_rows")
  }

  val qHllDistinctStream = Q(
    "q_hll_distinct_stream",
    (spark, dir) => {
      import spark.implicits._
      val sinkName = graft.GraftSession.newSinkName(spark, "hds")
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
            // salt on the value's own hash: distinct values partition
            // across salt groups, so per-salt sketches cover disjoint
            // sets and the report union is lossless
            .selectExpr(s"ts_us DIV $WinUs AS win",
              s"CAST(pmod(xxhash64(src_ip), $Salts) AS INT) AS salt",
              "src_ip AS k")
            .as[HsRow]
            .groupByKey(r => (r.win, r.salt))
            .transformWithState(new DistinctSourcesProcessor(LgK),
              TimeMode.EventTime(), OutputMode.Update(), Encoders.product[HsEmit])
            .writeStream.outputMode("update")
            .format("memory").queryName(sinkName)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      // exact side exists to FEED the tolerance check (the
      // q_approx_distinct_users discipline) — a batch restatement of
      // the same packets relation
      val exact = graft.flow.BatchFlowFeaturizer
        .packetsFromEvents(Tables.events(spark, dir))
        .selectExpr(s"ts_us DIV $WinUs AS win", "src_ip")
        .groupBy($"win")
        .agg(countDistinct($"src_ip").as("n_src_exact"))
      distinctSourcesReport(spark.table(sinkName), exact)
    },
    Some(s"""
WITH p0 AS (SELECT ${graft.flow.FlowFeatureSql.packetStage0(graft.flow.FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${graft.flow.FlowFeatureSql.packetStage1.mkString(", ")} FROM p0)
SELECT (ts_us // $WinUs) * $WinUs AS window_start_us,
       CAST(count(DISTINCT src_ip) AS BIGINT) AS n_src_exact,
       true AS within_bound
FROM packets
GROUP BY 1
ORDER BY window_start_us"""))

  val all: Seq[Q] = Seq(qHllDistinctStream)
}
