package graft.operators

import graft.{Q, Tables}
import graft.flow.{BatchFlowFeaturizer, FlowFeatureSql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection (Page 1954) — the sequential-analysis
  * member of the control-chart family (`q_ewma_burst` decays history,
  * `q_seasonal_anomaly` conditions on hour-of-day; CUSUM ACCUMULATES
  * persistent excess): per /16 source prefix, the one-sided cumulative
  * sum `S_h = max(0, S_{h-1} + cnt_h − k)` over DENSE calendar hours,
  * alerting when `S` exceeds a threshold. A slow-and-low flood that
  * never trips a single-hour ratio cut (the flattening the EWMA
  * scaladoc documents: max hourly ratio 2.47× at sf0.1) still drives
  * `S` up hour after hour — accumulation is exactly what volumetric
  * per-hour screens can't do.
  *
  * Self-normalizing, exact-integer restatement: the drift is
  * `k = (DriftNum/DriftDen) · (T/H)` — the prefix's OWN span-mean
  * hourly rate, inflated so in-control traffic drains the statistic —
  * and every quantity is scaled by `DriftDen·H` onto BIGINTs
  * (`S' = DriftDen·H·S`), with the alert cut cross-multiplied
  * (`S'·ThrDen ≥ ThrNum·DriftDen·T` ⟺ `S ≥ (ThrNum/ThrDen)·(T/H)`,
  * a threshold in units of mean-hour traffic). No float anywhere, so
  * the oracle hash-gates the whole trajectory (same reasoning as
  * `q_ewma_burst`). Estimating `T/H` from the full series makes this
  * the RETROSPECTIVE screen (like `q_seasonal_anomaly`, which judges a
  * day against later days too); the streaming variant inherits the
  * same semantics because its batch pass runs over the stream's FINAL
  * counter table.
  *
  * Shape at scale — the sparse gap-analytic form: the recursion looks
  * inherently dense (every calendar hour, traffic or not, drains `S`
  * by `k`), but it collapses to the closed form
  * `S_i = P_i − min_{0≤j≤i} P_j` over the prefix sums
  * `P_j = Σ_{t≤j}(x_t − k)`, and `P` DECREASES LINEARLY across a
  * zero-traffic gap — so the minimum over a gap is attained at the
  * gap's last hour, computable from the PREVIOUS present hour's
  * cumulative count alone. The whole dense trajectory therefore
  * reduces to two candidates per PRESENT hour
  * (`P'_i` and the preceding-gap floor `G'_i`, with `lag(cum,1,0)`
  * supplying the empty-prefix `P_0 = 0`), one running `min`, one
  * subtraction: O(present hours) work, ONE shuffle on `pfx` shared by
  * every window pass, no dense spine, no explode — unlike
  * `q_ts_pattern_match`, no span clamp is needed because compute never
  * touches absent hours. Rides the SAME cached (pfx, h, cnt) reduction
  * as the rest of the control-chart family, so the packet stream still
  * reduces once. Overflow headroom: terms are ≤ DriftDen·H·T ≈
  * 4·10⁵·10¹² at a 100 TB-year — within BIGINT by >10×.
  *
  * Catalog constants, probed the `q_ewma_burst` way (r12 discipline:
  * thresholds must be non-vacuous at EVERY probed SF because the
  * corpus' relative bursts flatten with scale — a DuckDB grid sweep
  * over (drift, threshold) at sf0.001/0.01/0.1 and the ×10
  * key-shifted sf1 replica): drift 21/20 of span-mean, alert at ONE
  * mean-hour of accumulated excess, [[MinHist]] = 3 present hours of
  * warmup. The drift sits close to 1 deliberately: the retrospective
  * span-mean already CONTAINS the attack mass (self-masking — a 5/4
  * drift that looks natural in the textbook's known-mean setting is
  * vacuous here at sf0.1/sf1, measured 0 alerts), and at 21/20 the
  * alert counts land 834 / 1982 / 322 / 55 across the four probed
  * SFs — non-vacuous everywhere, still selective.
  */
object Cusum {

  val DriftNum: Long = 21L
  val DriftDen: Long = 20L
  val ThrNum: Long = 1L
  val ThrDen: Long = 1L
  val MinHist: Long = 3L

  /** The full scaled CUSUM trajectory at PRESENT hours — one row per
    * (pfx, h) of the input with `cusum_scaled = DriftDen·span_h·S_h`
    * (exact BIGINT; `S` in packet units is
    * `cusum_scaled / (driftDen·span_h)`). Unfiltered: the spec gates
    * this relation hour-for-hour against the dense
    * `S' = max(0, S' + driftDen·H·x − driftNum·T)` recursion.
    */
  private[graft] def trajectoryFromCounts(ph: DataFrame,
      driftNum: Long = DriftNum, driftDen: Long = DriftDen): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    require(driftNum > 0 && driftDen > 0,
      s"drift rate must be positive: $driftNum/$driftDen")
    val wp = Window.partitionBy($"pfx") // whole-partition frame (no order)
    val wo = Window.partitionBy($"pfx").orderBy($"h")
    val wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ph
      .select($"pfx", $"h", $"cnt".cast("bigint").as("cnt"))
      .withColumn("total_cnt", sum($"cnt").over(wp))
      .withColumn("span_h", max($"h").over(wp) - min($"h").over(wp) + 1L)
      .withColumn("hmin", min($"h").over(wp))
      .withColumn("cum", sum($"cnt").over(wcum))
      .withColumn("pos", row_number().over(wo))
      // scaled dense prefix sum at this present hour …
      .withColumn("p_now",
        lit(driftDen) * $"span_h" * $"cum" -
          lit(driftNum) * $"total_cnt" * ($"h" - $"hmin" + 1L))
      // … and the floor of the zero-traffic gap just before it (P is
      // linear-decreasing over a gap, so its min sits at h−1; for an
      // adjacent pair this collapses to P at the previous present hour,
      // and lag's 0 default is exactly the empty-prefix P₀ = 0)
      .withColumn("p_gap",
        lit(driftDen) * $"span_h" * lag($"cum", 1, 0L).over(wo) -
          lit(driftNum) * $"total_cnt" * ($"h" - $"hmin"))
      .withColumn("runmin", min(least($"p_now", $"p_gap")).over(wcum))
      .withColumn("cusum_scaled", $"p_now" - $"runmin")
  }

  /** CUSUM alerts from an ALREADY-MAINTAINED (pfx, h, cnt) relation —
    * the split the streaming variant runs (stream owns the counters,
    * this batch pass screens them). Emits one row per alerting present
    * hour past the [[MinHist]] warmup.
    */
  private[graft] def cusumFromCounts(ph: DataFrame,
      driftNum: Long = DriftNum, driftDen: Long = DriftDen,
      thrNum: Long = ThrNum, thrDen: Long = ThrDen): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    require(thrNum > 0 && thrDen > 0, s"threshold must be positive: $thrNum/$thrDen")
    trajectoryFromCounts(ph, driftNum, driftDen)
      .where($"pos" > MinHist &&
        $"cusum_scaled" * lit(thrDen) >= lit(thrNum) * lit(driftDen) * $"total_cnt")
      .select($"pfx", $"h".as("hour_idx"), $"cnt", $"cusum_scaled",
        $"span_h", $"total_cnt")
      .orderBy("pfx", "hour_idx")
  }

  private def oracleSql: String = s"""
WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
ph AS (SELECT regexp_extract(src_ip, '${Detection.Prefix16Re}', 1) AS pfx,
              ts_us // ${Ewma.HourUs} AS h, CAST(count(*) AS BIGINT) AS cnt
       FROM packets GROUP BY 1, 2),
stats AS (SELECT pfx, h, cnt,
                 CAST(sum(cnt) OVER (PARTITION BY pfx) AS BIGINT) AS total_cnt,
                 max(h) OVER (PARTITION BY pfx)
                   - min(h) OVER (PARTITION BY pfx) + 1 AS span_h,
                 min(h) OVER (PARTITION BY pfx) AS hmin,
                 CAST(sum(cnt) OVER (PARTITION BY pfx ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 row_number() OVER (PARTITION BY pfx ORDER BY h) AS pos
          FROM ph),
traj AS (SELECT pfx, h, cnt, total_cnt, span_h, pos,
                $DriftDen * span_h * cum
                  - $DriftNum * total_cnt * (h - hmin + 1) AS p_now,
                $DriftDen * span_h * coalesce(lag(cum) OVER (PARTITION BY pfx ORDER BY h), 0)
                  - $DriftNum * total_cnt * (h - hmin) AS p_gap
         FROM stats),
s AS (SELECT pfx, h, cnt, total_cnt, span_h, pos,
             p_now - min(least(p_now, p_gap)) OVER (PARTITION BY pfx ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_scaled
      FROM traj)
SELECT pfx, CAST(h AS BIGINT) AS hour_idx, cnt, cusum_scaled,
       CAST(span_h AS BIGINT) AS span_h, CAST(total_cnt AS BIGINT) AS total_cnt
FROM s
WHERE pos > $MinHist AND cusum_scaled * $ThrDen >= $ThrNum * $DriftDen * total_cnt
ORDER BY pfx, hour_idx"""

  val qCusumChangepoint = Q(
    "q_cusum_changepoint",
    (spark, dir) => cusumFromCounts(
      StageViews.ensureCached(spark, "pfx_hour_v", dir) {
        Ewma.prefixHourCounts(
          BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir)))
      }),
    Some(oracleSql)
  )

  // ---------------- causally-calibrated variant ----------------

  /** Warmup length for [[qCusumCalibrated]]: the drift is learned from
    * each prefix's first [[WarmupHours]] PRESENT hours (one week of
    * active traffic), the deployable "train on week one, monitor
    * after" protocol. Prefixes that never complete the warmup are
    * never screened.
    */
  val WarmupHours: Int = 168

  /** The full post-warmup trajectory (every present hour with its S',
    * calibration stats attached) — the spec gates this against the
    * dense walk and the causality law; [[calibratedDetections]] is the
    * first-crossing filter over it.
    */
  private[graft] def calibratedTrajectory(ph: DataFrame,
      driftNum: Long = DriftNum, driftDen: Long = DriftDen,
      warmup: Int = WarmupHours): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    require(driftNum > 0 && driftDen > 0 && warmup > 0,
      s"drift/warmup must be positive: $driftNum/$driftDen $warmup")
    val wo = Window.partitionBy($"pfx").orderBy($"h")
    val wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rn = ph
      .select($"pfx", $"h", $"cnt".cast("bigint").as("cnt"))
      .withColumn("rn", row_number().over(wo))
    val warm = rn.where($"rn" <= warmup)
      .groupBy($"pfx")
      .agg(sum($"cnt").cast("bigint").as("warmup_cnt"),
        (max($"h") - min($"h") + 1L).as("warmup_span"),
        max($"h").as("hw"), count(lit(1)).as("nw"))
      .where($"nw" === warmup) // incomplete warmup: never screened
      .drop("nw")
    rn.where($"rn" > warmup)
      .join(broadcast(warm), "pfx") // prefix-count-sized calibration
      .withColumn("cum", sum($"cnt").over(wcum))
      .withColumn("p_now",
        lit(driftDen) * $"warmup_span" * $"cum" -
          lit(driftNum) * $"warmup_cnt" * ($"h" - $"hw"))
      .withColumn("p_gap",
        lit(driftDen) * $"warmup_span" * lag($"cum", 1, 0L).over(wo) -
          lit(driftNum) * $"warmup_cnt" * ($"h" - 1L - $"hw"))
      .withColumn("runmin", min(least($"p_now", $"p_gap")).over(wcum))
      .withColumn("cusum_scaled", $"p_now" - $"runmin")
  }

  private[graft] def calibratedDetections(ph: DataFrame,
      driftNum: Long = DriftNum, driftDen: Long = DriftDen,
      thrNum: Long = ThrNum, thrDen: Long = ThrDen,
      warmup: Int = WarmupHours): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    require(thrNum > 0 && thrDen > 0, s"threshold must be positive: $thrNum/$thrDen")
    val wo = Window.partitionBy($"pfx").orderBy($"h")
    // A crossing compares against S at the previous DENSE hour, not the
    // previous present one: an excursion can end INSIDE a silent gap
    // (S drains by k per absent hour), and a flood after such a gap is
    // a genuinely new alarm. S(h−1) falls out of quantities already on
    // the row: P(h−1) is the gap floor `p_gap`, and
    // min_{j ≤ h−1} P = min(runmin at the previous present row, p_gap)
    // (P decreases over the gap), with the lag default 0 standing in
    // for the warmup-end anchor P(hw) = 0 on each prefix's first row.
    calibratedTrajectory(ph, driftNum, driftDen, warmup)
      .withColumn("prev_s",
        $"p_gap" - least(coalesce(lag($"runmin", 1).over(wo), lit(0L)), $"p_gap"))
      .withColumn("hot",
        $"cusum_scaled" * lit(thrDen) >= lit(thrNum) * lit(driftDen) * $"warmup_cnt")
      .withColumn("prev_hot",
        $"prev_s" * lit(thrDen) >= lit(thrNum) * lit(driftDen) * $"warmup_cnt")
      .where($"hot" && !$"prev_hot")
      .select($"pfx", $"h".as("hour_idx"), $"cnt", $"cusum_scaled",
        $"warmup_cnt", $"warmup_span")
      .orderBy("pfx", "hour_idx")
  }

  /** The CAUSAL twin of [[qCusumChangepoint]], which estimates its
    * drift from the prefix's FULL span (retrospective — a batch screen
    * judging history, like `q_seasonal_anomaly`), so a verdict at hour
    * h can change when LATER data arrives. This variant calibrates
    * `k = (driftNum/driftDen) · Tw/Hw` from the warmup window alone
    * and screens only post-warmup hours, so every verdict is a pure
    * function of the prefix's past — append future rows and no earlier
    * verdict moves (the causality law `CusumSpec` pins, with a
    * contrast test showing the retrospective variant genuinely fails
    * it).
    *
    * Emission is FIRST-CROSSING (Page's alarm semantics): a detection
    * row fires where S crosses the threshold upward (`S ≥ cut` and the
    * previous dense hour was below), not at every hot hour — on
    * drifting data an un-reset CUSUM saturates (measured: at sf0.001
    * three prefixes alert at EVERY post-warmup hour under any
    * threshold), so the hot-hour relation is noise while the crossing
    * relation is the alarm log a responder actually wants. Crossings
    * are `lag`-expressible, keeping the whole screen inside the same
    * single-shuffle window algebra — a true reset-on-alarm (restart S
    * at 0 after each alarm) is NOT prefix-sum decomposable and would
    * need a sequential pass; first-crossing gives the episode
    * boundaries without it. Same sparse gap-analytic closed form, now
    * anchored at the warmup end: `P(h) = den·Hw·Cpost(h) −
    * num·Tw·(h − hw)` over post-warmup cumulative counts, gap floors
    * from `lag(cum)`, one running min (whose j = hw start candidate
    * `P(hw) = 0` is dominated by the first gap floor, which is ≤ 0 by
    * construction). Constants grid-probed like the retrospective
    * screen: 21/20 drift, 1-warmup-mean-hour cut → detections
    * 3 / 97 / 54 / 24 at sf0.001/0.01/0.1/sf1-replica — non-vacuous at
    * every SF.
    */
  val qCusumCalibrated = Q(
    "q_cusum_calibrated",
    (spark, dir) => calibratedDetections(
      StageViews.ensureCached(spark, "pfx_hour_v", dir) {
        Ewma.prefixHourCounts(
          BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir)))
      }),
    Some(s"""
WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
ph AS (SELECT regexp_extract(src_ip, '${Detection.Prefix16Re}', 1) AS pfx,
              ts_us // ${Ewma.HourUs} AS h, CAST(count(*) AS BIGINT) AS cnt
       FROM packets GROUP BY 1, 2),
rn AS (SELECT pfx, h, cnt, row_number() OVER (PARTITION BY pfx ORDER BY h) AS rn
       FROM ph),
warm AS (SELECT pfx, CAST(sum(cnt) AS BIGINT) AS warmup_cnt,
                max(h) - min(h) + 1 AS warmup_span, max(h) AS hw
         FROM rn WHERE rn <= $WarmupHours GROUP BY pfx
         HAVING count(*) = $WarmupHours),
post AS (SELECT r.pfx, r.h, r.cnt, w.warmup_cnt, w.warmup_span, w.hw,
                CAST(sum(r.cnt) OVER (PARTITION BY r.pfx ORDER BY r.h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         FROM rn r JOIN warm w ON r.pfx = w.pfx WHERE r.rn > $WarmupHours),
traj AS (SELECT pfx, h, cnt, warmup_cnt, warmup_span,
                $DriftDen * warmup_span * cum
                  - $DriftNum * warmup_cnt * (h - hw) AS p_now,
                $DriftDen * warmup_span * coalesce(lag(cum) OVER (PARTITION BY pfx ORDER BY h), 0)
                  - $DriftNum * warmup_cnt * (h - 1 - hw) AS p_gap
         FROM post),
s AS (SELECT pfx, h, cnt, warmup_cnt, warmup_span, p_gap,
             min(least(p_now, p_gap)) OVER (PARTITION BY pfx ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin,
             p_now - min(least(p_now, p_gap)) OVER (PARTITION BY pfx ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_scaled
      FROM traj),
alarms AS (SELECT pfx, h, cnt, cusum_scaled, warmup_cnt, warmup_span,
                  cusum_scaled * $ThrDen >= $ThrNum * $DriftDen * warmup_cnt AS hot,
                  (p_gap - least(coalesce(lag(runmin) OVER (PARTITION BY pfx ORDER BY h), 0), p_gap))
                    * $ThrDen >= $ThrNum * $DriftDen * warmup_cnt AS prev_hot
           FROM s)
SELECT pfx, CAST(h AS BIGINT) AS hour_idx, cnt, cusum_scaled,
       warmup_cnt, CAST(warmup_span AS BIGINT) AS warmup_span
FROM alarms
WHERE hot AND NOT prev_hot
ORDER BY pfx, hour_idx""")
  )

  /** The same screen fed by Structured Streaming: the stream maintains
    * per-(prefix, hour) counts (one watermarked event-time aggregation,
    * state bounded to open hours — identical to `q_ewma_burst_stream`'s
    * counter stage) and the CUSUM pass runs as the batch screen over
    * the maintained table. Gated by the SAME oracle: stream == batch,
    * bit for bit.
    *
    * Batch-split robustness (r15 ADVICE): an update-mode memory sink
    * appends each micro-batch's UPDATED rows, so if AvailableNow ever
    * splits the source into >1 data batch (multi-file input at larger
    * SFs) a (pfx, h) key appears once per batch that touched it, each
    * carrying the count as of that batch. Feeding those partials
    * straight into the CUSUM trajectory would inflate total_cnt/cum;
    * the sinks the sketch triad reads guard this with a max-stamp pick,
    * and this query's equivalent is `max(cnt)` per key — a streaming
    * count is monotone across re-emissions of the same key, so the max
    * IS the final count, and on the single-batch path it is the
    * identity.
    */
  val qCusumStream = Q(
    "q_cusum_stream",
    (spark, dir) => graft.GraftSession.withStreamingShuffle(spark,
      graft.GraftSession.adaptiveStreamParts(spark, dir), noDataBatch = false) {
      import spark.implicits._
      val sinkName = graft.GraftSession.newSinkName(spark, "cusum_stream")
      val q = BatchFlowFeaturizer.packetsFromEvents(Tables.eventsStream(spark, dir))
        .select(
          regexp_extract($"src_ip", Detection.Prefix16Re, 1).as("pfx"),
          timestamp_micros($"ts_us").as("event_time"))
        .withWatermark("event_time", "2 minutes")
        .groupBy($"pfx", window($"event_time", "1 hour"))
        .agg(count(lit(1)).as("cnt"))
        .selectExpr("pfx", s"unix_micros(window.start) DIV ${Ewma.HourUs} AS h", "cnt")
        .writeStream.outputMode("update")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      cusumFromCounts(spark.table(sinkName)
        .groupBy($"pfx", $"h").agg(max($"cnt").as("cnt")))
    },
    qCusumChangepoint.oracle) // stream == batch: the SAME oracle gates both

  /** Textbook dense recursion `S' = max(0, S' + den·H·x − num·T)`
    * walked hour by CALENDAR hour on collected (pfx, h, cnt) rows —
    * the INDEPENDENT reference both `CusumSpec` and the ScaleSmoke
    * cusum gate compare the sparse window algebra against (one
    * definition, so the gate and the spec can never silently check
    * different references). Deliberately shares no code with the
    * DataFrame paths: it is a driver-side loop over the dense span.
    * `warmup = 0` is the retrospective screen (T/H from the full
    * span, walk starts at the first present hour); `warmup > 0`
    * calibrates T/H from the first `warmup` present rows and walks
    * from the warmup-end hour (prefixes with ≤ warmup present hours
    * are absent, mirroring the incomplete-warmup guard).
    */
  private[graft] def denseReferenceWalk(counts: Seq[(String, Long, Long)],
      driftNum: Long, driftDen: Long, warmup: Int = 0): Map[(String, Long), Long] =
    counts.groupBy(_._1).flatMap { case (pfx, rs) =>
      val sorted = rs.sortBy(_._2)
      if (warmup > 0 && sorted.length <= warmup) Map.empty[(String, Long), Long]
      else {
        val calib = if (warmup > 0) sorted.take(warmup) else sorted
        val total = calib.map(_._3).sum
        val span = calib.last._2 - calib.head._2 + 1
        val anchor = if (warmup > 0) calib.last._2 else sorted.head._2 - 1
        val byH = (if (warmup > 0) sorted.drop(warmup) else sorted)
          .map(r => r._2 -> r._3).toMap
        var s = 0L
        ((anchor + 1) to sorted.last._2).flatMap { h =>
          s = math.max(0L, s + driftDen * span * byH.getOrElse(h, 0L) - driftNum * total)
          if (byH.contains(h)) Some((pfx, h) -> s) else None
        }
      }
    }

  val all: Seq[Q] = Seq(qCusumChangepoint, qCusumCalibrated, qCusumStream)
}
