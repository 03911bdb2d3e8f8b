package graft.operators

import graft.{Q, Tables}
import graft.flow.{BatchFlowFeaturizer, FlowFeatureSql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EWMA burst detection — the control-chart sibling of `q_src_entropy`
  * and `q_rate_anomaly`: for every /16 source prefix and hour, an
  * exponentially-weighted baseline of the PRIOR [[HistHours]] hourly
  * packet counts (weight halves per hour of age), and an alert when
  * the current hour exceeds [[ThetaNum]]/[[ThetaDen]] × that
  * baseline. This is the
  * per-entity decayed counter a rate limiter actually keeps — a burst
  * an hour ago dominates the baseline, last night's traffic barely
  * registers — restated in EXACT integers: every weight is a power of
  * two (`shiftleft`), the baseline is a scaled BIGINT sum, and the
  * alert test cross-multiplies
  * (`cnt · (2^K − 1) · θden > θnum · baseline`) instead of dividing,
  * so the oracle hash-matches with no float anywhere (same reasoning
  * as `q_decay_halflife`; a libm `exp` could never be oracle-gated).
  *
  * The catalog ratio is 7/4, chosen the `q_rate_anomaly` way (r12):
  * the synthetic corpus' burst-over-baseline ratio flattens with scale
  * (max 146× at sf0.001, 93× at sf0.01, 2.47× at sf0.1, 1.90× on the
  * ×10 sf1 replica — each user contributes near-uniform traffic, so
  * CLT averaging kills relative bursts as per-prefix-hour counts
  * grow), and the r12 θ=4 cut was vacuous at sf0.1/sf1 — the sf1
  * probe row proved only `0 = 0`. At 7/4 every probed SF exercises
  * the alert path (331 @ sf0.001, 693 @ sf0.01, 66 @ sf0.1,
  * 5 @ sf1) and the spec pins both non-vacuity and the
  * threshold-monotonicity law.
  *
  * Shape at scale: counts reduce the packet stream to the
  * (prefix, hour) relation FIRST — one map-side-combinable groupBy on
  * a calendar×prefix-bounded key — and the EWMA is a constant-K=10
  * explode of that already-tiny relation onto the hours it baselines
  * (the q_rolling_distinct_users trick: a decayed-sum window needs
  * neither a per-row ordered window nor a dense hour spine, because
  * absent hours contribute exactly 0). Alerts require
  * [[MinHist]] prior active hours, so a prefix's first appearance is
  * warmup, not noise.
  */
object Ewma {

  val HistHours: Int = 10
  val ThetaNum: Long = 7L
  val ThetaDen: Long = 4L
  val MinHist: Long = 3L
  val HourUs: Long = 3600L * 1000000
  private val WeightSum: Long = (1L << HistHours) - 1 // Σ 2^(K-k), k=1..K

  /** EWMA alerts over any packet relation carrying (src_ip, ts_us) —
    * spec entry for the hand-baseline, warmup, and decay-dominance
    * laws; the catalog query binds the driver packet stream.
    */
  private[graft] def ewmaAlertsOn(packets: DataFrame): DataFrame =
    alertsFromCounts(prefixHourCounts(packets))

  /** The (prefix, hour, count) reduction — referenced by both the
    * current-hour side and the baseline explode; the catalog entry
    * caches it so the packet stream reduces once.
    */
  private[graft] def prefixHourCounts(packets: DataFrame): DataFrame = {
    val spark = packets.sparkSession
    locally {
      import spark.implicits._
      packets
        .select(
          regexp_extract($"src_ip", Detection.Prefix16Re, 1).as("pfx"),
          expr(s"ts_us DIV $HourUs").as("h"))
        .groupBy($"pfx", $"h").agg(count(lit(1)).as("cnt"))
    }
  }

  /** The alert rollup from an ALREADY-MAINTAINED (pfx, h, cnt) relation
    * — the split a streaming deployment runs ([[qEwmaBurstStream]]):
    * the stream owns the counter state, the baseline explode and alert
    * test are a batch pass over it (the baseline needs each hour's
    * FINAL count, which only exists once the hour closes — same
    * argument as `Detection.entropyFromCounts`).
    */
  private[graft] def alertsFromCounts(ph: DataFrame,
      num: Long = ThetaNum, den: Long = ThetaDen): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    require(num > 0 && den > 0, s"threshold ratio must be positive: $num/$den")
    // baseline keys are RENAMED (bpfx, bh): the stream variant reads
    // both join sides from one memory-sink view, and identical
    // attribute ids on both sides of the join fail to resolve
    val base = ph
      .select($"pfx", $"h", $"cnt",
        explode(sequence(lit(1), lit(HistHours))).as("k"))
      .select($"pfx".as("bpfx"), ($"h" + $"k").as("bh"),
        expr(s"cnt * shiftleft(CAST(1 AS BIGINT), $HistHours - k)").as("w"))
      .groupBy($"bpfx", $"bh")
      .agg(sum($"w").cast("bigint").as("baseline_scaled"),
        count(lit(1)).as("n_hist"))
    ph.join(base, $"pfx" === $"bpfx" && $"h" === $"bh")
      .where($"n_hist" >= MinHist &&
        $"cnt" * lit(WeightSum) * lit(den) > lit(num) * $"baseline_scaled")
      .select($"pfx", $"h".as("hour_idx"), $"cnt", $"baseline_scaled", $"n_hist")
      .orderBy("pfx", "hour_idx")
  }

  val qEwmaAlerts = Q(
    "q_ewma_burst",
    (spark, dir) => alertsFromCounts(
      StageViews.ensureCached(spark, "pfx_hour_v", dir) {
        prefixHourCounts(
          BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir)))
      }),
    Some(s"""
WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
ph AS (SELECT regexp_extract(src_ip, '${Detection.Prefix16Re}', 1) AS pfx,
              ts_us // $HourUs AS h, count(*) AS cnt
       FROM packets GROUP BY 1, 2),
ex AS (SELECT pfx, h + o.k AS h,
              CAST(cnt AS BIGINT) * (1 << ($HistHours - o.k)) AS w
       FROM ph CROSS JOIN (SELECT unnest(range(1, ${HistHours + 1})) AS k) o),
base AS (SELECT pfx, h, CAST(sum(w) AS BIGINT) AS baseline_scaled,
                count(*) AS n_hist
         FROM ex GROUP BY 1, 2)
SELECT ph.pfx AS pfx, CAST(ph.h AS BIGINT) AS hour_idx, CAST(cnt AS BIGINT) AS cnt,
       baseline_scaled, CAST(n_hist AS BIGINT) AS n_hist
FROM ph JOIN base ON ph.pfx = base.pfx AND ph.h = base.h
WHERE n_hist >= $MinHist AND cnt * $WeightSum * $ThetaDen > $ThetaNum * baseline_scaled
ORDER BY pfx, hour_idx""")
  )

  /** The same burst signal fed by Structured Streaming: the STREAM
    * maintains per-(prefix, hour) packet counts (one watermarked
    * event-time aggregation — state bounded to open hours, update mode
    * under AvailableNow emits each key's final count), and the decayed
    * baseline + alert test run as the [[alertsFromCounts]] batch pass
    * over the maintained counter table. Gated by the SAME oracle as
    * [[qEwmaAlerts]]: stream == batch, bit for bit.
    */
  val qEwmaBurstStream = Q(
    "q_ewma_burst_stream",
    (spark, dir) => graft.GraftSession.withStreamingShuffle(spark,
      graft.GraftSession.adaptiveStreamParts(spark, dir), noDataBatch = false) {
      import spark.implicits._
      val sinkName = graft.GraftSession.newSinkName(spark, "ewma_stream")
      val q = BatchFlowFeaturizer.packetsFromEvents(Tables.eventsStream(spark, dir))
        .select(
          regexp_extract($"src_ip", Detection.Prefix16Re, 1).as("pfx"),
          timestamp_micros($"ts_us").as("event_time"))
        .withWatermark("event_time", "2 minutes")
        .groupBy($"pfx", window($"event_time", "1 hour"))
        .agg(count(lit(1)).as("cnt"))
        .selectExpr("pfx", s"unix_micros(window.start) DIV $HourUs AS h", "cnt")
        .writeStream.outputMode("update")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      alertsFromCounts(spark.table(sinkName).select($"pfx", $"h", $"cnt"))
    },
    qEwmaAlerts.oracle) // stream == batch: the SAME oracle gates both

  /** Seasonal (hour-of-day) anomaly — the calendar complement of the
    * recency-weighted [[qEwmaAlerts]]: a prefix-hour is anomalous when
    * its count defies ITS OWN hour-of-day norm across the other days
    * (`cnt · n_other · θden > θnum · Σ other-days' counts at the same
    * h24`, cross-multiplied — traffic at 3 AM is judged against 3 AM,
    * so a nightly batch spike never pages and a quiet-hour flood
    * does). Requires [[SeasonMinDays]] other days of history at that
    * hour. The catalog ratio is 8/5 for the same reason [[qEwmaAlerts]]
    * runs at 7/4: the corpus' same-hour ratio flattens with scale
    * (max 3.64 @ sf0.001 → 1.66 on the sf1 replica), and the r12 θ=3
    * cut was sf0.1/sf1-vacuous; at 8/5 every probed SF emits rows
    * (102 / 348 / 47 / 5) and the spec pins monotonicity.
    *
    * Derives (day, hour-of-day) arithmetically from the SAME cached
    * (prefix, hour, count) stage as the EWMA — h24 = h mod 24,
    * day = h DIV 24 — so the packet stream still reduces once for the
    * whole control-chart family. Everything downstream is
    * prefix×hour-domain-sized.
    */
  val SeasonNum: Long = 8L
  val SeasonDen: Long = 5L
  val SeasonMinDays: Long = 5L

  private[graft] def seasonalFromCounts(ph: DataFrame,
      num: Long = SeasonNum, den: Long = SeasonDen): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    require(num > 0 && den > 0, s"threshold ratio must be positive: $num/$den")
    val phd = ph.selectExpr("pfx", "h DIV 24 AS d", "h % 24 AS h24", "cnt")
    val tot = phd.groupBy($"pfx".as("tpfx"), $"h24".as("th24"))
      .agg(sum($"cnt").cast("bigint").as("tot_cnt"),
        count(lit(1)).as("n_days"))
    phd.join(broadcast(tot), $"pfx" === $"tpfx" && $"h24" === $"th24")
      .where($"n_days" - 1 >= SeasonMinDays &&
        $"cnt" * ($"n_days" - 1) * lit(den) > lit(num) * ($"tot_cnt" - $"cnt"))
      .selectExpr("pfx", "d AS day_idx", "h24", "cnt",
        "tot_cnt - cnt AS others_cnt", "n_days - 1 AS n_other_days")
      .orderBy("pfx", "day_idx", "h24")
  }

  val qSeasonalAnomaly = Q(
    "q_seasonal_anomaly",
    (spark, dir) => seasonalFromCounts(
      StageViews.ensureCached(spark, "pfx_hour_v", dir) {
        prefixHourCounts(
          BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir)))
      }),
    Some(s"""
WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
ph AS (SELECT regexp_extract(src_ip, '${Detection.Prefix16Re}', 1) AS pfx,
              ts_us // $HourUs AS h, count(*) AS cnt
       FROM packets GROUP BY 1, 2),
phd AS (SELECT pfx, h // 24 AS d, h % 24 AS h24, cnt FROM ph),
tot AS (SELECT pfx AS tpfx, h24 AS th24, CAST(sum(cnt) AS BIGINT) AS tot_cnt,
               count(*) AS n_days
        FROM phd GROUP BY 1, 2)
SELECT pfx, CAST(d AS BIGINT) AS day_idx, CAST(h24 AS BIGINT) AS h24,
       CAST(cnt AS BIGINT) AS cnt,
       tot_cnt - cnt AS others_cnt,
       CAST(n_days - 1 AS BIGINT) AS n_other_days
FROM phd JOIN tot ON pfx = tpfx AND h24 = th24
WHERE n_days - 1 >= $SeasonMinDays
  AND cnt * (n_days - 1) * $SeasonDen > $SeasonNum * (tot_cnt - cnt)
ORDER BY pfx, day_idx, h24""")
  )

  /** Time-series pattern search over the traffic matrix — the
    * distributed subsequence-similarity primitive the streaming
    * literature builds on (EDBT'19 streaming TS similarity, EDBT'20
    * incremental top-k — PAPERS.md): for EVERY (prefix, hour) sliding
    * window of length L, the EXACT integer squared Euclidean distance
    * to a reference attack-onset ramp ([[Pattern]], an exponential
    * doubling burst), global top-[[PatternTopK]] closest windows.
    * "Which prefixes' recent traffic SHAPE looks like the known ramp"
    * is the mitigation question volumetric thresholds can't answer —
    * a slow doubling ramp never trips a rate cut until it's already
    * large.
    *
    * Shape at scale: rides the SAME cached (pfx, h, cnt) reduction as
    * the EWMA/seasonal family, densified on a calendar×prefix-bounded
    * spine (absent hours are exact 0s, so distances are over the TRUE
    * series, not the sparse one); each spine cell fans out to the ≤L
    * windows containing it with its in-window index (the constant-L
    * explode trick — no per-row ordered window, no cross join), and
    * the distance is one map-side-combinable groupBy. Top-k is
    * TakeOrdered over a total order (dist², pfx, start) — never a
    * global sort materialization. Everything after the packet
    * reduction is domain-bounded: prefixes × calendar hours × L.
    *
    * Determinism: counts, pattern, and distances are exact BIGINTs;
    * the tie order is total. Windows are complete by construction
    * (edge starts filtered), so both engines aggregate exactly L
    * terms per window.
    */
  val Pattern: Seq[Long] = Seq(0L, 0L, 0L, 0L, 1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L)
  val PatternTopK = 20

  /** Span guard (r13 verdict): the dense spine is |pfx| × hour-span —
    * domain-bounded on today's corpora (SCALE gate pins the window
    * count exact-constant under ×10 volume) but the SPAN dimension
    * grows with calendar time, and a multi-year 100 TB corpus would
    * inflate it silently. An onset-pattern search is a RECENT-history
    * question, so the spine is clamped to the trailing
    * [[PatternHorizonHours]] (one year): hmin is raised to
    * hmax − H + 1, bounding the spine at |pfx| · H forever. The clamp
    * is mirrored verbatim in the oracle and exercised above the
    * horizon by ScaleSmoke's time-extended replica probe.
    */
  val PatternHorizonHours: Long = 24L * 365

  private[graft] def patternMatchOn(ph: DataFrame,
      pattern: Seq[Long] = Pattern, topK: Int = PatternTopK,
      horizonHours: Long = PatternHorizonHours): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    require(pattern.nonEmpty && topK > 0 && horizonHours >= pattern.length)
    val L = pattern.length
    val b = ph.agg(min($"h").as("hmin0"), max($"h").as("hmax"))
      .select(greatest($"hmin0", $"hmax" - lit(horizonHours - 1)).as("hmin"),
        $"hmax")
    val pfxs = ph.select($"pfx").distinct()
    val spine = pfxs.crossJoin(broadcast(b))
      .select($"pfx", $"hmin", $"hmax",
        explode(sequence($"hmin", $"hmax")).as("sh"))
    val dense = spine.join(
        ph.select($"pfx".as("ppfx"), $"h", $"cnt"),
        $"pfx" === $"ppfx" && $"sh" === $"h", "left")
      .select($"pfx", $"sh", $"hmin", $"hmax",
        coalesce($"cnt", lit(0L)).as("cnt"))
    val pat = pattern.zipWithIndex.map { case (q, k) => (k, q) }.toDF("k", "q")
    dense
      .select($"pfx", $"sh", $"cnt", $"hmin", $"hmax",
        explode(sequence(lit(0), lit(L - 1))).as("k"))
      .withColumn("start", $"sh" - $"k")
      .where($"start" >= $"hmin" && $"start" + lit(L - 1) <= $"hmax")
      .join(broadcast(pat), "k")
      .groupBy($"pfx", $"start")
      .agg(sum(($"cnt" - $"q") * ($"cnt" - $"q")).cast("bigint").as("dist2"))
      .orderBy($"dist2", $"pfx", $"start")
      .limit(topK)
      .selectExpr("pfx", "CAST(start AS BIGINT) AS window_start_hour", "dist2")
  }

  private def patternValues: String =
    Pattern.zipWithIndex.map { case (q, k) => s"($k, $q)" }.mkString(", ")

  val qTsPatternMatch = Q(
    "q_ts_pattern_match",
    (spark, dir) => patternMatchOn(
      StageViews.ensureCached(spark, "pfx_hour_v", dir) {
        prefixHourCounts(
          BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir)))
      }),
    Some(s"""
WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
ph AS (SELECT regexp_extract(src_ip, '${Detection.Prefix16Re}', 1) AS pfx,
              ts_us // $HourUs AS h, count(*) AS cnt
       FROM packets GROUP BY 1, 2),
b AS (SELECT greatest(min(h), max(h) - ${PatternHorizonHours - 1}) AS hmin,
             max(h) AS hmax FROM ph),
pfxs AS (SELECT DISTINCT pfx FROM ph),
spine AS (SELECT pfx, unnest(range(hmin, hmax + 1)) AS sh, hmin, hmax
          FROM pfxs CROSS JOIN b),
dense AS (SELECT s.pfx, s.sh, s.hmin, s.hmax, coalesce(ph.cnt, 0) AS cnt
          FROM spine s LEFT JOIN ph ON s.pfx = ph.pfx AND s.sh = ph.h),
pat(k, q) AS (VALUES $patternValues),
contrib AS (SELECT pfx, sh, cnt, hmin, hmax,
                   unnest(range(0, ${Pattern.length})) AS k
            FROM dense),
w AS (SELECT c.pfx, c.sh - c.k AS start,
             CAST(c.cnt - p.q AS BIGINT) AS diff
      FROM contrib c JOIN pat p ON c.k = p.k
      WHERE c.sh - c.k >= c.hmin
        AND c.sh - c.k + ${Pattern.length - 1} <= c.hmax)
SELECT pfx, CAST(start AS BIGINT) AS window_start_hour,
       CAST(sum(diff * diff) AS BIGINT) AS dist2
FROM w GROUP BY 1, 2
ORDER BY dist2, pfx, window_start_hour
LIMIT $PatternTopK""")
  )

  val all: Seq[Q] =
    Seq(qEwmaAlerts, qEwmaBurstStream, qSeasonalAnomaly, qTsPatternMatch)
}
