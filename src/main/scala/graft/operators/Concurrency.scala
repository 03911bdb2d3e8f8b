package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peak concurrent sessions per day — the classic sweep-line over
  * interval endpoints (how many user sessions were open at once; the
  * capacity question every ops dashboard answers). Sessions are the
  * same 30-minute-gap intervals as `q_sessionize`; each contributes a
  * +1 delta at its start and a −1 delta one microsecond after its last
  * event (closed intervals — a session ending at t still overlaps a
  * session starting at t, and a single-event session never dips the
  * counter). Concurrency is the running sum of deltas in
  * (ts, delta, user, session) order: −1 sorts before +1 at a tie, so
  * back-to-back sessions don't phantom-overlap.
  *
  * Scale: the running sum is NOT a single global window — it is the
  * same two-phase distributed prefix sum as `q_sequence_pack`:
  * phase 1 computes within-DAY running sums (shuffle on day_idx, all
  * days in parallel); phase 2 prefix-sums the per-day totals over the
  * |days|-row relation (the only single-partition window — calendar-
  * bounded, whitelisted like the calendar rollups) and broadcasts the
  * offsets back. Peaks are attained at +1 rows by construction, so the
  * per-day report reads only start rows: `peak_concurrent` is the max
  * running value at a session start that day (days with ends only —
  * possible only when no session starts all day — emit no row, a
  * documented contract, not a dropped bucket).
  *
  * Determinism: the delta order is total; peak_at_us is the EARLIEST
  * instant attaining the day's peak; all outputs BIGINT.
  */
object Concurrency {

  private val DayUs = 86400000000L

  /** Sweep-line peaks over any events relation carrying (user_id, ts
    * epoch-nanos, event_id) — spec entry for the hand-overlap laws;
    * the catalog query binds the driver table.
    */
  /** Session endpoint deltas (+1 at start, −1 one µs after the last
    * event), tagged with their calendar day — the shared stage under
    * both sweep-line queries.
    */
  private[graft] def sessionDeltas(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val sess = events
      .selectExpr("event_id", "user_id", "CAST(ts DIV 1000 AS BIGINT) AS ts_us")
      .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_us".isNull || $"ts_us" - $"prev_us" > Sessionize.GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts_us").as("start_us"), max($"ts_us").as("end_us"))
    sess.select($"start_us".as("ts_us"), lit(1L).as("delta"),
        $"user_id", $"session_idx")
      .unionAll(sess.select(($"end_us" + 1L).as("ts_us"), lit(-1L).as("delta"),
        $"user_id", $"session_idx"))
      .withColumn("day_idx", expr(s"ts_us DIV $DayUs"))
  }

  private[graft] def deltasView(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    StageViews.ensureCached(spark, "sess_deltas_v", dir) {
      sessionDeltas(graft.Tables.events(spark, dir))
    }

  private[graft] def peakConcurrencyOn(events: DataFrame): DataFrame =
    peakOnDeltas(sessionDeltas(events))

  private[graft] def peakOnDeltas(deltas: DataFrame): DataFrame = {
    val spark = deltas.sparkSession
    import spark.implicits._
    // phase 1: within-day running sum, all days in parallel
    val withinW = Window.partitionBy($"day_idx")
      .orderBy($"ts_us", $"delta", $"user_id", $"session_idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    val within = deltas.withColumn("within_run", sum($"delta").over(withinW))
    // phase 2: exclusive prefix over the tiny per-day totals
    val offsetW = Window.orderBy($"day_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = deltas.groupBy($"day_idx")
      .agg(sum($"delta").as("day_delta"))
      .withColumn("carry", coalesce(sum($"day_delta").over(offsetW), lit(0L)))
      .select($"day_idx", $"carry")
    val starts = within.join(broadcast(offsets), "day_idx")
      .where($"delta" === 1L)
      .select($"day_idx", $"ts_us", ($"carry" + $"within_run").as("running"))
    val dayW = Window.partitionBy($"day_idx")
    starts
      .withColumn("peak_concurrent", max($"running").over(dayW))
      .withColumn("n_starts", count(lit(1)).over(dayW))
      .where($"running" === $"peak_concurrent")
      .groupBy($"day_idx", $"peak_concurrent", $"n_starts")
      .agg(min($"ts_us").as("peak_at_us"))
      .orderBy($"day_idx")
  }

  val qPeakConcurrency = Q(
    "q_peak_concurrency",
    (spark, dir) => peakOnDeltas(deltasView(spark, dir)),
    Some(s"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > ${Sessionize.GapUs}
                 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sessed AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, session_idx, min(ts_us) AS start_us, max(ts_us) AS end_us
  FROM sessed GROUP BY 1, 2
), d AS (
  SELECT start_us AS ts_us, 1 AS delta, user_id, session_idx FROM sess
  UNION ALL
  SELECT end_us + 1, -1, user_id, session_idx FROM sess
), r AS (
  SELECT ts_us, delta, ts_us // $DayUs AS day_idx,
         sum(delta) OVER (ORDER BY ts_us, delta, user_id, session_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM d
), s AS (
  SELECT day_idx, ts_us, running FROM r WHERE delta = 1
), p AS (
  SELECT day_idx, max(running) AS peak, count(*) AS n_starts
  FROM s GROUP BY 1
)
SELECT CAST(p.day_idx AS BIGINT) AS day_idx,
       CAST(p.peak AS BIGINT) AS peak_concurrent,
       CAST(p.n_starts AS BIGINT) AS n_starts,
       min(s.ts_us) AS peak_at_us
FROM p JOIN s ON s.day_idx = p.day_idx AND s.running = p.peak
GROUP BY 1, 2, 3
ORDER BY day_idx""")
  )

  /** Daily coverage / uptime — the union-length of session intervals
    * per calendar day: how many microseconds of each day had AT LEAST
    * one session open, and the utilization in bp of the day. The
    * interval-UNION complement of [[qPeakConcurrency]]'s max-overlap:
    * same endpoint deltas, same two-phase distributed prefix sum, plus
    * one marker row per calendar day (delta 0 at midnight, sentinel
    * -1 keys so tie order is engine-identical) so a day that a session
    * spans WHOLE still reports its carry — segments then never cross
    * midnight, and a day's covered time is the sum of its
    * breakpoint-to-next gaps where the running count is positive.
    *
    * Scale: the day spine is exploded from the 1-row (min, max) day
    * bounds — calendar-sized; everything else is the peak query's
    * shape (phase-1 windows partitioned by day, phase-2 offsets over
    * the |days| relation).
    */
  private[graft] def coverageOn(events: DataFrame): DataFrame =
    coverageOnDeltas(sessionDeltas(events))

  private[graft] def coverageOnDeltas(deltas: DataFrame): DataFrame = {
    val spark = deltas.sparkSession
    import spark.implicits._
    val bounds = deltas.agg(min($"day_idx").as("d0"), max($"day_idx").as("d1"))
    val markers = bounds
      .select(explode(sequence($"d0", $"d1")).as("day_idx"))
      .select(($"day_idx" * DayUs).as("ts_us"), lit(0L).as("delta"),
        lit(-1L).as("user_id"), lit(-1L).as("session_idx"), $"day_idx")
    val pts = deltas.unionAll(markers)
    val withinW = Window.partitionBy($"day_idx")
      .orderBy($"ts_us", $"delta", $"user_id", $"session_idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    val offsetW = Window.orderBy($"day_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pts.groupBy($"day_idx")
      .agg(sum($"delta").as("day_delta"))
      .withColumn("carry", coalesce(sum($"day_delta").over(offsetW), lit(0L)))
      .select($"day_idx".as("od"), $"carry")
    val leadW = Window.partitionBy($"day_idx")
      .orderBy($"ts_us", $"delta", $"user_id", $"session_idx")
    pts
      .withColumn("within_run", sum($"delta").over(withinW))
      .withColumn("next_us",
        coalesce(lead($"ts_us", 1).over(leadW), ($"day_idx" + 1) * DayUs))
      .join(broadcast(offsets), $"day_idx" === $"od")
      .withColumn("running", $"carry" + $"within_run")
      .groupBy($"day_idx")
      .agg(
        sum(when($"running" > 0L, $"next_us" - $"ts_us").otherwise(0L))
          .cast("bigint").as("covered_us"),
        sum(when($"delta" === 1L, 1L).otherwise(0L)).cast("bigint")
          .as("n_session_starts"))
      .selectExpr("day_idx", "covered_us", "n_session_starts",
        s"(10000 * covered_us) DIV $DayUs AS utilization_bp")
      .orderBy("day_idx")
  }

  val qDailyCoverage = Q(
    "q_daily_coverage",
    (spark, dir) => coverageOnDeltas(deltasView(spark, dir)),
    Some(s"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > ${Sessionize.GapUs}
                 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sessed AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, session_idx, min(ts_us) AS start_us, max(ts_us) AS end_us
  FROM sessed GROUP BY 1, 2
), d AS (
  SELECT start_us AS ts_us, 1 AS delta, user_id, session_idx,
         start_us // $DayUs AS day_idx FROM sess
  UNION ALL
  SELECT end_us + 1, -1, user_id, session_idx,
         (end_us + 1) // $DayUs FROM sess
), bounds AS (
  SELECT min(day_idx) AS d0, max(day_idx) AS d1 FROM d
), markers AS (
  SELECT dd * $DayUs AS ts_us, 0 AS delta,
         CAST(-1 AS BIGINT) AS user_id, CAST(-1 AS BIGINT) AS session_idx,
         dd AS day_idx
  FROM (SELECT unnest(range(d0, d1 + 1)) AS dd FROM bounds)
), pts AS (
  SELECT * FROM d UNION ALL SELECT * FROM markers
), r AS (
  SELECT day_idx, ts_us, delta,
         sum(delta) OVER (ORDER BY ts_us, delta, user_id, session_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running,
         coalesce(lead(ts_us) OVER (PARTITION BY day_idx
                                    ORDER BY ts_us, delta, user_id, session_idx),
                  (day_idx + 1) * $DayUs) AS next_us
  FROM pts
)
SELECT CAST(day_idx AS BIGINT) AS day_idx,
       CAST(sum(CASE WHEN running > 0 THEN next_us - ts_us ELSE 0 END) AS BIGINT) AS covered_us,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_session_starts,
       (10000 * CAST(sum(CASE WHEN running > 0 THEN next_us - ts_us ELSE 0 END) AS BIGINT)) // $DayUs AS utilization_bp
FROM r
GROUP BY 1
ORDER BY day_idx""")
  )

  val all: Seq[Q] = Seq(qPeakConcurrency, qDailyCoverage)
}
