package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch sessionization — the windowed analog of the streaming session
  * (gap-based, like the featurizer's 60 s processing-time timeout but on
  * event time): lag → gap flag → running session index → per-session
  * aggregates. Demonstrates the window-function surface the reference
  * keeps inside its stateful op (SURVEY.md §2.5).
  *
  * Scale: both windows and the groupBy cluster on user_id — one shuffle
  * total; session aggregates use the exact-cents pattern so sums stay
  * deterministic at any scale.
  */
object Sessionize {

  val GapUs: Long = 30L * 60 * 1000000 // 30 min

  val qSessionize = Q(
    "q_sessionize",
    (spark, dir) => {
      import spark.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      Tables.events(spark, dir)
        .selectExpr("event_id", "user_id", "event_type", "value",
          "CAST(ts DIV 1000 AS BIGINT) AS ts_us")
        .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_us".isNull || $"ts_us" - $"prev_us" > GapUs, 1L).otherwise(0L))
        .withColumn("session_idx",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_idx")
        .agg(
          count(lit(1)).as("n_events"),
          min($"ts_us").as("start_us"),
          max($"ts_us").as("end_us"),
          (max($"ts_us") - min($"ts_us")).as("duration_us"),
          (sum(expr("CAST(round(value * 100, 0) AS BIGINT)")) / 100.0).as("total_value"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("purchases"))
        .orderBy($"user_id", $"session_idx")
    },
    Some(s"""WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > $GapUs
                 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
FROM sess
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx""")
  )

  /** Funnel-stage analysis: how far does each user progress through the
    * ORDERED chain view → click → purchase (each step strictly after
    * the previous one in event time)? Spelled as three chained
    * conditional-min WINDOWS over one partitioning — ONE scan of the
    * fact and one shuffle on user_id (the r6 plan audit showed the
    * earlier join-chain spelling scanning events five times; the
    * windows all preserve the same hash partitioning, so Spark runs
    * them back-to-back with no re-exchange). NULL chaining carries the
    * gate for free: no t_view ⇒ the click predicate is NULL ⇒ no
    * t_click, exactly the old join semantics. All-integer outputs.
    *
    * The shared-SQL spelling runs verbatim in both engines.
    */
  private val funnelSql: String = {
    val ts = "ts_us"
    s"""
WITH e AS (SELECT user_id, event_type, EPOCH_PLACEHOLDER AS $ts FROM events),
w1 AS (SELECT user_id, event_type, $ts,
              min(CASE WHEN event_type = 'view' THEN $ts END)
                OVER (PARTITION BY user_id) AS t_view
       FROM e),
w2 AS (SELECT user_id, event_type, $ts, t_view,
              min(CASE WHEN event_type = 'click' AND $ts > t_view THEN $ts END)
                OVER (PARTITION BY user_id) AS t_click
       FROM w1),
w3 AS (SELECT user_id, t_view, t_click,
              min(CASE WHEN event_type = 'purchase' AND $ts > t_click THEN $ts END)
                OVER (PARTITION BY user_id) AS t_purchase
       FROM w2),
funnel AS (SELECT DISTINCT user_id, t_view, t_click, t_purchase FROM w3)
SELECT user_id,
       CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                 WHEN t_click IS NOT NULL THEN 2
                 WHEN t_view IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage,
       t_view, t_click, t_purchase,
       CASE WHEN t_purchase IS NOT NULL THEN t_purchase - t_view END AS funnel_us
FROM funnel
ORDER BY user_id"""
  }

  val qFunnel = Q(
    "q_funnel_stages",
    (spark, dir) => {
      Tables.events(spark, dir).createOrReplaceTempView("events")
      spark.sql(funnelSql.replace("EPOCH_PLACEHOLDER", "CAST(ts DIV 1000 AS BIGINT)"))
    },
    Some(funnelSql.replace("EPOCH_PLACEHOLDER", "epoch_us(ts)")))

  /** Per-day bounce rate — the share of sessions that contain exactly
    * one event, keyed by the day the session STARTED (a session
    * belongs to one day even when it crosses midnight — the dashboard
    * convention that keeps the daily partition exact). Same gap
    * sessionization as [[qSessionize]]; after the per-session
    * aggregate everything is session-sized, and the final groupBy key
    * is calendar-bounded.
    */
  private[graft] def bounceOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val sess = events
        .selectExpr("event_id", "user_id", "CAST(ts DIV 1000 AS BIGINT) AS ts_us")
        .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_us".isNull || $"ts_us" - $"prev_us" > GapUs, 1L).otherwise(0L))
        .withColumn("session_idx",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"), min($"ts_us").as("start_us"))
      sess
        .selectExpr(s"start_us DIV ${86400L * 1000000} AS day_idx",
          "CASE WHEN n_events = 1 THEN 1 ELSE 0 END AS bounced")
        .groupBy($"day_idx")
        .agg(count(lit(1)).as("n_sessions"),
          sum($"bounced").cast("bigint").as("n_bounces"))
        .selectExpr("day_idx", "n_sessions", "n_bounces",
          "(10000 * n_bounces) DIV n_sessions AS bounce_bp")
        .orderBy("day_idx")
    }
  }

  val qBounceRate = Q(
    "q_bounce_rate",
    (spark, dir) => bounceOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
flagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > $GapUs
                 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sessed AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, session_idx, count(*) AS n_events, min(ts_us) AS start_us
  FROM sessed GROUP BY 1, 2
)
SELECT start_us // ${86400L * 1000000} AS day_idx,
       count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       (10000 * CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS bounce_bp
FROM sess
GROUP BY 1
ORDER BY day_idx""")
  )

  val all: Seq[Q] = Seq(qSessionize, qFunnel, qBounceRate)
}
