package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Time-series regularization: resample each user's event stream onto a
  * fixed hourly grid between that user's first and last event, emitting
  * a row for EVERY bucket — zero-filled counts for gaps, and the most
  * recent event_type carried forward across them (last-observation-
  * carried-forward).
  *
  * Shape: (1) one map-side-combinable aggregate to per-(user, bucket)
  * rows — the raw stream is never windowed directly; (2) a per-user
  * `sequence()` spine exploded from the 2-column (user, min, max)
  * relation — the fan-out is bounded by span/bucket, not by event
  * count, and clusters on the join key it is built from; (3) one
  * broadcast-or-shuffle left join spine←buckets; (4) a per-user ordered
  * window for the forward fill (`last(_, ignoreNulls)` over rows
  * unbounded-preceding..current). At 100 TB the only wide exchanges are
  * the bucket aggregate and the user-partitioned window — both keyed on
  * user_id, so AQE reuses one partitioning.
  *
  * Determinism: buckets are integer µs arithmetic; "last event in
  * bucket" is picked by the total order (ts_us, event_id); the carried
  * string is exact. No floats anywhere.
  */
object TimeSeries {

  val BucketUs: Long = 3600L * 1000000

  val qGapFill = Q(
    "q_gap_fill",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"user_id", expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          $"event_id", $"event_type")
        .withColumn("bucket", ($"ts_us" - ($"ts_us" % BucketUs)) / BucketUs)
        .withColumn("bucket", $"bucket".cast("bigint"))
      // per-(user, bucket): count + last event_type by (ts_us, event_id)
      val perBucket = ev
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id", $"bucket")
            .orderBy($"ts_us".desc, $"event_id".desc)))
        .groupBy($"user_id", $"bucket")
        .agg(count(lit(1)).as("n_events"),
          max(when($"rn" === 1, $"event_type")).as("bucket_last_type"))
      // hourly spine per user over [min bucket, max bucket]
      val spine = ev.groupBy($"user_id".as("uid"))
        .agg(min($"bucket").as("b0"), max($"bucket").as("b1"))
        .select($"uid", explode(sequence($"b0", $"b1")).as("bucket"))
      val filled = spine
        .join(perBucket,
          spine("uid") === perBucket("user_id") && spine("bucket") === perBucket("bucket"),
          "left")
        .select($"uid".as("user_id"), spine("bucket"),
          coalesce($"n_events", lit(0L)).as("n_events"), $"bucket_last_type")
      filled
        .withColumn("last_type", last($"bucket_last_type", ignoreNulls = true).over(
          Window.partitionBy($"user_id").orderBy($"bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"user_id", ($"bucket" * BucketUs).as("bucket_start_us"),
          $"n_events", $"last_type")
        .orderBy($"user_id", $"bucket_start_us")
    },
    Some(s"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                  epoch_us(ts) // $BucketUs AS bucket
           FROM events),
pb AS (SELECT user_id, bucket, count(*) AS n_events,
              max(CASE WHEN rn = 1 THEN event_type END) AS bucket_last_type
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id, bucket
                                          ORDER BY ts_us DESC, event_id DESC) AS rn
             FROM e)
       GROUP BY user_id, bucket),
sp AS (SELECT uid, unnest(generate_series(b0, b1)) AS bucket
       FROM (SELECT user_id AS uid, min(bucket) AS b0, max(bucket) AS b1
             FROM e GROUP BY user_id)),
f AS (SELECT sp.uid AS user_id, sp.bucket,
             coalesce(pb.n_events, 0) AS n_events, pb.bucket_last_type
      FROM sp LEFT JOIN pb ON sp.uid = pb.user_id AND sp.bucket = pb.bucket)
SELECT user_id, bucket * $BucketUs AS bucket_start_us, n_events,
       last_value(bucket_last_type IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type
FROM f
ORDER BY user_id, bucket_start_us""")
  )

  /** Value-based (RANGE) window frames — the sliding-horizon "events in
    * my trailing hour" aggregate, distinct from ROWS frames in both
    * semantics (peers at the same timestamp always aggregate together)
    * and execution (the frame bound is a value offset, not a row
    * count). Emitted per event: trailing-hour count and cents sum for
    * the same user. One shuffle on user_id.
    */
  val qRangeFrame = Q(
    "q_trailing_hour",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rangeBetween(-BucketUs, 0)
      Tables.events(spark, dir)
        .select($"event_id", $"user_id",
          expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
        .select($"event_id", $"user_id", $"ts_us",
          count(lit(1)).over(w).as("n_trailing_hour"),
          sum($"cents").over(w).as("cents_trailing_hour"))
        .orderBy($"event_id")
    },
    Some(s"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events)
SELECT event_id, user_id, ts_us,
       count(*) OVER w AS n_trailing_hour,
       CAST(sum(cents) OVER w AS BIGINT) AS cents_trailing_hour
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN $BucketUs PRECEDING AND CURRENT ROW)
ORDER BY event_id""")
  )

  /** Cohort retention matrix — the classic product-analytics rollup a
    * warehouse team runs weekly: users grouped by first-activity week
    * (the cohort), and for every later week the count and basis-point
    * share of the cohort still active. All integers: epoch-aligned
    * weeks by integer division of the µs timestamp, retention in
    * floor-division basis points of the offset-0 cohort size (offset 0
    * always exists — the cohort week IS an activity week, so every
    * user is active at offset 0 by construction).
    *
    * Shape at scale: one DISTINCT over (user, week) — the natural
    * pre-aggregation, shrinking the event stream to user-weeks before
    * anything else — then a per-user min, a shuffle join back on
    * user_id (both sides already user-week sized, not event sized),
    * and two bounded aggregations; the offset-0 base relation is
    * |cohorts| rows and broadcasts.
    */
  val WeekUs: Long = 7L * 86400 * 1000000

  /** The retention matrix over any events relation carrying
    * (user_id, ts epoch-nanos BIGINT) — spec entry for the
    * shift-equivariance law; the catalog query binds the driver table.
    */
  private[graft] def cohortOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      val act = events
        .selectExpr("user_id", s"(CAST(ts DIV 1000 AS BIGINT)) DIV $WeekUs AS week")
        .distinct()
      val coh = act.groupBy($"user_id".as("u")).agg(min($"week").as("cohort_week"))
      val cell = act.join(coh, $"user_id" === $"u")
        .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
      val base = cell.where($"week_offset" === 0)
        .select($"cohort_week".as("cw"), $"n_users".as("cohort_size"))
      cell.join(broadcast(base), $"cohort_week" === $"cw")
        .selectExpr("cohort_week", "week_offset", "n_users", "cohort_size",
          "(10000 * n_users) DIV cohort_size AS retention_bp")
        .orderBy("cohort_week", "week_offset")
  }

  val qCohortRetention = Q(
    "q_cohort_retention",
    (spark, dir) => cohortOn(Tables.events(spark, dir)),
    Some(s"""
WITH act AS (SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
coh AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id),
cell AS (SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
                count(*) AS n_users
         FROM act a JOIN coh c ON a.user_id = c.user_id
         GROUP BY 1, 2),
base AS (SELECT cohort_week, n_users AS cohort_size FROM cell WHERE week_offset = 0)
SELECT cell.cohort_week AS cohort_week, cell.week_offset, cell.n_users,
       base.cohort_size,
       (10000 * cell.n_users) // base.cohort_size AS retention_bp
FROM cell JOIN base ON cell.cohort_week = base.cohort_week
ORDER BY cell.cohort_week, cell.week_offset"""))

  /** Recency-decayed activity score — every event weighted by
    * 2^(K − level), level = how many half-lives (3 days) the event sits
    * before the corpus's LAST timestamp, clamped at K = [[DecayCap]].
    * This is the standard exponentially-decayed counter a rate-limiting
    * / anomaly layer keeps per entity (a burst yesterday outranks the
    * same volume three weeks ago), restated so every weight is an EXACT
    * power-of-two BIGINT: a float `exp(-λ·age)` could never be
    * oracle-gated (libm), whereas `shiftleft` is bit-identical in both
    * engines. The clamp floors ancient events at weight 1 (never 0 —
    * totals still count every event, and K bounds the scale factor so
    * `cents·2^K` summed stays far inside BIGINT: |cents| ≤ 10^7, 2^10
    * weight, 10^5 events/user → ≤ 10^15).
    *
    * Shape at scale: the reference instant is a 1-row global max —
    * computed once and cross-joined (broadcast of one row), never a
    * window; the score is then ONE map-side-combinable groupBy(user).
    * No ordered window anywhere, so the whole query is two exchanges
    * (the 1-row max and the user aggregate).
    */
  val HalfLifeUs: Long = 3L * 86400 * 1000000
  val DecayCap: Int = 10

  /** The decay score over any events relation carrying (user_id, ts
    * epoch-nanos BIGINT, value) — spec entry for the hand-exact weight
    * and recency-monotonicity laws.
    */
  private[graft] def decayOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val e = events
        .select($"user_id", expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      val tmax = e.agg(max($"ts_us").as("t_ref"))
      e.join(broadcast(tmax))
        .selectExpr("user_id", "cents",
          s"shiftleft(CAST(1 AS BIGINT), $DecayCap - CAST(least((t_ref - ts_us) DIV $HalfLifeUs, $DecayCap) AS INT)) AS w")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum($"w").cast("bigint").as("decay_score"),
          sum($"cents" * $"w").cast("bigint").as("decayed_cents"))
        .orderBy("user_id")
    }
  }

  val qDecayHalflife = Q(
    "q_decay_halflife",
    (spark, dir) => decayOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
tmax AS (SELECT max(ts_us) AS t_ref FROM e),
w AS (SELECT user_id, cents,
             (CAST(1 AS BIGINT) << ($DecayCap - least((t_ref - ts_us) // $HalfLifeUs, $DecayCap))) AS w
      FROM e CROSS JOIN tmax)
SELECT user_id, count(*) AS n_events,
       CAST(sum(w) AS BIGINT) AS decay_score,
       CAST(sum(cents * w) AS BIGINT) AS decayed_cents
FROM w GROUP BY user_id
ORDER BY user_id""")
  )

  /** Week-over-week revenue deltas — the trend line every revenue
    * dashboard opens with: weekly order revenue in cents, the previous
    * ACTIVE week's revenue (lag over existing weeks, not calendar
    * weeks — a gap week simply isn't a row, identically in both
    * engines), the signed delta, and the unsigned swing in floor-div
    * basis points of the prior week. The division is always
    * non-negative ÷ positive (a present week has ≥ 1 positively-priced
    * order), sidestepping the one cross-engine integer-division trap —
    * Spark's DIV truncates toward zero while DuckDB's // floors, which
    * differ exactly on negative operands.
    *
    * Shape at scale: the raw orders stream collapses map-side to one
    * row per epoch-week BEFORE any window; the lag then runs on a
    * |weeks|-row relation — a single-task window over ~400 rows is the
    * correct plan, not a skew smell (the partition is bounded by the
    * calendar, not the data volume).
    */
  /** The weekly-delta rollup over any orders relation — spec entry for
    * the hand-exact delta/direction laws.
    */
  private[graft] def wowOn(orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = orders.sparkSession
    locally {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val wk = orders
        .selectExpr(
          s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV $WeekUs AS week",
          "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents")
        .groupBy($"week")
        .agg(sum($"cents").cast("bigint").as("cents_w"))
      wk.withColumn("prev_w",
          lag($"cents_w", 1).over(Window.orderBy($"week")))
        .selectExpr("week", "cents_w",
          // null-free outputs: the driver's hash compare sorts rows by
          // value and cannot order NULLs, so the opening week reports
          // prev 0 / delta 0 / swing 0 under an explicit 'first' tag
          "coalesce(prev_w, CAST(0 AS BIGINT)) AS prev_cents",
          "coalesce(cents_w - prev_w, CAST(0 AS BIGINT)) AS delta_cents",
          "coalesce((10000 * abs(cents_w - prev_w)) DIV prev_w, CAST(0 AS BIGINT)) AS swing_bp",
          """CASE WHEN prev_w IS NULL THEN 'first'
                  WHEN cents_w > prev_w THEN 'up'
                  WHEN cents_w < prev_w THEN 'down'
                  ELSE 'flat' END AS direction""")
        .orderBy("week")
    }
  }

  val qWowDelta = Q(
    "q_wow_delta",
    (spark, dir) => wowOn(Tables.orders(spark, dir)),
    Some(s"""
WITH wk AS (SELECT epoch_us(o_orderdate) // $WeekUs AS week,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents_w
            FROM orders GROUP BY 1),
l AS (SELECT week, cents_w, lag(cents_w) OVER (ORDER BY week) AS prev_w FROM wk)
SELECT week, cents_w,
       CAST(coalesce(prev_w, 0) AS BIGINT) AS prev_cents,
       CAST(coalesce(cents_w - prev_w, 0) AS BIGINT) AS delta_cents,
       CAST(coalesce((10000 * abs(cents_w - prev_w)) // prev_w, 0) AS BIGINT) AS swing_bp,
       CASE WHEN prev_w IS NULL THEN 'first'
            WHEN cents_w > prev_w THEN 'up'
            WHEN cents_w < prev_w THEN 'down'
            ELSE 'flat' END AS direction
FROM l
ORDER BY week""")
  )

  /** Rolling 7-day distinct actives (DAU / WAU / stickiness) — the
    * retention dashboard's headline trio. Exact distincts, no sketch:
    * the trick is that a K-day rolling COUNT DISTINCT needs neither a
    * range window (count-distinct frames don't exist) nor a K-way
    * self-join — dedup to the user-day relation (input-linear, ONE
    * map-side-combinable shuffle), then explode each user-day onto the
    * K report days it supports (a constant K=7 fan-out of the ALREADY
    * tiny relation) and re-dedup per report day. At 100 TB the raw
    * stream is touched exactly once; everything after is user-day-sized.
    *
    * Report days are the days with activity (the spine join drops
    * phantom days past the corpus edge and would drop dead-quiet days
    * mid-corpus — a documented contract matching the dashboard's
    * "days with traffic" x-axis). stickiness_bp = 10000·DAU/WAU floor
    * division; all outputs BIGINT.
    */
  val RollDays: Int = 7

  /** DAU/WAU over any events relation carrying (user_id, ts epoch-nanos
    * BIGINT) — spec entry for the hand-window laws.
    */
  private[graft] def rollingDistinctOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    rollingDistinctOnUd(userDaysOn(events))

  private[graft] def rollingDistinctOnUd(ud: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = ud.sparkSession
    locally {
      import spark.implicits._
      val days = ud.select($"day_idx").distinct()
      val expand = ud
        .select($"day_idx", $"user_id",
          explode(sequence(lit(0), lit(RollDays - 1))).as("off"))
        .select(($"day_idx" + $"off").as("rday"), $"user_id")
      val wau = expand.join(days.withColumnRenamed("day_idx", "rday"), "rday")
        .groupBy($"rday".as("day_idx"))
        .agg(countDistinct($"user_id").as("wau"))
      val dau = ud.groupBy($"day_idx").agg(countDistinct($"user_id").as("dau"))
      dau.join(wau, "day_idx")
        .selectExpr("day_idx", "dau", "wau",
          "(10000 * dau) DIV wau AS stickiness_bp")
        .orderBy("day_idx")
    }
  }

  private val DayUs: Long = 86400L * 1000000

  /** The deduped (day_idx, user_id) activity relation — the shared
    * stage under the whole daily-actives family (rolling distinct,
    * new-vs-returning, streaks). Cached once per corpus so the raw
    * stream is scanned and deduped exactly once across the family's
    * seven references.
    */
  private[graft] def userDaysOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events
      .selectExpr(s"CAST(ts DIV ${1000L * DayUs} AS BIGINT) AS day_idx", "user_id")
      .distinct()

  private[graft] def userDayView(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    StageViews.ensureCached(spark, "user_day_v", dir) {
      userDaysOn(Tables.events(spark, dir))
    }

  val qRollingDistinct = Q(
    "q_rolling_distinct_users",
    (spark, dir) => rollingDistinctOnUd(userDayView(spark, dir)),
    Some(s"""
WITH ud AS (SELECT DISTINCT epoch_us(ts) // $DayUs AS day_idx, user_id FROM events),
days AS (SELECT DISTINCT day_idx FROM ud),
expand AS (SELECT ud.day_idx + o.off AS rday, ud.user_id
           FROM ud CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) o(off)),
wau AS (SELECT e.rday AS day_idx, count(DISTINCT e.user_id) AS wau
        FROM expand e JOIN days d ON e.rday = d.day_idx GROUP BY 1),
dau AS (SELECT day_idx, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
SELECT CAST(dau.day_idx AS BIGINT) AS day_idx,
       CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       (10000 * dau) // wau AS stickiness_bp
FROM dau JOIN wau ON dau.day_idx = wau.day_idx
ORDER BY day_idx""")
  )

  /** New vs returning actives — per day, how many of the day's distinct
    * users are first-ever-seen vs repeat, plus the cumulative reach
    * (total distinct users through that day). The growth-accounting
    * counterpart of [[qRollingDistinct]]: DAU splits exactly into
    * `new_users + returning`, and `cum_users` is the running sum of
    * first appearances — NOT a running distinct, because a user's
    * first day is unique by construction, which is what makes exact
    * cumulative reach linear.
    *
    * Shape at scale: user-day dedup (one combinable shuffle), a
    * per-user min (user-sized), two day-keyed aggregates, a broadcast
    * day join, and ONE unpartitioned running sum over the per-day
    * relation — calendar-bounded, the q_wow_delta whitelist argument.
    * The raw stream is read once.
    */
  private[graft] def newVsReturningOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    newVsReturningOnUd(userDaysOn(events))

  private[graft] def newVsReturningOnUd(ud: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = ud.sparkSession
    locally {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val dau = ud.groupBy($"day_idx").agg(count(lit(1)).as("dau"))
      val firsts = ud.groupBy($"user_id").agg(min($"day_idx").as("day_idx"))
        .groupBy($"day_idx").agg(count(lit(1)).as("new_users"))
      val cumW = Window.orderBy($"day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
      dau.join(broadcast(firsts), Seq("day_idx"), "left")
        .withColumn("new_users", coalesce($"new_users", lit(0L)))
        .withColumn("cum_users", sum($"new_users").over(cumW).cast("bigint"))
        .selectExpr("day_idx", "dau", "new_users",
          "dau - new_users AS returning", "cum_users")
        .orderBy("day_idx")
    }
  }

  val qNewVsReturning = Q(
    "q_new_vs_returning",
    (spark, dir) => newVsReturningOnUd(userDayView(spark, dir)),
    Some(s"""
WITH ud AS (SELECT DISTINCT epoch_us(ts) // $DayUs AS day_idx, user_id FROM events),
dau AS (SELECT day_idx, count(*) AS dau FROM ud GROUP BY 1),
firsts AS (SELECT day_idx, count(*) AS new_users
           FROM (SELECT user_id, min(day_idx) AS day_idx FROM ud GROUP BY 1)
           GROUP BY 1)
SELECT CAST(d.day_idx AS BIGINT) AS day_idx,
       CAST(dau AS BIGINT) AS dau,
       CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
       CAST(dau - coalesce(new_users, 0) AS BIGINT) AS returning,
       CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY d.day_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM dau d LEFT JOIN firsts f ON d.day_idx = f.day_idx
ORDER BY day_idx""")
  )

  /** Activity streaks — gaps-and-islands per user over active DAYS:
    * the length of each run of consecutive calendar days with
    * activity, the classic `day − row_number()` grouping trick (two
    * runs of consecutive days have constant, distinct differences).
    * Reported per user: active-day count, streak count, the longest
    * streak, and when it started (earliest start on a tie).
    *
    * Shape at scale: user-day dedup (one combinable shuffle), then
    * every window is PARTITIONED BY user_id — the island numbering,
    * the streak aggregate, and the longest-pick all cluster on the
    * same key, so Catalyst plans one Exchange for the whole chain.
    * Per-user day counts are calendar-bounded (≤ days in the corpus
    * span), so no partition can be hot.
    *
    * Determinism: islands are keyed by exact integer day differences;
    * the longest streak ties break to the EARLIEST start via a
    * min-over-filtered aggregate, not an ordering hint.
    */
  private[graft] def streaksOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    streaksOnUd(userDaysOn(events))

  private[graft] def streaksOnUd(ud: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = ud.sparkSession
    locally {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"day_idx")
      val isl = ud
        .withColumn("grp", $"day_idx" - row_number().over(byUser))
        .groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("len"), min($"day_idx").as("start_day"))
      isl
        .withColumn("longest",
          max($"len").over(Window.partitionBy($"user_id")))
        .groupBy($"user_id")
        .agg(
          sum($"len").cast("bigint").as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max($"len").as("longest_streak"),
          min(when($"len" === $"longest", $"start_day"))
            .as("longest_start_day"))
        .orderBy("user_id")
    }
  }

  val qActivityStreaks = Q(
    "q_activity_streaks",
    (spark, dir) => streaksOnUd(userDayView(spark, dir)),
    Some(s"""
WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day_idx FROM events),
isl AS (
  SELECT user_id, count(*) AS len, min(day_idx) AS start_day
  FROM (SELECT user_id, day_idx,
               day_idx - row_number() OVER (PARTITION BY user_id ORDER BY day_idx) AS grp
        FROM ud)
  GROUP BY user_id, grp
), mx AS (
  SELECT user_id, max(len) AS longest FROM isl GROUP BY 1
)
SELECT isl.user_id AS user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       count(*) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(min(CASE WHEN len = mx.longest THEN start_day END) AS BIGINT) AS longest_start_day
FROM isl JOIN mx ON isl.user_id = mx.user_id
GROUP BY isl.user_id
ORDER BY user_id""")
  )

  /** Buyer-lifecycle segmentation — every user bucketed against the
    * corpus's final [[RecencyDays]] days BY PURCHASE RECENCY: bought
    * recently and first bought recently → `new`; bought recently with
    * older purchase history → `active`; has purchase history but none
    * recent → `lapsed`; no purchase ever → `never`. The reference
    * instant is the corpus max EVENT day (all traffic, not just
    * purchases) — a 1-row broadcast, the q_decay_halflife shape, never
    * a window. RecencyDays = 2 because the driver corpus's users all
    * purchase within any longer horizon (the r11 vacuity lesson: a
    * catalog row must split non-trivially at the oracle scale — this
    * one lands 92/58 at sf0.01); all four arms stay pinned by the
    * spec's planted corpus.
    *
    * Shape at scale: purchase user-day dedup → per-user (first, last)
    * purchase aggregate (combinable, user-sized) → left join from the
    * distinct-user relation (user-sized, same key) → broadcast ref →
    * 4-key groupBy. Floor-bp shares of the full user base.
    */
  val RecencyDays: Long = 2L

  private[graft] def lifecycleOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val e = events.selectExpr("user_id", "event_type",
        s"CAST(ts DIV ${1000L * DayUs} AS BIGINT) AS day_idx")
      val buyers = e.where($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(min($"day_idx").as("first_buy"), max($"day_idx").as("last_buy"),
          countDistinct($"day_idx").as("n_buy_days"))
      val allu = e.select($"user_id").distinct()
      val ref = e.agg(max($"day_idx").as("ref_day"))
      val tot = allu.agg(count(lit(1)).as("n_total"))
      allu.join(buyers, Seq("user_id"), "left")
        .join(broadcast(ref)).join(broadcast(tot))
        .selectExpr("n_total",
          "coalesce(n_buy_days, 0) AS n_buy_days",
          s"""CASE WHEN last_buy IS NULL THEN 'never'
               WHEN last_buy >= ref_day - ${RecencyDays - 1}
               THEN CASE WHEN first_buy >= ref_day - ${RecencyDays - 1}
                         THEN 'new' ELSE 'active' END
               ELSE 'lapsed' END AS segment""")
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_users"),
          sum($"n_buy_days").cast("bigint").as("sum_buy_days"),
          max($"n_total").as("nt"))
        .selectExpr("segment", "n_users", "sum_buy_days",
          "(10000 * n_users) DIV nt AS share_bp")
        .orderBy("segment")
    }
  }

  val qLifecycle = Q(
    "q_lifecycle_segments",
    (spark, dir) => lifecycleOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) // $DayUs AS day_idx FROM events),
buyers AS (SELECT user_id, min(day_idx) AS first_buy, max(day_idx) AS last_buy,
                  count(DISTINCT day_idx) AS n_buy_days
           FROM e WHERE event_type = 'purchase' GROUP BY 1),
allu AS (SELECT DISTINCT user_id FROM e),
ref AS (SELECT max(day_idx) AS ref_day FROM e),
tot AS (SELECT count(*) AS n_total FROM allu),
seg AS (SELECT CASE WHEN last_buy IS NULL THEN 'never'
                    WHEN last_buy >= ref_day - ${RecencyDays - 1}
                    THEN CASE WHEN first_buy >= ref_day - ${RecencyDays - 1}
                              THEN 'new' ELSE 'active' END
                    ELSE 'lapsed' END AS segment,
               coalesce(n_buy_days, 0) AS n_buy_days, n_total
        FROM allu LEFT JOIN buyers ON allu.user_id = buyers.user_id
        CROSS JOIN ref CROSS JOIN tot)
SELECT segment, count(*) AS n_users,
       CAST(sum(n_buy_days) AS BIGINT) AS sum_buy_days,
       (10000 * count(*)) // max(n_total) AS share_bp
FROM seg
GROUP BY 1
ORDER BY segment""")
  )

  /** Time-weighted average value (TWAP) per user — the step-function
    * integral a plain mean gets wrong: each observation HOLDS until
    * the next one, so a value held for ten hours weighs 3600× one
    * held for ten seconds. The metric behind TWAP pricing, sensor
    * duty-cycle averages, and state-dwell analysis.
    *
    * Exact integers throughout: value as cents, holding durations in
    * µs from ONE user-partitioned lead pass, the integral as
    * Σ cents·dur (bounded: Σ dur ≤ the corpus time span in µs and cents ≤ ~5·10⁴
    * on this schema, so the per-user integral stays far inside BIGINT), and the average as the
    * floor quotient. The LAST observation of a user has no holding
    * period and is excluded from the integral — the standard
    * right-open convention, pinned by the spec (a user with a single
    * event emits no row rather than a fake zero-duration average).
    *
    * Shape: one window + one combinable groupBy, both on user_id —
    * one Exchange total.
    */
  private[graft] def twapOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      events
        .selectExpr("user_id", "event_id", "CAST(ts DIV 1000 AS BIGINT) AS ts_us",
          "CAST(round(value * 100, 0) AS BIGINT) AS cents")
        .withColumn("dur_us", lead($"ts_us", 1).over(byUser) - $"ts_us")
        .where($"dur_us".isNotNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_holds"),
          sum($"dur_us").cast("bigint").as("total_dur_us"),
          sum($"cents" * $"dur_us").cast("bigint").as("weighted"))
        .selectExpr("user_id", "n_holds", "total_dur_us",
          "weighted DIV total_dur_us AS twap_cents")
        .orderBy("user_id")
    }
  }

  val qTwap = Q(
    "q_twap_value",
    (spark, dir) => twapOn(Tables.events(spark, dir)),
    Some("""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
h AS (SELECT user_id, cents,
             lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS dur_us
      FROM e)
SELECT user_id, count(*) AS n_holds,
       CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
       CAST(sum(cents * dur_us) AS BIGINT) // CAST(sum(dur_us) AS BIGINT) AS twap_cents
FROM h
WHERE dur_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id""")
  )

  val all: Seq[Q] =
    Seq(qGapFill, qRangeFrame, qCohortRetention, qDecayHalflife, qWowDelta,
      qRollingDistinct, qNewVsReturning, qActivityStreaks, qLifecycle, qTwap)
}
