package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral sequence analytics over the event stream: the next-event
  * transition matrix and conversion-journey touch attribution. Both are
  * the "what do users do next / what led to the purchase" questions a
  * product-analytics warehouse answers daily, and both are shaped the
  * same way at scale: ONE user-partitioned ordered window pass over the
  * raw stream (per-user row counts are bounded by construction — a user
  * is a session-scale entity, not a corpus-scale one), then aggregates
  * over relations that are already orders of magnitude smaller than the
  * input (|types|² transition cells, one row per conversion journey).
  * Every derived column is integer or string, so the DuckDB oracle
  * hash-matches bit-for-bit.
  */
object Behavior {

  /** Markov next-event transition matrix — for every ordered pair of
    * event types, how often type A is immediately followed by type B
    * within the same user's stream, with the row-conditional
    * probability in floor-division basis points.
    *
    * Shape at scale: `lead` needs one shuffle on user_id (the window
    * partition); the transition groupBy then collapses the stream to at
    * most |types|² cells map-side before the (tiny) final exchange, and
    * the per-prev-type totals are a |types|-row relation joined back by
    * an explicit broadcast. Nothing downstream of the window ever
    * re-touches the raw stream.
    *
    * Determinism: successor order is the total order (ts_us, event_id)
    * — event_id breaks timestamp ties — and share_bp is exact integer
    * floor division of non-negative values (identical semantics for
    * Spark's DIV and DuckDB's //).
    */
  /** The transition matrix over any events relation carrying
    * (user_id, ts epoch-nanos BIGINT, event_id, event_type) — spec
    * entry for the hand-computed-matrix law; the catalog query binds
    * the driver table.
    */
  private[graft] def transitionsOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val e = events
        .select($"user_id", expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          $"event_id", $"event_type")
      val nx = e.withColumn("next_type",
        lead($"event_type", 1).over(
          Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")))
      val t = nx.where($"next_type".isNotNull)
        .groupBy($"event_type".as("prev_type"), $"next_type")
        .agg(count(lit(1)).as("n"))
      val tot = t.groupBy($"prev_type".as("pt"))
        .agg(sum($"n").cast("bigint").as("tn"))
      t.join(broadcast(tot), $"prev_type" === $"pt")
        .selectExpr("prev_type", "next_type", "n",
          "(10000 * n) DIV tn AS share_bp")
        .orderBy("prev_type", "next_type")
    }
  }

  val qEventTransitions = Q(
    "q_event_transitions",
    (spark, dir) => transitionsOn(Tables.events(spark, dir)),
    Some("""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
nx AS (SELECT event_type AS prev_type,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_type
       FROM e),
t AS (SELECT prev_type, next_type, count(*) AS n
      FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT prev_type AS pt, CAST(sum(n) AS BIGINT) AS tn FROM t GROUP BY 1)
SELECT prev_type, next_type, n, (10000 * n) // tn AS share_bp
FROM t JOIN tot ON t.prev_type = tot.pt
ORDER BY prev_type, next_type""")
  )

  /** First-touch / last-touch attribution — for every purchase, the
    * earliest and latest preceding touch ('view' or 'click') within the
    * same conversion journey. A journey is the span since the user's
    * previous purchase: the running purchase count over STRICTLY
    * preceding rows numbers each row's journey, so every touch belongs
    * to exactly one upcoming purchase (or to the tail journey that
    * never converts, which the join drops).
    *
    * Shape at scale: the journey numbering and both touch row_numbers
    * run over the SAME (user_id)-partitioned (ts_us, event_id)-ordered
    * window, so Catalyst plans one Exchange + one Sort for all three;
    * the touch aggregate reduces to one row per (user, journey) before
    * the join, and the purchase side is filtered first — the join is
    * journey-sized × purchase-sized, never event-sized.
    *
    * Determinism: total order (ts_us, event_id); the aggregate picks
    * rn=1 rows via max-of-CASE (exact, no min_by cross-engine
    * subtleties). Touchless purchases emit -1/'' sentinels rather than
    * NULLs — the driver's hash compare sorts rows by value and cannot
    * order NULLs — under an exact n_touches = 0.
    */
  /** Attribution over any events relation (same contract as
    * [[transitionsOn]]) — spec entry for the journey-partition laws.
    */
  private[graft] def attributionOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val e = events
        .select($"user_id", expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          $"event_id", $"event_type")
      val ord = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val j = e.withColumn("journey",
        coalesce(
          sum(when($"event_type" === "purchase", 1L).otherwise(0L))
            .over(ord.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val touches = j.where($"event_type".isin("view", "click"))
        .withColumn("rn_first", row_number().over(
          Window.partitionBy($"user_id", $"journey").orderBy($"ts_us", $"event_id")))
        .withColumn("rn_last", row_number().over(
          Window.partitionBy($"user_id", $"journey").orderBy($"ts_us".desc, $"event_id".desc)))
      val tagg = touches.groupBy($"user_id".as("tu"), $"journey".as("tj"))
        .agg(count(lit(1)).as("tn"),
          max(when($"rn_first" === 1, $"event_id")).as("first_touch_id"),
          max(when($"rn_first" === 1, $"event_type")).as("first_touch_type"),
          max(when($"rn_last" === 1, $"event_id")).as("last_touch_id"),
          max(when($"rn_last" === 1, $"event_type")).as("last_touch_type"))
      j.where($"event_type" === "purchase")
        .select($"user_id", $"journey", $"event_id".as("purchase_id"),
          $"ts_us".as("purchase_ts_us"))
        .join(tagg, $"user_id" === $"tu" && $"journey" === $"tj", "left")
        .select($"purchase_id", $"user_id", $"purchase_ts_us",
          coalesce($"tn", lit(0L)).as("n_touches"),
          coalesce($"first_touch_id", lit(-1L)).as("first_touch_id"),
          coalesce($"first_touch_type", lit("")).as("first_touch_type"),
          coalesce($"last_touch_id", lit(-1L)).as("last_touch_id"),
          coalesce($"last_touch_type", lit("")).as("last_touch_type"))
        .orderBy("purchase_id")
    }
  }

  val qAttribution = Q(
    "q_attribution_touch",
    (spark, dir) => attributionOn(Tables.events(spark, dir)),
    Some("""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
j AS (SELECT *,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS journey
      FROM e),
touches AS (SELECT *,
                   row_number() OVER (PARTITION BY user_id, journey ORDER BY ts_us, event_id) AS rn_first,
                   row_number() OVER (PARTITION BY user_id, journey ORDER BY ts_us DESC, event_id DESC) AS rn_last
            FROM j WHERE event_type IN ('view', 'click')),
tagg AS (SELECT user_id AS tu, journey AS tj, count(*) AS tn,
                max(CASE WHEN rn_first = 1 THEN event_id END) AS first_touch_id,
                max(CASE WHEN rn_first = 1 THEN event_type END) AS first_touch_type,
                max(CASE WHEN rn_last = 1 THEN event_id END) AS last_touch_id,
                max(CASE WHEN rn_last = 1 THEN event_type END) AS last_touch_type
         FROM touches GROUP BY 1, 2)
SELECT p.event_id AS purchase_id, p.user_id, p.ts_us AS purchase_ts_us,
       CAST(coalesce(t.tn, 0) AS BIGINT) AS n_touches,
       coalesce(t.first_touch_id, -1) AS first_touch_id,
       coalesce(t.first_touch_type, '') AS first_touch_type,
       coalesce(t.last_touch_id, -1) AS last_touch_id,
       coalesce(t.last_touch_type, '') AS last_touch_type
FROM (SELECT * FROM j WHERE event_type = 'purchase') p
LEFT JOIN tagg t ON p.user_id = t.tu AND p.journey = t.tj
ORDER BY purchase_id""")
  )

  /** Ordered journey-path strings — each user's first [[PathLen]]
    * event types joined into one `a>b>c` path, the relation a funnel/
    * journey-mining layer groups on ("which opening paths convert?").
    * Emitted per user with the path's length and a count of how many
    * users share the identical opening path (the mining step itself).
    *
    * Determinism: the kept prefix is the total order (ts_us, event_id)
    * head; Spark builds the string via sort_array over collected
    * (ts_us, event_id, type) structs — array_sort on structs is
    * lexicographic over the leading total-order fields, so the
    * concatenation order is exact, never partition order — and DuckDB
    * states the same with `string_agg(... ORDER BY ts_us, event_id)`.
    *
    * Shape at scale: the rank filter and the collect share one
    * user-partitioned exchange; collect_list holds ≤ [[PathLen]]
    * structs per user (bounded state, unlike an uncapped collect); the
    * path-popularity count is a map-side-combinable groupBy over the
    * already-reduced per-user relation.
    */
  val PathLen = 8

  private[graft] def pathsOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val e = events
        .select($"user_id", expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          $"event_id", $"event_type")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")))
        .where($"rn" <= PathLen)
      val per = e.groupBy($"user_id")
        .agg(count(lit(1)).as("path_len"),
          array_join(
            expr("transform(array_sort(collect_list(struct(ts_us, event_id, event_type))), x -> x.event_type)"),
            ">").as("path"))
      val pop = per.groupBy($"path".as("p")).agg(count(lit(1)).as("n_users_same_path"))
      per.join(pop, $"path" === $"p")
        .select($"user_id", $"path_len", $"path", $"n_users_same_path")
        .orderBy("user_id")
    }
  }

  val qEventPaths = Q(
    "q_event_paths",
    (spark, dir) => pathsOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
per AS (SELECT user_id, count(*) AS path_len,
               string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        FROM e WHERE rn <= $PathLen GROUP BY user_id),
pop AS (SELECT path AS p, count(*) AS n_users_same_path FROM per GROUP BY path)
SELECT user_id, path_len, path, n_users_same_path
FROM per JOIN pop ON per.path = pop.p
ORDER BY user_id""")
  )

  /** Per-user modal event type — the exact MODE aggregate (absent from
    * both engines' portable surface) stated as a deterministic
    * rank-1-of-counts: ties break toward the lexicographically
    * smallest type, so the answer is unique by construction. Two
    * map-side-combinable aggregates ((user, type) counts, then per-user
    * total) and one rank window over the ALREADY-REDUCED counts
    * relation — the window input is |users|·|types| rows, never the
    * event stream. share_bp is exact floor division.
    */
  private[graft] def modeOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val c = events.groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("c"))
      val tot = c.groupBy($"user_id".as("tu"))
        .agg(sum($"c").cast("bigint").as("n_events"))
      c.withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"c".desc, $"event_type")))
        .where($"rn" === 1)
        .join(tot, $"user_id" === $"tu")
        .selectExpr("user_id", "event_type AS modal_type", "c AS modal_count",
          "n_events", "(10000 * c) DIV n_events AS share_bp")
        .orderBy("user_id")
    }
  }

  val qModalType = Q(
    "q_modal_event_type",
    (spark, dir) => modeOn(Tables.events(spark, dir)),
    Some("""
WITH c AS (SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY 1, 2),
tot AS (SELECT user_id AS tu, CAST(sum(c) AS BIGINT) AS n_events FROM c GROUP BY 1),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY c DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type AS modal_type, c AS modal_count, n_events,
       (10000 * c) // n_events AS share_bp
FROM r JOIN tot ON r.user_id = tot.tu
WHERE rn = 1
ORDER BY user_id""")
  )

  /** Opening-path conversion rates — the question journey mining
    * exists to answer: for each distinct opening path (the first
    * [[PathLen]] event types), how many users later convert? A user
    * converts when they purchase AFTER the opening window (rn >
    * PathLen) — conversion inside the window would be readable off the
    * path string itself and the rate would degenerate to 0/10000.
    *
    * Shape at scale: one user-partitioned rank pass (shared exchange
    * with the path build), the bounded path collect, a per-user
    * boolean aggregate, and one groupBy over the |distinct paths|
    * relation — every stage after the rank is user- or path-sized.
    */
  private[graft] def pathConversionOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val e = events
        .select($"user_id", expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          $"event_id", $"event_type")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")))
      val per = e.where($"rn" <= PathLen)
        .groupBy($"user_id")
        .agg(array_join(
          expr("transform(array_sort(collect_list(struct(ts_us, event_id, event_type))), x -> x.event_type)"),
          ">").as("path"))
      val conv = e.groupBy($"user_id".as("cu"))
        .agg(max(when($"rn" > PathLen && $"event_type" === "purchase", 1L)
          .otherwise(0L)).as("converted"))
      per.join(conv, $"user_id" === $"cu")
        .groupBy($"path")
        .agg(count(lit(1)).as("n_users"),
          sum($"converted").cast("bigint").as("n_converted"))
        .selectExpr("path", "n_users", "n_converted",
          "(10000 * n_converted) DIV n_users AS cvr_bp")
        .orderBy("path")
    }
  }

  val qPathConversion = Q(
    "q_path_conversion",
    (spark, dir) => pathConversionOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
per AS (SELECT user_id, string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        FROM e WHERE rn <= $PathLen GROUP BY user_id),
conv AS (SELECT user_id AS cu,
                max(CASE WHEN rn > $PathLen AND event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
         FROM e GROUP BY user_id)
SELECT path, count(*) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       (10000 * CAST(sum(converted) AS BIGINT)) // count(*) AS cvr_bp
FROM per JOIN conv ON per.user_id = conv.cu
GROUP BY path
ORDER BY path""")
  )

  /** Event debouncing/throttling — the dedupe-in-time cleaning pass a
    * clickstream pipeline runs before counting anything: an event is
    * NOISE when it repeats the same (user, type) within
    * [[DebounceUs]] of the PREVIOUS RAW event (lag semantics — the
    * deterministic, windowable spelling; keep-chain debouncing, where
    * the clock resets only on kept events, is inherently sequential
    * state and lives in the transformWithState family instead).
    * Reported per event type: raw count, kept count, dropped share.
    *
    * One (user, type)-partitioned lag pass, then a map-side-combinable
    * rollup to |types| rows.
    */
  val DebounceUs: Long = 60L * 1000000

  private[graft] def debounceOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val e = events
        .select($"user_id", expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"),
          $"event_id", $"event_type")
        .withColumn("prev_ts", lag($"ts_us", 1).over(
          Window.partitionBy($"user_id", $"event_type").orderBy($"ts_us", $"event_id")))
        .withColumn("kept",
          when($"prev_ts".isNull || $"ts_us" - $"prev_ts" > DebounceUs, 1L).otherwise(0L))
      e.groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"kept").cast("bigint").as("n_kept"))
        .selectExpr("event_type", "n_events", "n_kept",
          "(10000 * (n_events - n_kept)) DIV n_events AS dropped_bp")
        .orderBy("event_type")
    }
  }

  val qDebounce = Q(
    "q_event_debounce",
    (spark, dir) => debounceOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                          ORDER BY epoch_us(ts), event_id) AS prev_ts
           FROM events),
k AS (SELECT event_type,
             CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > $DebounceUs THEN 1 ELSE 0 END AS kept
      FROM e)
SELECT event_type, count(*) AS n_events,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       (10000 * (count(*) - CAST(sum(kept) AS BIGINT))) // count(*) AS dropped_bp
FROM k GROUP BY event_type
ORDER BY event_type""")
  )

  /** Time-to-conversion histogram — hours from a user's FIRST view to
    * their FIRST subsequent purchase, bucketed by whole hours. The
    * funnel-latency curve every growth team reads ("most conversions
    * happen within N hours"). Users whose first purchase precedes any
    * view (gift codes, imported accounts) are excluded — a documented
    * contract, not silent loss: the n_users total plus the excluded
    * count is pinned by the spec's partition law.
    *
    * Shape at scale: ONE map-side-combinable groupBy(user) computing
    * both conditional mins, a filter, and a second combinable groupBy
    * on the hour bucket (calendar-bounded key space). No windows, no
    * joins — two exchanges total, the second one tiny.
    */
  private[graft] def timeToConvertOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      events
        .selectExpr("user_id", "event_type",
          "CAST(ts DIV 1000 AS BIGINT) AS ts_us")
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", $"ts_us")).as("first_view"),
          min(when($"event_type" === "purchase", $"ts_us")).as("first_purchase"))
        .where($"first_view".isNotNull && $"first_purchase".isNotNull &&
          $"first_purchase" >= $"first_view")
        .selectExpr(s"(first_purchase - first_view) DIV ${3600L * 1000000} AS latency_h")
        .groupBy($"latency_h")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("latency_h")
    }
  }

  val qTimeToConvert = Q(
    "q_time_to_convert",
    (spark, dir) => timeToConvertOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
f AS (SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts_us END) AS first_purchase
      FROM e GROUP BY 1)
SELECT (first_purchase - first_view) // ${3600L * 1000000} AS latency_h,
       count(*) AS n_users
FROM f
WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
  AND first_purchase >= first_view
GROUP BY 1
ORDER BY latency_h""")
  )

  /** Bot-cadence screen — per user, the MEDIAN inter-event gap and its
    * MAD (both exact rank-picked integers, the q_mad_outliers
    * discipline: no float moments, no interpolation), with the
    * `metronomic` verdict MAD·10 < median: humans are bursty (MAD on
    * the order of the median), schedulers and replay bots tick (MAD
    * near zero at any median). Gaps are whole seconds.
    *
    * Shape at scale: gaps from one user-partitioned lag window; both
    * medians from rank windows over the SAME user partitioning —
    * Catalyst plans one Exchange for the chain (per-user row counts
    * are session-scale, never corpus-scale). Output is user-sized.
    */
  private[graft] def cadenceOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val gaps = events
        .selectExpr("user_id", "event_id", "CAST(ts DIV 1000 AS BIGINT) AS ts_us")
        .withColumn("prev", lag($"ts_us", 1).over(byUser))
        .where($"prev".isNotNull)
        .selectExpr("user_id", "(ts_us - prev) DIV 1000000 AS gap_s")
      // exact discrete median: rank the gaps, pick ⌈n/2⌉ (lower median)
      val gw = Window.partitionBy($"user_id").orderBy($"gap_s")
      val med = gaps
        .withColumn("rk", row_number().over(gw))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"user_id")))
        .where($"rk" === expr("(n + 1) DIV 2"))
        .select($"user_id", $"gap_s".as("median_gap_s"), $"n".as("n_gaps"))
      val dev = gaps.join(med, "user_id")
        .select($"user_id", $"n_gaps", $"median_gap_s",
          abs($"gap_s" - $"median_gap_s").as("dev"))
      val dw = Window.partitionBy($"user_id").orderBy($"dev")
      dev
        .withColumn("rk", row_number().over(dw))
        .where($"rk" === expr("(n_gaps + 1) DIV 2"))
        .select($"user_id", $"n_gaps", $"median_gap_s",
          $"dev".as("mad_gap_s"),
          ($"dev" * 10 < $"median_gap_s").as("metronomic"))
        .orderBy("user_id")
    }
  }

  val qBotCadence = Q(
    "q_bot_cadence",
    (spark, dir) => cadenceOn(Tables.events(spark, dir)),
    Some("""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
g AS (SELECT user_id,
             (ts_us - lag(ts_us) OVER w) // 1000000 AS gap_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
gaps AS (SELECT user_id, gap_s FROM g WHERE gap_s IS NOT NULL),
med AS (SELECT user_id, gap_s AS median_gap_s, n AS n_gaps
        FROM (SELECT user_id, gap_s,
                     row_number() OVER (PARTITION BY user_id ORDER BY gap_s) AS rk,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM gaps)
        WHERE rk = (n + 1) // 2),
dev AS (SELECT g.user_id, m.n_gaps, m.median_gap_s,
               abs(g.gap_s - m.median_gap_s) AS dev
        FROM gaps g JOIN med m ON g.user_id = m.user_id)
SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
       median_gap_s, dev AS mad_gap_s,
       dev * 10 < median_gap_s AS metronomic
FROM (SELECT user_id, n_gaps, median_gap_s, dev,
             row_number() OVER (PARTITION BY user_id ORDER BY dev) AS rk
      FROM dev)
WHERE rk = (n_gaps + 1) // 2
ORDER BY user_id""")
  )

  val all: Seq[Q] =
    Seq(qEventTransitions, qAttribution, qEventPaths, qModalType,
      qPathConversion, qDebounce, qTimeToConvert, qBotCadence)
}
