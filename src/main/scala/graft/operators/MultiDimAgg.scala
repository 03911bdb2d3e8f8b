package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multi-dimensional aggregation surface: rollup hierarchies, pivot,
  * and Spark's native session_window (the declarative alternative to
  * the reference's hand-rolled stateful sessions).
  *
  * Scale: rollup/pivot are single-pass hash aggregates (rollup expands
  * grouping sets map-side); session_window is a gap-merge aggregation
  * clustering on the user key — same single shuffle as q_sessionize.
  */
object MultiDimAgg {

  private val revCents =
    "CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"

  /** Rollup over the region→nation hierarchy; grouping nulls are
    * coalesced to 'ALL' so cross-engine null-ordering never matters.
    */
  val qRollup = Q(
    "q_rollup_revenue",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg((sum(expr(revCents)) / 10000.0).as("revenue"), count(lit(1)).as("n_items"))
        .select(
          coalesce($"r_name", lit("ALL")).as("region"),
          coalesce($"n_name", lit("ALL")).as("nation"),
          $"revenue", $"n_items")
        .orderBy("region", "nation")
    },
    Some(s"""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       CAST(sum($revCents) AS BIGINT) / 10000.0 AS revenue, count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation""")
  )

  /** Pivot: events per (user bucket) × event_type, fixed pivot values so
    * columns are stable; oracle is the CASE-sum spelling.
    */
  val qPivot = Q(
    "q_pivot_event_types",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("bucket", $"user_id" % 10)
        .groupBy($"bucket")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("bucket")
    },
    Some("""SELECT user_id % 10 AS bucket,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id % 10 ORDER BY bucket""")
  )

  /** Native session_window gap-merge (30 min), equivalent to the
    * hand-rolled lag/cumsum sessionization — the oracle derives session
    * bounds the manual way; end = last event + gap per Spark semantics.
    *
    * Boundary semantics: Spark's session merge treats the window as
    * CLOSED at start+gap for merging — an event exactly gap-separated
    * from its predecessor is merged into the same session (proved on an
    * exact-boundary fixture in ExtensionOpsSpec), so the oracle's
    * new-session predicate is strict `> gap`.
    */
  val qSessionWindow = Q(
    "q_session_window",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .selectExpr("user_id", "CAST(ts DIV 1000 AS BIGINT) AS ts_us",
          "timestamp_micros(CAST(ts DIV 1000 AS BIGINT)) AS event_time")
        .groupBy($"user_id", session_window($"event_time", "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .selectExpr("user_id",
          "unix_micros(session_window.start) AS session_start_us",
          "unix_micros(session_window.end) AS session_end_us",
          "n_events")
        .orderBy("user_id", "session_start_us")
    },
    Some(s"""WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > ${Sessionize.GapUs}
                 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts_us) AS session_start_us,
       max(ts_us) + ${Sessionize.GapUs} AS session_end_us,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start_us""")
  )

  /** Discrete percentiles (p50/p90/p99) per group via row_number — the
    * element-picking formulation is integer-deterministic across
    * engines, unlike interpolated quantiles whose fp path differs.
    */
  val qPercentiles = Q(
    "q_percentiles_disc",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
      val ranked = Tables.events(spark, dir)
        .select($"event_type", $"value", $"event_id")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      def pick(p: Double, name: String) =
        max(when($"rn" === ceil(lit(p) * $"n").cast("int"), $"value")).as(name)
      ranked.groupBy($"event_type")
        .agg(pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99"))
        .orderBy($"event_type")
    },
    Some("""WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS INT) THEN value END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS INT) THEN value END) AS p90,
       max(CASE WHEN rn = CAST(ceil(0.99 * n) AS INT) THEN value END) AS p99
FROM ranked GROUP BY event_type ORDER BY event_type""")
  )

  /** Robust outlier detection via MAD — median absolute deviation, the
    * robust-statistics replacement for z-scores (one fat-fingered
    * value shifts a mean and stddev arbitrarily; it moves a median by
    * at most one rank). Per event type: the discrete median of cents,
    * the discrete median of absolute deviations from it, and how many
    * events sit beyond 3×MAD. Every statistic is an ELEMENT of the
    * data picked by rank ([[qPercentiles]]' technique) — integer-exact
    * in both engines, no interpolation, no float moments.
    *
    * Shape at scale: two (event_type)-partitioned rank passes (the
    * second over deviations needs the first's median — joined back as
    * a |types|-row broadcast) and one map-side-combinable rollup.
    */
  val MadK = 3L

  private[graft] def madOutliersOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val e = events.select($"event_type", $"event_id",
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      def medianOf(df: org.apache.spark.sql.DataFrame, valueCol: String, out: String) = {
        val w = Window.partitionBy($"event_type").orderBy(col(valueCol), $"event_id")
        df.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
          .groupBy($"event_type")
          .agg(max(when($"rn" === ceil(lit(0.5) * $"n").cast("int"), col(valueCol))).as(out))
      }
      val med = medianOf(e, "cents", "med_cents")
        .select($"event_type".as("mt"), $"med_cents")
      val dev = e.join(broadcast(med), $"event_type" === $"mt")
        .select($"event_type", $"event_id", $"cents", $"med_cents",
          abs($"cents" - $"med_cents").as("dev"))
      val mad = medianOf(dev, "dev", "mad_cents")
        .select($"event_type".as("dt"), $"mad_cents")
      dev.join(broadcast(mad), $"event_type" === $"dt")
        .groupBy($"event_type", $"med_cents", $"mad_cents")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"dev" > $"mad_cents" * MadK, 1L).otherwise(0L))
            .cast("bigint").as("n_outliers"))
        .selectExpr("event_type", "n_events", "med_cents", "mad_cents",
          "n_outliers", "(10000 * n_outliers) DIV n_events AS outlier_bp")
        .orderBy("event_type")
    }
  }

  val qMadOutliers = Q(
    "q_mad_outliers",
    (spark, dir) => madOutliersOn(Tables.events(spark, dir)),
    Some(s"""
WITH e AS (SELECT event_type, event_id,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n
       FROM e),
med AS (SELECT event_type AS mt,
               max(CASE WHEN rn = CAST(ceil(0.5 * n) AS INT) THEN cents END) AS med_cents
        FROM r1 GROUP BY 1),
dev AS (SELECT e.event_type, e.event_id, e.cents, med.med_cents,
               abs(e.cents - med.med_cents) AS dev
        FROM e JOIN med ON e.event_type = med.mt),
r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n
       FROM dev),
mad AS (SELECT event_type AS dt,
               max(CASE WHEN rn = CAST(ceil(0.5 * n) AS INT) THEN dev END) AS mad_cents
        FROM r2 GROUP BY 1)
SELECT dev.event_type, count(*) AS n_events, dev.med_cents, mad.mad_cents,
       CAST(sum(CASE WHEN dev.dev > $MadK * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       (10000 * CAST(sum(CASE WHEN dev.dev > $MadK * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS outlier_bp
FROM dev JOIN mad ON dev.event_type = mad.dt
GROUP BY dev.event_type, dev.med_cents, mad.mad_cents
ORDER BY dev.event_type""")
  )

  /** CUBE over (returnflag, linestatus): all four grouping sets in one
    * map-side-expanded hash aggregate — completes the grouping-set
    * family next to ROLLUP (the reference has neither; SURVEY §2.4).
    */
  val qCube = Q(
    "q_cube_pricing",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(
          (sum(expr("CAST(round(l_quantity * 100, 0) AS BIGINT)")) / 100.0).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"sum_qty", $"n_items")
        .orderBy("returnflag", "linestatus")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
       count(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus""")
  )

  /** INTERSECT / EXCEPT (distinct set semantics) — the set-op family
    * beyond UNION: users active in BOTH halves of the event window vs
    * only the first half. One shuffle per set op on the distinct key.
    */
  val qSetOps = Q(
    "q_set_ops_users",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .selectExpr("user_id", "event_id % 2 = 0 AS first_half")
      val a = ev.filter($"first_half").select($"user_id")
      val b = ev.filter(!$"first_half").select($"user_id")
      // three distributed set-op aggregations; only the three scalar
      // counts cross to the driver (not a data collect), composed into
      // the single summary row the oracle states
      val both = a.intersect(b).count()
      val onlyA = a.except(b).count()
      val onlyB = b.except(a).count()
      Seq((both, onlyA, onlyB)).toDF("n_both", "n_only_first", "n_only_second")
    },
    Some("""WITH a AS (SELECT user_id FROM events WHERE event_id % 2 = 0),
b AS (SELECT user_id FROM events WHERE event_id % 2 <> 0)
SELECT (SELECT count(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)) AS n_both,
       (SELECT count(*) FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)) AS n_only_first,
       (SELECT count(*) FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM a)) AS n_only_second
ORDER BY n_both""")
  )

  /** The SAME session aggregation through Structured Streaming: file
    * stream over the events table → session_window groupBy with a
    * watermark → COMPLETE mode → AvailableNow. Session windows reject
    * update mode (Spark 4.1, STREAMING_OUTPUT_MODE.UNSUPPORTED), and
    * append would withhold each user's final session (its end lies
    * beyond the last watermark), so complete mode is the one spelling
    * whose output equals the batch result — which is why the batch
    * lag/cumsum oracle applies verbatim. Cross-batch session MERGING is
    * pinned separately by ExtensionOpsSpec's exact-boundary fixture.
    * Streaming surface proven: session state store, watermark plumbing,
    * gap-merge operator under IncrementalExecution.
    */
  val qSessionWindowStream = Q(
    "q_session_window_stream",
    (spark, dir) => graft.GraftSession.withStreamingShuffle(spark,
      graft.GraftSession.adaptiveStreamParts(spark, dir), noDataBatch = false) {
      import spark.implicits._
      val events = Tables.eventsStream(spark, dir)
      val sinkName = graft.GraftSession.newSinkName(spark, "session_stream")
      val q = events
        .selectExpr("user_id",
          "timestamp_micros(CAST(ts DIV 1000 AS BIGINT)) AS event_time")
        .withWatermark("event_time", "0 seconds")
        .groupBy($"user_id", session_window($"event_time", "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .selectExpr("user_id",
          "unix_micros(session_window.start) AS session_start_us",
          "unix_micros(session_window.end) AS session_end_us",
          "n_events")
        .writeStream.outputMode("complete")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sinkName).orderBy("user_id", "session_start_us")
    },
    qSessionWindow.oracle)

  /** Explicit GROUPING SETS (the general form rollup/cube specialize)
    * plus `grouping_id()` to disambiguate which set produced a row —
    * a data NULL and a grouping NULL are distinguishable only through
    * it. Sets: (mktsegment), (orderpriority), and grand total. One
    * map-side expansion, one shuffle — same cost shape as rollup.
    */
  val qGroupingSets = Q(
    "q_grouping_sets",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
        .groupingSets(
          Seq(Seq($"c_mktsegment"), Seq($"o_orderpriority"), Seq()),
          $"c_mktsegment", $"o_orderpriority")
        .agg(
          grouping_id().cast("bigint").as("gid"),
          count(lit(1)).as("n"),
          (sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")) / 100.0)
            .as("total_price"))
        .select(
          coalesce($"c_mktsegment", lit("ALL")).as("segment"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"gid", $"n", $"total_price")
        .orderBy("gid", "segment", "priority")
    },
    Some("""
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(grouping(c_mktsegment) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
ORDER BY gid, segment, priority""")
  )

  /** Unpivot (wide→long melt), proving pivot's inverse: per-segment
    * conditional counts widened to 3 metric columns, then melted back
    * to (segment, metric, n) rows. Spark's native `unpivot` plans as a
    * generator expand (×3 per row, no shuffle); the oracle restates the
    * melt as UNION ALL of the conditional aggregates.
    */
  val qUnpivot = Q(
    "q_unpivot_order_stats",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment".as("segment"))
        .agg(
          sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when($"o_orderstatus" === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when($"o_orderstatus" === "P", 1L).otherwise(0L)).as("n_p"))
        .unpivot(Array($"segment"), Array($"n_f", $"n_o", $"n_p"), "metric", "n")
        .orderBy("segment", "metric")
    },
    Some("""
WITH w AS (SELECT c_mktsegment AS segment,
                  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f,
                  sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_o,
                  sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_p
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment)
SELECT segment, metric, CAST(n AS BIGINT) AS n FROM (
  SELECT segment, 'n_f' AS metric, n_f AS n FROM w
  UNION ALL SELECT segment, 'n_o', n_o FROM w
  UNION ALL SELECT segment, 'n_p', n_p FROM w)
ORDER BY segment, metric""")
  )

  /** Interpolated (continuous) median, landed on an exact-integer
    * grid: values are 2-decimal, so the true median is a multiple of
    * 0.005 and round(x*1000) is the same BIGINT in both engines even
    * though Spark computes (1−g)·lo + g·hi while DuckDB computes
    * lo + g·(hi−lo) — the two fp spellings differ by ≤1 ulp around an
    * exactly-representable grid point, which the integer round
    * absorbs. The discrete family is q_percentiles_disc; this gates
    * the interpolating aggregate itself.
    */
  val qMedianCont = Q(
    "q_median_cont",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(expr("CAST(round(percentile(value, 0.5e0) * 1000, 0) AS BIGINT)")
          .as("median_milli"), count(lit(1)).as("n"))
        .orderBy($"event_type")
    },
    Some("""
SELECT event_type,
       CAST(round(quantile_cont(value, 0.5e0) * 1000, 0) AS BIGINT) AS median_milli,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** Exact WEIGHTED median (lower): per return flag, the smallest
    * price (exact cents) whose cumulative l_quantity weight reaches
    * half the group's total — the quantity-weighted "typical price" no
    * Spark builtin provides (percentile/quantile are row-weighted).
    * Pure integer arithmetic: the crossing test is `2·cum_w ≥ tot_w`.
    * Tie-safety: rows with equal (price, w) may accumulate in any
    * order, but a price group's END-of-group cumulative weight is
    * order-free, and min(price) over crossing rows depends only on
    * which group's end first reaches the threshold — so the result is
    * deterministic in both engines despite the non-unique sort key.
    * One shuffle on the group key; windows and the final min cluster
    * on it.
    */
  private def weightedMedianSql(rel: String): String = s"""
WITH t AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
                  CAST(l_quantity AS BIGINT) AS w
           FROM $rel),
c AS (SELECT flag, price_cents, w,
             sum(w) OVER (PARTITION BY flag ORDER BY price_cents, w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
             sum(w) OVER (PARTITION BY flag) AS tot_w
      FROM t)
SELECT flag AS l_returnflag,
       CAST(min(price_cents) AS BIGINT) AS weighted_median_cents,
       CAST(min(tot_w) AS BIGINT) AS total_weight
FROM c
WHERE 2 * cum_w >= tot_w
GROUP BY flag
ORDER BY l_returnflag"""

  /** Spark side: the flag-partitioned cumulative window above has only
    * 3 partitions — a 2M-row single-task sort per flag at sf1 (audited:
    * 11.2 s, the worst window skew in the catalog). Restated as the
    * two-phase distributed prefix sum (q_sequence_pack's pattern):
    * per-(flag, $1000-price-bucket) partial weights, a tiny bucket-
    * offset window, then the per-row cumulative window partitioned by
    * (flag, bucket) — hundreds of parallel sort partitions instead of
    * 3. Row-level cum_w values can differ from the single-window
    * spelling only in the accumulation order of identical
    * (price, w) duplicates; every price GROUP's end-of-group cumulative
    * weight is permutation-invariant, so the crossing price and the
    * output are bit-identical to the oracle's one-window form.
    */
  private val wmBucketedSparkSql = """
WITH t AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
                  CAST(l_quantity AS BIGINT) AS w
           FROM lineitem_wm),
boff AS (SELECT flag, pb,
                coalesce(sum(bw_w) OVER (PARTITION BY flag ORDER BY pb
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
                sum(bw_w) OVER (PARTITION BY flag) AS tot_w
         FROM (SELECT flag, price_cents DIV 100000 AS pb, sum(w) AS bw_w
               FROM t GROUP BY flag, price_cents DIV 100000) bw),
c AS (SELECT tb.flag, tb.price_cents,
             b.off + sum(tb.w) OVER (PARTITION BY tb.flag, tb.pb
                     ORDER BY tb.price_cents, tb.w
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
             b.tot_w
      FROM (SELECT flag, price_cents, w, price_cents DIV 100000 AS pb FROM t) tb
      JOIN boff b ON tb.flag = b.flag AND tb.pb = b.pb)
SELECT flag AS l_returnflag,
       CAST(min(price_cents) AS BIGINT) AS weighted_median_cents,
       CAST(min(tot_w) AS BIGINT) AS total_weight
FROM c
WHERE 2 * cum_w >= tot_w
GROUP BY flag
ORDER BY l_returnflag"""

  // test seams: Round8OpsSpec proves the two spellings equal on
  // tie-heavy synthetic data (the permutation-invariance argument above)
  private[graft] def weightedMedianSqlForTest(rel: String): String = weightedMedianSql(rel)
  private[graft] def wmBucketedSparkSqlForTest: String = wmBucketedSparkSql

  val qWeightedMedian = Q(
    "q_weighted_median",
    (spark, dir) => {
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_wm")
      spark.sql(wmBucketedSparkSql)
    },
    Some(weightedMedianSql("lineitem")))

  val all: Seq[Q] = Seq(qRollup, qPivot, qSessionWindow, qPercentiles, qCube,
    qSetOps, qSessionWindowStream, qGroupingSets, qUnpivot, qMedianCont,
    qWeightedMedian, qMadOutliers)
}
