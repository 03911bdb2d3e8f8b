package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** As-of (most-recent-prior) join — the classic time-series operator
  * Spark lacks natively. Composed from built-ins (preference (a) of the
  * custom-operator ladder): tag and union both sides, sort by
  * (key, time, side), and carry the latest right-side row forward with a
  * running max over the preceding frame; a final equi-join retrieves the
  * matched row's payload.
  *
  * Here: each event is matched to the customer's most recent order at
  * or before the event time.
  *
  * Scale: one shuffle on the join key for the window, then an equi-join
  * back to orders on (custkey, matched-time) — same cost class as a
  * sort-merge join, no range explosion. The tie-break (latest order id
  * on equal timestamps) keeps it deterministic.
  */
object AsOfJoin {

  private def sql(epochUsEvents: String => String, epochUsTs: String => String): String = s"""
WITH ev AS (
  SELECT event_id, user_id % 100 AS cust, ${epochUsEvents("ts")} AS t FROM events
),
ord AS (
  SELECT o_orderkey, o_custkey % 100 AS cust, ${epochUsTs("o_orderdate")} AS t,
         o_totalprice
  FROM orders
),
uni AS (
  SELECT cust, t, 1 AS is_order, CAST(NULL AS BIGINT) AS event_id FROM ord
  UNION ALL
  SELECT cust, t, 0 AS is_order, event_id FROM ev
),
carried AS (
  SELECT cust, t, is_order, event_id,
         max(CASE WHEN is_order = 1 THEN t END) OVER (
           PARTITION BY cust ORDER BY t, is_order DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_order_t
  FROM uni
),
matched AS (
  SELECT event_id, cust, t, last_order_t
  FROM carried WHERE is_order = 0
),
best_order AS (
  SELECT cust, t, max(o_orderkey) AS o_orderkey FROM ord GROUP BY cust, t
)
SELECT m.event_id, m.cust,
       b.o_orderkey AS matched_order,
       CASE WHEN m.last_order_t IS NOT NULL THEN m.t - m.last_order_t END AS staleness_us
FROM matched m
LEFT JOIN best_order b ON m.cust = b.cust AND m.last_order_t = b.t
ORDER BY m.event_id"""

  private def sparkSql =
    // o_orderdate is TIMESTAMP_NTZ in parquet; session tz is UTC so the
    // LTZ cast is identity and matches DuckDB's naive epoch_us
    sql(c => s"CAST($c DIV 1000 AS BIGINT)", c => s"unix_micros(CAST($c AS TIMESTAMP))")
  private def duckSql =
    sql(c => s"epoch_us($c)", c => s"epoch_us($c)")

  val qAsOf = Q(
    "q_asof_join",
    (spark: SparkSession, dir: String) => {
      Tables.events(spark, dir).createOrReplaceTempView("events")
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(sparkSql)
    },
    Some(duckSql)
  )

  /** Nearest-in-time as-of (pandas merge_asof direction='nearest'): each
    * event matches its CLOSEST order in either direction within a 7-day
    * tolerance. Two window passes over the same (key, time)-sorted
    * union — carry the last prior order time forward and the first next
    * order time backward (the backward pass orders same-timestamp
    * orders AFTER events so a same-instant order is visible to its
    * event in the following frame) — then an integer distance compare
    * with a prefer-prior tie-break. Same one-shuffle cost class as the
    * prior-only spelling; no range explosion.
    */
  private val TolUs: Long = 7L * 86400 * 1000000

  private def nearestSql(epochUsEvents: String => String, epochUsTs: String => String): String = s"""
WITH ev AS (
  SELECT event_id, user_id % 100 AS cust, ${epochUsEvents("ts")} AS t FROM events
),
ord AS (
  SELECT o_orderkey, o_custkey % 100 AS cust, ${epochUsTs("o_orderdate")} AS t
  FROM orders
),
uni AS (
  SELECT cust, t, 1 AS is_order, CAST(NULL AS BIGINT) AS event_id FROM ord
  UNION ALL
  SELECT cust, t, 0 AS is_order, event_id FROM ev
),
carried AS (
  SELECT cust, t, is_order, event_id,
         max(CASE WHEN is_order = 1 THEN t END) OVER (
           PARTITION BY cust ORDER BY t, is_order DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_t,
         min(CASE WHEN is_order = 1 THEN t END) OVER (
           PARTITION BY cust ORDER BY t, is_order, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM uni
),
picked AS (
  SELECT event_id, cust, t,
         CASE WHEN prior_t IS NOT NULL AND t - prior_t <= $TolUs
                   AND (next_t IS NULL OR t - prior_t <= next_t - t)
              THEN prior_t
              WHEN next_t IS NOT NULL AND next_t - t <= $TolUs
              THEN next_t END AS matched_t
  FROM carried WHERE is_order = 0
),
best_order AS (
  SELECT cust, t, max(o_orderkey) AS o_orderkey FROM ord GROUP BY cust, t
)
SELECT p.event_id, p.cust,
       b.o_orderkey AS matched_order,
       CASE WHEN p.matched_t IS NOT NULL
            THEN abs(p.t - p.matched_t) END AS dist_us
FROM picked p
LEFT JOIN best_order b ON p.cust = b.cust AND p.matched_t = b.t
ORDER BY p.event_id"""

  val qAsOfNearest = Q(
    "q_asof_nearest",
    (spark: SparkSession, dir: String) => {
      Tables.events(spark, dir).createOrReplaceTempView("events")
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(nearestSql(
        c => s"CAST($c DIV 1000 AS BIGINT)",
        c => s"unix_micros(CAST($c AS TIMESTAMP))"))
    },
    Some(nearestSql(c => s"epoch_us($c)", c => s"epoch_us($c)"))
  )

  val all: Seq[Q] = Seq(qAsOf, qAsOfNearest)
}
