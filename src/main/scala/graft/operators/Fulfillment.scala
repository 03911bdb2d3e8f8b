package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fulfillment SLA percentiles — per order priority, the exact p50 /
  * p90 / max of order-to-last-shipment latency in whole days. The
  * operations question ("are URGENT orders actually shipping
  * faster?") needs DISCRETE percentiles (smallest latency v with
  * cum(v) ≥ ⌈p·n⌉), computed without ever sorting the fact:
  *
  *  1. per-order last ship date — a map-side-combinable groupBy on
  *     the lineitem's natural key;
  *  2. one equi-join to orders ON that key (fact-to-fact but
  *     key-clustered: both sides shuffle-partition on o_orderkey and
  *     AQE reuses the layout);
  *  3. the (priority, latency_days) histogram — tiny: |priorities| ×
  *     latency-domain, calendar-bounded;
  *  4. within-priority cumulative counts (window over the tiny
  *     histogram, partitioned — parallel) and the crossing tests
  *     `cum ≥ (n+1) DIV 2` (lower median, the q_bot_cadence
  *     convention) and `cum ≥ ⌈9n/10⌉ = (9n+9) DIV 10`.
  *
  * Determinism: whole-day floor latencies, exact counts, integer
  * crossing thresholds — identical arithmetic in both engines.
  */
object Fulfillment {

  private val DayUs = 86400L * 1000000

  /** SLA rollup over orders+lineitem relations carrying (o_orderkey,
    * o_orderpriority, o_orderdate) and (l_orderkey, l_shipdate) —
    * spec entry for the hand-percentile and crossing-boundary laws.
    */
  private[graft] def slaOn(orders: DataFrame, lineitem: DataFrame): DataFrame =
    slaOnHist(histOn(orders, lineitem))

  /** The (priority, latency-days) histogram — the fact join reduced to
    * a priority×day-domain relation; referenced twice downstream (the
    * cumulative pass and the totals), so the catalog entry caches it.
    */
  private[graft] def histOn(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val ship = lineitem
      .selectExpr("l_orderkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS ship_us")
      .groupBy($"l_orderkey").agg(max($"ship_us").as("last_ship_us"))
    val lat = orders
      .selectExpr("o_orderkey", "o_orderpriority",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS ord_us")
      .join(ship, $"o_orderkey" === $"l_orderkey")
      .selectExpr("o_orderpriority AS priority",
        s"(last_ship_us - ord_us) DIV $DayUs AS days")
    lat.groupBy($"priority", $"days").agg(count(lit(1)).as("c"))
  }

  private[graft] def slaOnHist(hist: DataFrame): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val cumW = Window.partitionBy($"priority").orderBy($"days")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.groupBy($"priority".as("p2"))
      .agg(sum($"c").cast("bigint").as("n_orders"), max($"days").as("max_days"))
    hist
      .withColumn("cum", sum($"c").over(cumW))
      .join(broadcast(tot), $"priority" === $"p2")
      .groupBy($"priority", $"n_orders", $"max_days")
      .agg(
        min(when($"cum" >= expr("(n_orders + 1) DIV 2"), $"days")).as("p50_days"),
        min(when($"cum" >= expr("(9 * n_orders + 9) DIV 10"), $"days")).as("p90_days"))
      .selectExpr("priority", "n_orders", "p50_days", "p90_days", "max_days")
      .orderBy("priority")
  }

  val qFulfillmentSla = Q(
    "q_fulfillment_sla",
    (spark, dir) => slaOnHist(StageViews.ensureCached(spark, "sla_hist_v", dir) {
      histOn(Tables.orders(spark, dir), Tables.lineitem(spark, dir))
    }),
    Some(s"""
WITH ship AS (
  SELECT l_orderkey, max(epoch_us(l_shipdate)) AS last_ship_us
  FROM lineitem GROUP BY 1
), lat AS (
  SELECT o.o_orderpriority AS priority,
         (s.last_ship_us - epoch_us(o.o_orderdate)) // $DayUs AS days
  FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
), hist AS (
  SELECT priority, days, count(*) AS c FROM lat GROUP BY 1, 2
), cum AS (
  SELECT priority, days, c,
         sum(c) OVER (PARTITION BY priority ORDER BY days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
), tot AS (
  SELECT priority AS p2, CAST(sum(c) AS BIGINT) AS n_orders,
         max(days) AS max_days
  FROM hist GROUP BY 1
)
SELECT priority, n_orders,
       min(CASE WHEN cum >= (n_orders + 1) // 2 THEN days END) AS p50_days,
       min(CASE WHEN cum >= (9 * n_orders + 9) // 10 THEN days END) AS p90_days,
       max_days
FROM cum JOIN tot ON cum.priority = tot.p2
GROUP BY priority, n_orders, max_days
ORDER BY priority""")
  )

  val all: Seq[Q] = Seq(qFulfillmentSla)
}
