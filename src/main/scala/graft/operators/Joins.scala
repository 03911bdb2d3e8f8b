package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multi-way join queries over the TPC-H-ish tables. The reference has
  * no joins (SURVEY.md §2.5) — these cover the join surface a complete
  * engine needs, shaped for scale:
  *
  *  - fact-to-fact (lineitem ⋈ orders) is a shuffle hash join on the
  *    order key; AQE re-plans/coalesces at runtime;
  *  - dimensions (customer, nation, region) are explicitly
  *    `broadcast()` — no fact-table shuffle for them at any scale;
  *  - money sums use the exact-cents pattern (BIGINT sums of
  *    round(x*100)) so results are bit-deterministic regardless of
  *    partition/summation order — float sums would drift at 100 TB.
  */
object Joins {

  private val revCents =
    "CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"

  /** TPC-H Q3/Q10-flavoured: revenue per customer, top 100.
    *
    * Plan shape: lineitem is pre-aggregated per l_orderkey FIRST
    * (map-side-combinable sums, the widest shuffle now carries one
    * narrow row per ORDER instead of one per line item), and because
    * o_orderkey is unique in orders, the per-customer n_orders is a
    * plain count(*) over the pre-aggregate — the naive spelling's
    * countDistinct(o_orderkey) forced a distinct-expand re-shuffle of
    * the full joined fact relation (carrying c_name strings) and was
    * the dominant cost at sf1 (r8 audit: 11.7 s → this shape).
    */
  val qTopCustomers = Q(
    "q_top_customers",
    (spark, dir) => {
      import spark.implicits._
      val ord = Tables.orders(spark, dir)
      val cust = Tables.customer(spark, dir)
      val perOrder = Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey")
        .agg(
          sum(expr(revCents)).as("rev_cents"),
          count(lit(1)).as("n_items"))
      perOrder.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name", $"c_mktsegment")
        .agg(
          (sum($"rev_cents") / 10000.0).as("revenue"),
          sum($"n_items").as("n_items"),
          count(lit(1)).as("n_orders"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(100)
    },
    Some(s"""SELECT c_custkey, c_name, c_mktsegment,
       CAST(sum($revCents) AS BIGINT) / 10000.0 AS revenue,
       count(*) AS n_items,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 100""")
  )

  /** TPC-H Q8-flavoured market share: per order-year, each nation's
    * share of ASIA-customer revenue, in exact basis points of the
    * year's rounded-cents total.
    *
    * Plan shape: lineitem pre-aggregates to one narrow row per order
    * (map-side-combinable cents sum — the widest shuffle carries
    * (l_orderkey, rev_cents), the q_top_customers lesson), then joins
    * orders and the BROADCAST customer→nation→region dim chain with
    * the region filter applied BEFORE the broadcast (the dim is ~1/5
    * of customers — filter-then-broadcast, never broadcast-then-
    * filter). The share denominator comes from a window over the
    * years×nations aggregate — a bounded relation, so the unpartitioned
    * wait is on |years|·|nations| rows, never the fact table. Revenue
    * sums are BIGINT cents (grid-rounded per Q.roundingPolicy), the
    * share is floor-division basis points: every output hash-matches.
    */
  val qMarketShare = Q(
    "q_market_share",
    (spark, dir) => {
      import spark.implicits._
      val dim = Tables.customer(spark, dir)
        .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
        .join(Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .select($"c_custkey", $"n_name")
      val perOrder = Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey")
        .agg(sum(expr(revCents)).as("rev_cents"))
      val yearNation = perOrder
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(dim), $"o_custkey" === $"c_custkey")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"), $"n_name".as("nation"))
        .agg(sum($"rev_cents").as("cents"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"o_year")
      yearNation
        .withColumn("year_cents", sum($"cents").over(w))
        .select($"o_year", $"nation",
          ($"cents" / 10000.0).as("revenue"),
          expr("(10000 * cents) DIV year_cents").as("share_bp"))
        .orderBy($"o_year", $"nation")
    },
    Some(s"""
WITH yn AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n_name AS nation,
                   CAST(sum($revCents) AS BIGINT) AS cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY 1, 2),
tot AS (SELECT o_year, nation, cents,
               CAST(sum(cents) OVER (PARTITION BY o_year) AS BIGINT) AS year_cents
        FROM yn)
SELECT o_year, nation, cents / 10000.0 AS revenue,
       (10000 * cents) // year_cents AS share_bp
FROM tot
ORDER BY o_year, nation""")
  )

  /** The pre-rewrite countDistinct spelling, kept as a test seam:
    * Round8OpsSpec asserts the pre-aggregated plan returns the
    * identical rows.
    */
  private[graft] def topCustomersNaiveForTest(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_mktsegment")
      .agg(
        (sum(expr(revCents)) / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(100)
  }

  /** TPC-H Q5-flavoured: revenue by nation/region through the broadcast
    * dimension chain, with a region filter that prunes before the join.
    */
  val qRevenueByNation = Q(
    "q_revenue_by_nation",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir)
      val cust = Tables.customer(spark, dir)
      val nat = Tables.nation(spark, dir)
      val reg = Tables.region(spark, dir)
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg((sum(expr(revCents)) / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    },
    Some(s"""SELECT r_name, n_name,
       CAST(sum($revCents) AS BIGINT) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name""")
  )

  /** Semi/anti join surface: customers with orders but no high-priority
    * ones (left_semi + left_anti composition).
    */
  val qSemiAnti = Q(
    "q_semi_anti_join",
    (spark, dir) => {
      import spark.implicits._
      val ord = Tables.orders(spark, dir)
      val cust = Tables.customer(spark, dir)
      val withOrders = cust.join(ord, $"c_custkey" === $"o_custkey", "left_semi")
      val urgent = ord.filter($"o_orderpriority" === "1-URGENT")
      withOrders
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey""")
  )

  /** Range (theta) join: events bucketed into value tiers by
    * `value >= lo AND value < hi` — no equi-key exists, so Spark plans
    * a nested-loop join; with the tier table broadcast (5 rows) that is
    * the RIGHT plan at any scale: each event row scans 5 tiers
    * in-memory, no shuffle of the fact side. The oracle states the same
    * non-equi predicate.
    */
  val qRangeJoin = Q(
    "q_range_join_tiers",
    (spark, dir) => {
      import spark.implicits._
      val tiers = Seq(
        ("t0", 0.0, 20.0), ("t1", 20.0, 40.0), ("t2", 40.0, 60.0),
        ("t3", 60.0, 80.0), ("t4", 80.0, 1e9))
        .toDF("tier", "lo", "hi")
      Tables.events(spark, dir)
        .join(broadcast(tiers), $"value" >= $"lo" && $"value" < $"hi")
        .groupBy($"tier")
        .agg(
          count(lit(1)).as("n_events"),
          sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("value_cents"))
        .orderBy($"tier")
    },
    Some("""
      WITH tiers(tier, lo, hi) AS (VALUES
        ('t0', 0.0, 20.0), ('t1', 20.0, 40.0), ('t2', 40.0, 60.0),
        ('t3', 60.0, 80.0), ('t4', 80.0, 1e9))
      SELECT tier, count(*) AS n_events,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events JOIN tiers ON value >= lo AND value < hi
      GROUP BY tier ORDER BY tier
    """))

  /** Explicitly salted join — the skew pattern for when one join key is
    * hot AND the build side is too big to broadcast (AQE's skew-join
    * splits sort-merge partitions, but only after a skewed exchange has
    * already materialized; pre-salting avoids producing the hot
    * partition at all). Probe rows take salt = hash(row) mod S; the
    * build side is replicated ×S so every (key, salt) cell can find its
    * match; the join key becomes (key, salt), spreading a hot key over
    * S reducers. The result is provably identical to the unsalted join
    * — which is exactly what the oracle states. S=16 trades ×16 build
    * replication for ×16 hot-key parallelism; at 100 TB you'd salt only
    * keys above an AQE-style frequency threshold and leave the long
    * tail unsalted.
    */
  val qSaltedJoin = Q(
    "q_salted_join",
    (spark, dir) => {
      import spark.implicits._
      val S = 16
      val ord = Tables.orders(spark, dir)
        .withColumn("salt", pmod(xxhash64($"o_orderkey"), lit(S)).cast("int"))
      val cust = Tables.customer(spark, dir)
        .withColumn("salt", explode(array((0 until S).map(lit): _*)))
      ord.join(cust, $"o_custkey" === $"c_custkey" && ord("salt") === cust("salt"))
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"c_custkey").as("n_customers"),
          (sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")) / 100.0)
            .as("total_price"))
        .orderBy($"c_mktsegment")
    },
    Some("""
SELECT c_mktsegment, count(*) AS n_orders,
       count(DISTINCT c_custkey) AS n_customers,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  /** Full outer join — the one §2.5 join shape the catalog didn't yet
    * gate. Both non-matching sides survive: customers with no orders
    * and (if any) orders whose customer is missing. Physically a
    * sort-merge join (Spark cannot broadcast a full outer side — both
    * sides must be preserved), aggregated down to one row per
    * (segment, match-status) so the gate is value-stable.
    */
  val qFullOuter = Q(
    "q_full_outer_join",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "full")
        .select(
          coalesce($"c_mktsegment", lit("?")).as("seg"),
          when($"o_orderkey".isNull, "customer_only")
            .when($"c_custkey".isNull, "order_only")
            .otherwise("matched").as("side"),
          $"o_totalprice")
        .groupBy($"seg", $"side")
        .agg(
          count(lit(1)).as("n"),
          (sum(coalesce(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"), lit(0L))) / 100.0)
            .as("total_price"))
        .orderBy($"seg", $"side")
    },
    Some("""
SELECT coalesce(c_mktsegment, '?') AS seg,
       CASE WHEN o_orderkey IS NULL THEN 'customer_only'
            WHEN c_custkey IS NULL THEN 'order_only'
            ELSE 'matched' END AS side,
       count(*) AS n,
       CAST(sum(coalesce(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0)) AS BIGINT) / 100.0 AS total_price
FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY 1, 2 ORDER BY seg, side""")
  )

  val all: Seq[Q] =
    Seq(qTopCustomers, qRevenueByNation, qMarketShare, qSemiAnti, qRangeJoin,
      qSaltedJoin, qFullOuter)
}
