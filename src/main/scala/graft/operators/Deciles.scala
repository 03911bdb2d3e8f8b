package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact customer-spend deciles — the equi-depth bucketing behind
  * "top 10% of customers drive X% of revenue". The naive spelling is
  * `ntile(10)` over a global per-customer ORDER BY — a single-task
  * window over a corpus-scale relation, exactly the anti-pattern the
  * plan-hygiene sweep exists to catch. This operator computes the SAME
  * assignment distributively:
  *
  *  1. spend per customer (map-side-combinable groupBy to exact cents);
  *  2. the cents-value histogram, and an exclusive prefix sum over it —
  *     the only unpartitioned window, over the PRICE-DOMAIN-bounded
  *     distinct-cents relation (the q_pareto_front argument: ≤ ~10⁷
  *     rows for any realistic amount range, independent of customer
  *     count);
  *  3. within-cents tie ranks (window PARTITIONED by cents — parallel);
  *  4. rank = prefix + tie, decile = ⌊10·(rank−1)/n⌋ — the floor
  *     formula, stated identically in both engines rather than
  *     trusting ntile's remainder policy to agree across engines.
  *
  * Determinism: total rank order (cents, custkey); all outputs BIGINT;
  * revenue shares are floor-division bp of exact cent sums.
  */
object Deciles {

  /** Decile summary over any orders relation carrying (o_custkey,
    * o_totalprice) — spec entry for the tie-break, size-balance, and
    * share laws.
    */
  /** Exact cents spend per customer — referenced three times by the
    * decile rank and four by the concentration readout, so the
    * catalog entries pass it through ONE cached StageView (`spend_v`)
    * shared by both queries; the spec seams keep the uncached
    * spelling.
    */
  private[graft] def spendOn(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .cast("bigint").as("cents"))

  private[graft] def spendView(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    StageViews.ensureCached(spark, "spend_v", dir) {
      spendOn(Tables.orders(spark, dir))
    }

  private[graft] def decilesOn(orders: DataFrame): DataFrame =
    decilesOnSpend(spendOn(orders))

  private[graft] def decilesOnSpend(spend: DataFrame): DataFrame = {
    val spark = spend.sparkSession
    import spark.implicits._
    val hist = spend.groupBy($"cents").agg(count(lit(1)).as("c_n"))
    val prefW = Window.orderBy($"cents").rowsBetween(Window.unboundedPreceding, -1)
    val below = hist
      .withColumn("below", coalesce(sum($"c_n").over(prefW), lit(0L)))
      .select($"cents", $"below")
    val tieW = Window.partitionBy($"cents").orderBy($"o_custkey")
    val tot = spend.agg(count(lit(1)).as("n_total"),
      sum($"cents").cast("bigint").as("cents_total"))
    spend.withColumn("tie", row_number().over(tieW))
      .join(below, "cents")
      .join(broadcast(tot))
      .selectExpr("cents", "(10 * (below + tie - 1)) DIV n_total AS decile",
        "cents_total")
      .groupBy($"decile")
      .agg(
        count(lit(1)).as("n_customers"),
        min($"cents").as("min_cents"),
        max($"cents").as("max_cents"),
        sum($"cents").cast("bigint").as("sum_cents"),
        max($"cents_total").as("ct"))
      .selectExpr("decile", "n_customers", "min_cents", "max_cents",
        "sum_cents", "(10000 * sum_cents) DIV ct AS revenue_share_bp")
      .orderBy("decile")
  }

  val qSpendDeciles = Q(
    "q_spend_deciles",
    (spark, dir) => decilesOnSpend(spendView(spark, dir)),
    Some("""
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), hist AS (
  SELECT cents, count(*) AS c_n FROM spend GROUP BY 1
), below AS (
  SELECT cents, CAST(coalesce(sum(c_n) OVER (ORDER BY cents
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
  FROM hist
), tot AS (
  SELECT count(*) AS n_total, CAST(sum(cents) AS BIGINT) AS cents_total FROM spend
), ranked AS (
  SELECT s.cents,
         (10 * (b.below + row_number() OVER (PARTITION BY s.cents ORDER BY s.o_custkey) - 1))
           // t.n_total AS decile,
         t.cents_total
  FROM spend s JOIN below b ON s.cents = b.cents CROSS JOIN tot t
)
SELECT CAST(decile AS BIGINT) AS decile,
       count(*) AS n_customers,
       min(cents) AS min_cents, max(cents) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       (10000 * CAST(sum(cents) AS BIGINT)) // max(cents_total) AS revenue_share_bp
FROM ranked
GROUP BY 1
ORDER BY decile""")
  )

  /** Revenue concentration — CR-k: the share of total revenue held by
    * the top k customers, for k ∈ [[CrKs]] ("do 10 accounts carry the
    * book?"). Spark-side the top-k is `orderBy(...).limit(k)` — a
    * distributed TakeOrdered (per-partition heaps + a k-row driver
    * merge), NEVER a global rank window; the oracle states the same
    * selection as a row_number filter with the identical
    * (cents DESC, custkey) total tie order.
    *
    * Shape at scale: spend-per-customer reduce (combinable), then per
    * k one TakeOrdered(k) + 1-row aggregate unioned — k is a
    * dashboard constant, so the whole readout is three k-row heaps
    * over the customer relation.
    */
  val CrKs: Seq[Int] = Seq(1, 10, 100)

  private[graft] def concentrationOn(orders: DataFrame): DataFrame =
    concentrationOnSpend(spendOn(orders))

  private[graft] def concentrationOnSpend(spend: DataFrame): DataFrame = {
    val spark = spend.sparkSession
    import spark.implicits._
    val tot = spend.agg(sum($"cents").cast("bigint").as("total_cents"))
    val perK = CrKs.map { k =>
      spend.orderBy($"cents".desc, $"o_custkey".asc).limit(k)
        .agg(count(lit(1)).cast("bigint").as("n_top"),
          sum($"cents").cast("bigint").as("topk_cents"))
        .select(lit(k.toLong).as("k"), $"n_top", $"topk_cents")
    }.reduce(_ unionAll _)
    perK.join(broadcast(tot))
      .selectExpr("k", "n_top", "topk_cents", "total_cents",
        "(10000 * topk_cents) DIV total_cents AS share_bp")
      .orderBy("k")
  }

  val qRevenueConcentration = Q(
    "q_revenue_concentration",
    (spark, dir) => concentrationOnSpend(spendView(spark, dir)),
    Some(s"""
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk
  FROM spend
), tot AS (
  SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM spend
), perk AS (
  ${CrKs.map(k =>
      s"""SELECT CAST($k AS BIGINT) AS k, count(*) AS n_top,
         CAST(sum(cents) AS BIGINT) AS topk_cents FROM ranked WHERE rk <= $k""")
    .mkString("\n  UNION ALL\n  ")}
)
SELECT k, n_top, topk_cents, total_cents,
       (10000 * topk_cents) // total_cents AS share_bp
FROM perk CROSS JOIN tot
ORDER BY k""")
  )

  /** RFM segmentation — every customer scored 1–4 on Recency (days
    * since last order), Frequency (order count), and Monetary (exact
    * cents), 4 = best quartile on each axis, rolled up per composite
    * `rfm_code` (111…444). The classic lifecycle-marketing cut
    * ("which 444 whales went quiet?" is code 144).
    *
    * Scale: all three quartile assignments use the SAME distributed
    * histogram-rank as [[qSpendDeciles]] — value histogram (domain-
    * bounded: day span, order-count span, price domain), exclusive
    * prefix over it, partitioned tie window, floor formula — never a
    * global per-customer window. The ORACLE ranks with a plain
    * row_number (DuckDB has no scale constraint); both spell the
    * identical (value, custkey) total order, which is the point of
    * the equivalence. One customer-sized aggregate feeds all three.
    *
    * Determinism: ranks tie-break on custkey; scores are
    * `4 − (4·(rank−1)) DIV n`; reference day is the corpus max order
    * day (1-row broadcast).
    */
  private[graft] def rfmOn(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val per = orders.groupBy($"o_custkey")
      .agg(
        max(expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV ${86400L * 1000000}"))
          .as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
          .cast("bigint").as("cents"))
    val ref = per.agg(max($"last_day").as("ref_day"))
    val tot = per.agg(count(lit(1)).as("n_total"))
    val dims = per.join(broadcast(ref))
      .selectExpr("o_custkey", "ref_day - last_day AS recency_days",
        "n_orders", "cents")

    // distributed rank → score 4..1 for one dimension (asc = small is best)
    def score(dim: String, asc: Boolean): DataFrame = {
      val hist = dims.groupBy(col(dim)).agg(count(lit(1)).as("hn"))
      val prefW = Window
        .orderBy(if (asc) col(dim).asc else col(dim).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val below = hist
        .withColumn("below", coalesce(sum($"hn").over(prefW), lit(0L)))
        .select(col(dim).as("bv"), $"below")
      val tieW = Window.partitionBy(col(dim)).orderBy($"o_custkey")
      dims.select($"o_custkey", col(dim))
        .withColumn("tie", row_number().over(tieW))
        .join(below, col(dim) === $"bv")
        .join(broadcast(tot))
        .selectExpr("o_custkey",
          s"4 - (4 * (below + tie - 1)) DIV n_total AS s_$dim")
    }

    score("recency_days", asc = true)
      .join(score("n_orders", asc = false), "o_custkey")
      .join(score("cents", asc = false), "o_custkey")
      .selectExpr(
        "100 * s_recency_days + 10 * s_n_orders + s_cents AS rfm_code")
      .groupBy($"rfm_code")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("rfm_code")
  }

  val qRfmSegments = Q(
    "q_rfm_segments",
    (spark, dir) => rfmOn(Tables.orders(spark, dir)),
    Some(s"""
WITH per AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // ${86400L * 1000000}) AS last_day,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), ref AS (SELECT max(last_day) AS ref_day FROM per),
tot AS (SELECT count(*) AS n_total FROM per),
dims AS (
  SELECT o_custkey, ref_day - last_day AS recency_days, n_orders, cents
  FROM per CROSS JOIN ref
), ranked AS (
  SELECT o_custkey,
         row_number() OVER (ORDER BY recency_days, o_custkey) AS rk_r,
         row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS rk_f,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk_m
  FROM dims
), coded AS (
  SELECT 100 * (4 - (4 * (rk_r - 1)) // n_total)
       + 10 * (4 - (4 * (rk_f - 1)) // n_total)
       + (4 - (4 * (rk_m - 1)) // n_total) AS rfm_code
  FROM ranked CROSS JOIN tot
)
SELECT CAST(rfm_code AS BIGINT) AS rfm_code, count(*) AS n_users
FROM coded
GROUP BY 1
ORDER BY rfm_code""")
  )

  val all: Seq[Q] = Seq(qSpendDeciles, qRevenueConcentration, qRfmSegments)
}
