package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the per-column completeness/cardinality summary a
  * data-quality layer (Deequ-style) computes before a corpus is
  * trusted: row count, null count, exact distinct count, and the null
  * rate in basis points, one row per column.
  *
  * The profiled relation is the POST-SCRUB event stream — the P9 idiom
  * (sentinel values become NULL: here `event_type = 'error'` is the
  * scrubbed sentinel, and `value` is grid-rounded to exact cents) —
  * because that is where profiling earns its keep: the driver corpus
  * itself is null-free, and a profile that can only ever report zero
  * nulls would be vacuous against the oracle.
  *
  * Shape at scale: one `stack` unpivot (codegen'd Generate, |cols|×
  * row fan-out of a NARROW all-string projection) feeding one
  * two-phase distinct aggregate: Spark first reduces to the distinct
  * (col, val) relation — fully parallel, map-side combinable — and
  * only then counts per col, so the |cols|-bounded final key space
  * never serializes the fact through few reducers. Values are cast to
  * string ONLY for the unpivot's homogeneous-type requirement;
  * distinct counts are unaffected (the casts are injective), which is
  * why the oracle can count on native types and still hash-match.
  */
object Profiling {

  /** Per-column profile over any events relation carrying (event_id,
    * user_id, event_type, value, ts epoch-nanos) — spec entry for the
    * planted-null and cast-injectivity laws.
    */
  private[graft] def profileOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    locally {
      import spark.implicits._
      val rel = events.selectExpr(
        "CAST(event_id AS STRING) AS event_id",
        "CAST(user_id AS STRING) AS user_id",
        "nullif(event_type, 'error') AS event_type_scrubbed",
        "CAST(CAST(round(value * 100, 0) AS BIGINT) AS STRING) AS value_cents",
        "CAST(ts AS STRING) AS ts")
      rel.selectExpr(
        """stack(5,
           'event_id', event_id,
           'user_id', user_id,
           'event_type_scrubbed', event_type_scrubbed,
           'value_cents', value_cents,
           'ts', ts) AS (col, val)""")
        .groupBy($"col")
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count($"val")).as("n_nulls"),
          countDistinct($"val").as("n_distinct"))
        .selectExpr("col", "n_rows", "n_nulls", "n_distinct",
          "(10000 * n_nulls) DIV n_rows AS null_bp")
        .orderBy("col")
    }
  }

  val qTableProfile = Q(
    "q_table_profile",
    (spark, dir) => profileOn(Tables.events(spark, dir)),
    Some("""
WITH rel AS (
  SELECT event_id, user_id,
         nullif(event_type, 'error') AS event_type_scrubbed,
         CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
         epoch_us(ts) * 1000 AS ts
  FROM events
), legs AS (
  SELECT 'event_id' AS col, count(*) AS n_rows,
         count(*) - count(event_id) AS n_nulls,
         count(DISTINCT event_id) AS n_distinct FROM rel
  UNION ALL
  SELECT 'user_id', count(*), count(*) - count(user_id),
         count(DISTINCT user_id) FROM rel
  UNION ALL
  SELECT 'event_type_scrubbed', count(*),
         count(*) - count(event_type_scrubbed),
         count(DISTINCT event_type_scrubbed) FROM rel
  UNION ALL
  SELECT 'value_cents', count(*), count(*) - count(value_cents),
         count(DISTINCT value_cents) FROM rel
  UNION ALL
  SELECT 'ts', count(*), count(*) - count(ts),
         count(DISTINCT ts) FROM rel
)
SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       (10000 * CAST(n_nulls AS BIGINT)) // CAST(n_rows AS BIGINT) AS null_bp
FROM legs
ORDER BY col""")
  )

  /** Benford first-digit audit — the data-forensics screen for
    * fabricated or truncated numeric columns: the leading-digit
    * distribution of order amounts against Benford's law, with the
    * expectation frozen as exact basis-point constants
    * (⌊log10(1+1/d)·10⁴⌋ — computed once offline; a runtime log10
    * could never be oracle-gated). A natural multi-magnitude amount
    * column tracks the curve; a capped, uniform, or invented one
    * doesn't, and the per-digit delta says which digits drifted.
    *
    * Shape: one map-side-combinable 9-key groupBy over the cents
    * projection plus a broadcast of the 1-row total. The digit is
    * taken textually from the exact BIGINT cents (first char of the
    * decimal string — no float log), so both engines agree on every
    * row.
    */
  private[graft] def benfordOn(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    locally {
      import spark.implicits._
      val cents = orders.selectExpr(
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents")
        .where($"cents" > 0L)
        .selectExpr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT) AS digit")
      val counts = cents.groupBy($"digit").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum($"n").cast("bigint").as("n_total"))
      counts.join(broadcast(total))
        .selectExpr("digit", "n", "(10000 * n) DIV n_total AS share_bp",
          s"CAST($BenfordCase AS BIGINT) AS benford_bp")
        .selectExpr("digit", "n", "share_bp", "benford_bp",
          "share_bp - benford_bp AS delta_bp")
        .orderBy("digit")
    }
  }

  /** ⌊log10(1+1/d)·10⁴⌋ for d = 1..9, as one CASE expression valid in
    * both dialects.
    */
  private val BenfordCase: String =
    Seq(3010, 1760, 1249, 969, 791, 669, 579, 511, 457).zipWithIndex
      .map { case (bp, i) => s"WHEN ${i + 1} THEN $bp" }
      .mkString("CASE digit ", " ", " ELSE 0 END")

  val qBenford = Q(
    "q_benford_audit",
    (spark, dir) => benfordOn(Tables.orders(spark, dir)),
    Some(s"""
WITH cents AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
  WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > 0
), counts AS (
  SELECT digit, count(*) AS n FROM cents GROUP BY 1
), total AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total FROM counts
)
SELECT digit, CAST(n AS BIGINT) AS n,
       (10000 * CAST(n AS BIGINT)) // n_total AS share_bp,
       CAST($BenfordCase AS BIGINT) AS benford_bp,
       (10000 * CAST(n AS BIGINT)) // n_total - CAST($BenfordCase AS BIGINT) AS delta_bp
FROM counts, total
ORDER BY digit""")
  )

  val all: Seq[Q] = Seq(qTableProfile, qBenford)
}
