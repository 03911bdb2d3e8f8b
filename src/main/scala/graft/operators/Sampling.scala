package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic corpus splitting and sampling for the training-data
  * pipeline: content-hash bucketing replaces `randomSplit` wherever
  * reproducibility matters — the assignment is a pure function of the
  * document id, so it is stable across engines, runs, partitionings and
  * cluster sizes (randomSplit is none of those: it re-draws per
  * partition layout, train_rf.py:68 included).
  *
  * Scale: both queries are a single narrow projection over the corpus
  * (md5 + integer ops, fully codegen'd); the stratified variant adds
  * one map-side-combinable groupBy(lang). No joins, no wide shuffle —
  * the same plan at 100 TB.
  */
object Sampling {

  /** md5-hex-prefix → 28-bit BIGINT, identical arithmetic in both
    * engines (the dedup/simhash nibble trick); `h` must hold md5(...).
    */
  private def nibble28(d: SqlDialect, h: String): String = (1 to 7)
    .map { i =>
      val c = s"substr($h, $i, 1)"
      s"(${d.strpos("'0123456789abcdef'", c)} - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
    }
    .mkString(" + ")

  /** 90/5/5 train/val/test assignment by hash bucket. */
  private def splitSql(d: SqlDialect): String = s"""
WITH mh AS (SELECT doc_id, md5(CAST(doc_id AS STRING)) AS h FROM documents),
b AS (SELECT doc_id, (${nibble28(d, "h")}) % 100 AS bucket FROM mh)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id"""

  val qSplit = Q(
    "q_split_assign",
    (spark, dir) => {
      StageViews.documents(spark, dir)
      spark.sql(splitSql(SparkSql))
    },
    Some(splitSql(DuckSql)))

  /** Per-language 20% sample by the same bucketing — stratified
    * sampling whose per-group rates concentrate tightly around 0.20
    * because the hash is uniform; emits sampled/total per stratum.
    */
  private def stratifiedSql(d: SqlDialect): String = s"""
WITH mh AS (SELECT doc_id, lang, md5(CAST(doc_id AS STRING)) AS h FROM documents),
b AS (SELECT doc_id, lang, (${nibble28(d, "h")}) % 100 AS bucket FROM mh)
SELECT lang, count(*) AS n_total,
       CAST(sum(CASE WHEN bucket < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM b
GROUP BY lang
ORDER BY lang"""

  val qStratified = Q(
    "q_stratified_sample",
    (spark, dir) => {
      StageViews.documents(spark, dir)
      spark.sql(stratifiedSql(SparkSql))
    },
    Some(stratifiedSql(DuckSql)))

  /** Deterministic fixed-size per-stratum sample ("reservoir" k=20):
    * rank every event inside its event_type by a content hash and keep
    * the first K. Same reproducibility contract as the splits above —
    * the sample is a pure function of the data, not of partition
    * layout, so any engine and any cluster size draws the same rows.
    *
    * Scale: one shuffle on the stratum key; the rank sorts only within
    * strata. At 100 TB, pre-filter with a hash-prefix threshold
    * (keep hk < (K/n̂)·margin, then rank survivors) so the per-group
    * sort touches a sliver of each stratum instead of all of it — the
    * two-pass trick is worth it only past ~10⁶ rows per stratum, far
    * above catalog scale.
    */
  val ReservoirK = 20

  private def reservoirSql(d: SqlDialect): String = s"""
WITH h AS (SELECT event_type, event_id, user_id,
                  md5(CAST(event_id AS STRING) || ':rsv') AS hk
           FROM events),
r AS (SELECT event_type, event_id, user_id,
             row_number() OVER (PARTITION BY event_type ORDER BY hk, event_id) AS rk
      FROM h)
SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id, user_id
FROM r WHERE rk <= $ReservoirK
ORDER BY event_type, rk"""

  /** Reservoir over a caller-supplied events frame — the test seam for
    * the partition-invariance spec: run() registers the BASE table as
    * the `events` view, which would clobber any repartitioned view a
    * test had registered under the same name.
    */
  private[graft] def reservoirOn(spark: org.apache.spark.sql.SparkSession,
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    events.createOrReplaceTempView("events")
    spark.sql(reservoirSql(SparkSql))
  }

  val qReservoir = Q(
    "q_reservoir_sample",
    (spark, dir) => reservoirOn(spark, graft.Tables.events(spark, dir)),
    Some(reservoirSql(DuckSql)))

  /** Token-weighted deterministic subsampling: include each document
    * with probability min(1, n_tok/256) — the token-budget sampling a
    * pretraining mix uses so short fragments don't dominate the doc
    * count — implemented as `hash28(doc_id) < n_tok · 2²⁰` (2²⁸·p
    * exactly when n_tok ≤ 256, since 2²⁸/256 = 2²⁰). Pure integer
    * comparison on a content hash: the decision is reproducible
    * per-document across engines and cluster layouts, and the sample
    * composition is auditable (the threshold rides along). Narrow
    * one-pass projection + filter, no shuffle.
    */
  private def weightedSql(d: SqlDialect, rel: String = "documents"): String = s"""
WITH t AS (SELECT doc_id, lang, CAST(${d.len(d.split("text"))} AS BIGINT) AS n_tok
           FROM $rel),
w AS (SELECT doc_id, lang, n_tok,
             CASE WHEN n_tok >= 256 THEN CAST(${1L << 28} AS BIGINT)
                  ELSE n_tok * CAST(${1L << 20} AS BIGINT) END AS thresh
      FROM t),
h AS (SELECT doc_id, lang, n_tok, thresh, ${nibble28(d, "h")} AS hv
      FROM (SELECT w.*, md5(CAST(doc_id AS STRING) || ':wsmp') AS h FROM w))
SELECT doc_id, lang, n_tok, thresh, hv
FROM h
WHERE hv < thresh
ORDER BY doc_id"""

  val qWeighted = Q(
    "q_weighted_sample",
    (spark, dir) => {
      // narrow projection + filter — read the table directly, skipping
      // the shared view's repartition (see q_text_normalize note)
      graft.Tables.documents(spark, dir)
        .createOrReplaceTempView("documents_ws")
      spark.sql(weightedSql(SparkSql, "documents_ws"))
    },
    Some(weightedSql(DuckSql)))

  /** Leakage-safe 90/5/5 split: hash the duplicate-CLUSTER
    * representative, not the doc id, so near-duplicate documents can
    * never straddle train and test — the eval-contamination failure
    * mode a doc-id split has by construction whenever dedup is
    * imperfect upstream. Composes the LSH cluster assignment
    * ([[Dedup.clusterAssignments]]: pairs → connected components,
    * singletons map to themselves) with the same 28-bit md5 bucketing
    * as `q_split_assign`; the oracle restates the cluster fixpoint as
    * the recursive CTE. One extra broadcast-size join over the plain
    * split; the cluster stage is shared with the dedup family's cached
    * views, so at 100 TB this is the persisted cluster table joined at
    * split time.
    */
  private def leakageSafeSql(d: SqlDialect): String = s"""
WITH RECURSIVE ${Dedup.clusterCtes(d)},
mh2 AS (SELECT doc_id, cluster_rep,
               md5(CAST(cluster_rep AS STRING) || ':csplit') AS h
        FROM comp),
b2 AS (SELECT doc_id, cluster_rep, (${nibble28(d, "h")}) % 100 AS bucket FROM mh2)
SELECT doc_id, cluster_rep, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b2
ORDER BY doc_id"""

  val qLeakageSafeSplit = Q(
    "q_split_leakage_safe",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      val comp = Dedup.clusterAssignments(spark, dir,
        graft.Tables.documents(spark, dir))
      comp
        .withColumn("h", md5(concat(col("cluster_rep").cast("string"), lit(":csplit"))))
        .withColumn("bucket", expr(s"(${nibble28(SparkSql, "h")}) % 100"))
        .select(col("doc_id"), col("cluster_rep"), col("bucket"),
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },
    Some(leakageSafeSql(DuckSql)))

  /** A/B experiment readout — users assigned to control/treatment by
    * the SAME md5-bucket hash as `q_split_assign` (assignment must be
    * sticky and data-independent, never `rand()`), conversion = the
    * user ever purchases, and the lift reported as exact basis points.
    * Division appears only over non-negative integers (the engines'
    * DIV/`//` disagree on negative floors — r12 rule), so the
    * direction is a string and the relative lift is over |Δ|.
    *
    * Shape at scale: one map-side-combinable groupBy(user) for the
    * conversion flag, one 2-key aggregate, one 2-row pivot. Nothing
    * after the first aggregate is user-sized.
    */
  private[graft] def abLiftSql(d: SqlDialect): String = s"""
WITH u AS (SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
           FROM events GROUP BY user_id),
mh AS (SELECT user_id, converted, md5(CAST(user_id AS STRING)) AS h FROM u),
v AS (SELECT converted, (${nibble28(d, "h")}) % 2 AS variant FROM mh),
agg AS (SELECT variant, count(*) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_conv
        FROM v GROUP BY variant),
piv AS (SELECT
  CAST(max(CASE WHEN variant = 0 THEN n_users END) AS BIGINT) AS a_users,
  CAST(max(CASE WHEN variant = 0 THEN n_conv END) AS BIGINT) AS a_conv,
  CAST(max(CASE WHEN variant = 1 THEN n_users END) AS BIGINT) AS b_users,
  CAST(max(CASE WHEN variant = 1 THEN n_conv END) AS BIGINT) AS b_conv
  FROM agg)
SELECT a_users, a_conv, ${d.idiv("10000 * a_conv", "a_users")} AS a_cvr_bp,
       b_users, b_conv, ${d.idiv("10000 * b_conv", "b_users")} AS b_cvr_bp,
       CASE WHEN ${d.idiv("10000 * b_conv", "b_users")} > ${d.idiv("10000 * a_conv", "a_users")} THEN 'up'
            WHEN ${d.idiv("10000 * b_conv", "b_users")} < ${d.idiv("10000 * a_conv", "a_users")} THEN 'down'
            ELSE 'flat' END AS direction,
       abs(${d.idiv("10000 * b_conv", "b_users")} - ${d.idiv("10000 * a_conv", "a_users")}) AS lift_abs_bp,
       ${d.idiv(s"10000 * abs(${d.idiv("10000 * b_conv", "b_users")} - ${d.idiv("10000 * a_conv", "a_users")})",
         d.idiv("10000 * a_conv", "a_users"))} AS rel_lift_bp
FROM piv
ORDER BY a_users"""

  val qAbLift = Q(
    "q_ab_lift",
    (spark, dir) => {
      Tables.events(spark, dir).createOrReplaceTempView("events")
      spark.sql(abLiftSql(SparkSql))
    },
    Some(abLiftSql(DuckSql)))

  val all: Seq[Q] = Seq(qSplit, qStratified, qReservoir, qWeighted,
    qLeakageSafeSplit, qAbLift)
}
