package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** MERGE-style upsert into a slowly-changing-dimension (SCD type 2)
  * history: an incoming batch of updates + inserts is merged against the
  * current dimension snapshot; changed rows get their open version
  * closed (valid_to set) and a new open version appended, inserts open
  * at the new version, untouched rows stay open.
  *
  * Spark spelling is the scale-right single pass: ONE full-outer join
  * snapshot ⟗ incoming on the business key, then each joined row
  * explodes into its 1–2 output versions (array-of-struct + explode), so
  * the merge is one shuffle join and one narrow pass — never the
  * naive three-branch spelling that re-runs the join per branch. The
  * DuckDB oracle states the identical result relationally (left join +
  * union). At 100 TB both sides of the join are hash-partitioned on the
  * key and AQE handles skew; the incoming batch is typically small
  * enough that Spark broadcasts it.
  *
  * Determinism: money as exact cents, versions as integer epochs,
  * total ORDER BY (key, valid_from). The synthetic insert keys are
  * offset by max(c_custkey)+1 — computed, not a constant (and +1
  * because keys are 0-based) — so they can never collide with real
  * base keys at any scale factor (r5 ADVICE);
  * the 1-row max aggregate broadcasts, costing nothing at 100 TB.
  */
object Scd {

  private val oracle = Some("""
WITH base AS (SELECT c_custkey AS key, c_mktsegment AS seg,
                     CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
              FROM customer),
mx AS (SELECT max(key) + 1 AS m FROM base),
inc AS (SELECT key, 'PROMOTED' AS seg, bal_cents + 10000 AS bal_cents
        FROM base WHERE key % 3 = 0
        UNION ALL
        SELECT key + m AS key, 'NEW' AS seg, bal_cents
        FROM base, mx WHERE key % 7 = 0)
SELECT b.key AS c_custkey, b.seg AS c_mktsegment, b.bal_cents,
       CAST(0 AS BIGINT) AS valid_from,
       CASE WHEN i.key IS NOT NULL THEN CAST(1 AS BIGINT) END AS valid_to
FROM base b LEFT JOIN inc i ON b.key = i.key
UNION ALL
SELECT key AS c_custkey, seg AS c_mktsegment, bal_cents,
       CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
FROM inc
ORDER BY c_custkey, valid_from""")

  val qScd2Upsert = Q(
    "q_scd2_upsert",
    (spark, dir) => {
      import spark.implicits._
      val base = Tables.customer(spark, dir)
        .select($"c_custkey".as("key"), $"c_mktsegment".as("seg"),
          expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("bal_cents"))
      val maxKey = base.agg((max($"key") + 1).as("m"))
      val inc = base.where($"key" % 3 === 0)
        .select($"key", lit("PROMOTED").as("i_seg"),
          ($"bal_cents" + 10000).as("i_bal"))
        .unionAll(base.where($"key" % 7 === 0)
          .crossJoin(broadcast(maxKey))
          .select(($"key" + $"m").as("key"), lit("NEW").as("i_seg"),
            $"bal_cents".as("i_bal")))
      base.join(inc, Seq("key"), "full_outer")
        .select($"key", explode(expr("""
          CASE
            WHEN i_seg IS NULL THEN
              array(named_struct('seg', seg, 'bal', bal_cents,
                                 'vf', CAST(0 AS BIGINT), 'vt', CAST(NULL AS BIGINT)))
            WHEN seg IS NULL THEN
              array(named_struct('seg', i_seg, 'bal', i_bal,
                                 'vf', CAST(1 AS BIGINT), 'vt', CAST(NULL AS BIGINT)))
            ELSE array(
              named_struct('seg', seg, 'bal', bal_cents,
                           'vf', CAST(0 AS BIGINT), 'vt', CAST(1 AS BIGINT)),
              named_struct('seg', i_seg, 'bal', i_bal,
                           'vf', CAST(1 AS BIGINT), 'vt', CAST(NULL AS BIGINT)))
          END""")).as("v"))
        .select($"key".as("c_custkey"), $"v.seg".as("c_mktsegment"),
          $"v.bal".as("bal_cents"), $"v.vf".as("valid_from"),
          $"v.vt".as("valid_to"))
        .orderBy("c_custkey", "valid_from")
    },
    oracle)

  val all: Seq[Q] = Seq(qScd2Upsert)
}
