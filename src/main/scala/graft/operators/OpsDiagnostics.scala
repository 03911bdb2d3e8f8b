package graft.operators

import graft.Q

/** Operational diagnostics a 100 TB pipeline runs before committing to a
  * physical plan: key-skew profiling (decides salting / AQE skew-join
  * thresholds BEFORE a shuffle melts one executor) and compaction
  * planning (bin-packs many small inputs into target-size outputs — the
  * small-files problem).
  *
  * Both are one aggregation pass with bounded output, spelled as shared
  * SQL templates so the DuckDB oracle gates the exact arithmetic.
  */
object OpsDiagnostics {

  /** A key is "hot" when its row share exceeds HotFactor× the uniform
    * share — the point where one reducer partition outweighs its peers
    * and salting starts to pay.
    */
  private val HotFactor = 2L

  /** Top-10 heaviest join-key candidates with exact share in basis
    * points and the salting verdict. share_bp and the verdict are pure
    * integer arithmetic (cross-multiplied — no division rounding
    * ambiguity between engines).
    */
  private def keySkewSql(d: SqlDialect): String = s"""
WITH k AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_custkey),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows
        FROM k)
SELECT k.key, k.n,
       ${d.idiv("k.n * 10000", "t.n_rows")} AS share_bp,
       k.n * t.n_keys > $HotFactor * t.n_rows AS is_hot
FROM k CROSS JOIN tot t
ORDER BY k.n DESC, k.key
LIMIT 10"""

  val qKeySkew = Q(
    "q_key_skew",
    (spark, dir) => {
      graft.Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(keySkewSql(SparkSql))
    },
    Some(keySkewSql(DuckSql)))

  /** Target output size for compaction bins (chars stand in for bytes
    * on the synthetic corpus).
    */
  private val TargetChars = 64000L

  /** Greedy first-fit compaction plan: within each source partition,
    * documents in id order are packed into bins of ~TargetChars by
    * bucketing each row's EXCLUSIVE running size. Per-source windows
    * keep the cumulative sum distributed (one partition per source at
    * scale — compaction always runs per partition, never globally, so
    * no single-partition window exists even at 100 TB).
    */
  private def compactionSql(d: SqlDialect): String = s"""
WITH r AS (SELECT source, doc_id, n_chars,
                  CAST(coalesce(sum(n_chars) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
           FROM documents)
SELECT source, ${d.idiv("prior", TargetChars.toString)} AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM r
GROUP BY source, ${d.idiv("prior", TargetChars.toString)}
ORDER BY source, bin"""

  val qCompactionPlan = Q(
    "q_compaction_plan",
    (spark, dir) => {
      // the documents view is SHARED with the dedup family's cached
      // stages — always go through the StageViews registry (a plain
      // createOrReplaceTempView here would invalidate those caches);
      // column pruning keeps this query's scan at the 3 used columns
      StageViews.documents(spark, dir)
      spark.sql(compactionSql(SparkSql))
    },
    Some(compactionSql(DuckSql)))

  val all: Seq[Q] = Seq(qKeySkew, qCompactionPlan)
}
