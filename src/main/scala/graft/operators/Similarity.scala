package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two paths:
  *  - brute-force cosine top-k — the exactness baseline; per-query scan
  *    of the corpus (the 100 TB path would shard the corpus and merge
  *    per-shard top-k, which is exactly what Spark's window-rank over a
  *    hash-partitioned join does);
  *  - IVF: a TWO-LEVEL adaptive inverted file — T = ⌈√n⌉ total lists
  *    factored as nl1 = min(4096, ⌈√T⌉) coarse cells × nl2 = ⌈T/nl1⌉
  *    sub-cells per cell, so the list count tracks √n with NO ceiling
  *    (the former single-level 4096 cap froze T at 16.7M vectors);
  *    assignment applies the same broadcast-centroid join shape twice
  *    (O(n·(nl1+nl2)) = O(n·n^(1/4)) cosines, vs O(n·√n) single-level),
  *    and queries multi-probe np1 = max(2, ⌈√nl1⌉) cells ×
  *    np2 = max(2, ⌈√nl2⌉) sub-cells — probed rows ≈ n^(3/4),
  *    sub-linear in corpus size at every n.
  *
  * Outputs are (query, rank, neighbor) only — integer-exact across
  * engines; cosine doubles stay internal so cross-engine summation-order
  * ulps cannot surface (ordering flips would need two cosines within
  * ~1e-15, measure-zero for random embeddings).
  */
object Similarity {

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    // widened view: parallelizes the cosine loops across the session's
    // shuffle partitions instead of one task per parquet split
    StageViews.embeddings(spark, dir)
    spark.sql(sql)
  }

  /** (norm expr, cosine expr over pair cols qe/ne/qn/nn). The Spark side
    * uses the native codegen'd expression
    * (graft.functions.CosineSimilarity) — one fused loop, no per-row
    * lambda interpretation or intermediate arrays; the oracle spells out
    * the same sequential float→double math, so doubles stay bit-equal.
    */
  private[operators] def normCos(d: SqlDialect): (String, String) = d match {
    case SparkSql => (
      "CAST(0 AS DOUBLE)", // norm column unused on this side (pruned)
      "cosine_similarity(qe, ne)")
    case DuckSql => (
      "sqrt((SELECT sum(CAST(list_extract(embedding, i) AS DOUBLE) * CAST(list_extract(embedding, i) AS DOUBLE)) FROM range(1, 65) t(i)))",
      "(SELECT sum(CAST(list_extract(qe, i) AS DOUBLE) * CAST(list_extract(ne, i) AS DOUBLE)) FROM range(1, 65) t(i)) / (qn * nn)")
  }

  // ---- brute-force cosine top-k ----

  /** The brute-force ranking CTE chain (meta → pairs → scored →
    * ranked) — shared by the standalone oracle and the hybrid-retrieval
    * fusion (Retrieval.qHybrid), whose oracle needs the dense ranked
    * list as a relation rather than a finished query.
    */
  private[operators] def bruteCtes(d: SqlDialect): String = {
    val (norm, cos) = normCos(d)
    s"""meta AS (SELECT vec_id, embedding, $norm AS nrm FROM embeddings),
pairs AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
          FROM meta q JOIN meta n ON q.vec_id < 20 AND n.vec_id <> q.vec_id),
scored AS (SELECT query_id, neighbor_id, $cos AS cos FROM pairs),
ranked AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)"""
  }

  private def bruteSql(d: SqlDialect): String = s"""
WITH ${bruteCtes(d)}
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM ranked
WHERE rank <= 10
ORDER BY query_id, rank"""

  /** Spec entry: the self-contained brute ranking over any
    * embeddings-shaped view registered as `embeddings` (Round18OpsSpec
    * recomputes the hybrid fusion from this and the BM25 list).
    */
  private[operators] def bruteSparkSqlForTest: String = bruteSql(SparkSql)

  // ---- Spark-side shared ANN stages ----
  //
  // The WITH-CTE spelling re-inlines `meta` (and the assignment /
  // scored relations) at every mention: the plan audit counted 8
  // parquet scans for q_ann_ivf and 11 for q_ann_ivf_recall. The Spark
  // side instead materializes three cached stage views — assignment
  // ranks, brute ranks, IVF reranks (narrow id/rank columns only, no
  // embeddings in cache) — and the catalog queries become thin selects
  // over them; brute and IVF recall share the SAME ranked relations
  // the standalone queries emit, exactly the dedup-family pattern.
  // The oracles keep the self-contained CTE spelling.

  // Two-level IVF params, each a scalar subquery over count(*) so both
  // engines agree at every scale factor with no out-of-band input.
  // sqrt is IEEE-correctly-rounded (identical across libms — unlike
  // log2, which the embedding-dedup modulus therefore avoids), and the
  // nl2 division is exact in doubles (both operands < 2²⁶).

  /** T = total inverted lists ≈ √n (uncapped — the point of 2 levels). */
  private val tSub =
    "(SELECT GREATEST(1, CAST(ceil(sqrt(count(*))) AS INT)) FROM embeddings)"
  /** Level-1 cell count ⌈√T⌉ ≈ n^(1/4); 4096 caps the broadcast table
    * (reached only past n ≈ 2.8×10¹⁴ — a third level's territory). */
  private val nl1Sub = s"(SELECT LEAST(4096, CAST(ceil(sqrt($tSub)) AS INT)))"
  /** Sub-cells per level-1 cell: ⌈T/nl1⌉. */
  private val nl2Sub = s"(SELECT CAST(ceil(CAST($tSub AS DOUBLE) / $nl1Sub) AS INT))"
  private val np1Sub = s"(SELECT GREATEST(2, CAST(ceil(sqrt($nl1Sub)) AS INT)))"
  private[operators] val np2Sub = s"(SELECT GREATEST(2, CAST(ceil(sqrt($nl2Sub)) AS INT)))"

  private def ensureEmbeddings(spark: SparkSession, dir: String): Unit = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.embeddings(spark, dir)
  }

  /** IVF index stages only. Split from the brute ground-truth stage so
    * each catalog query builds exactly what it reads: the r9 bench
    * attribution showed the brute baseline (alphabetically first)
    * getting charged ~6 s of sf1 index builds it never consumes. Brute
    * and k-NN call [[ensureBruteStage]]; IVF queries call this; recall
    * (which compares the two) calls both. `ensureCached` is idempotent,
    * so any order of first-touch builds each view once.
    */
  private[operators] def ensureIvfStages(spark: SparkSession, dir: String): Unit = {
    ensureEmbeddings(spark, dir)
    // Level-1 assignment ranking (broadcast ≤4096-row centroid table).
    // PRUNED view — the name is the contract: only the rows the two
    // consumers below read survive into the cache — cell membership
    // (rnk = 1, O(n)) and the 20 probe queries' probe lists
    // (rnk ≤ np1). A consumer wanting other ranks must extend THIS
    // predicate, not read around it.
    StageViews.ensureCached(spark, "ann_asg1_pruned_v", dir)(spark.sql(s"""
SELECT vec_id, c1, rnk FROM (
  SELECT /*+ BROADCAST(c) */ m.vec_id, c.c1,
         ROW_NUMBER() OVER (PARTITION BY m.vec_id
                            ORDER BY cosine_similarity(m.embedding, c.embedding) DESC, c.c1) AS rnk
  FROM embeddings m CROSS JOIN
       (SELECT vec_id AS c1, embedding FROM embeddings WHERE vec_id < $nl1Sub) c)
WHERE rnk = 1 OR (vec_id < 20 AND rnk <= $np1Sub)"""))
    // Level-2 sub-centroids: the first nl2 members of each level-1 cell
    // by vec_id — a deterministic per-cell seed both engines reproduce.
    // Narrow (c1, c2) only; embeddings joined at use sites.
    StageViews.ensureCached(spark, "ann_cent2_v", dir)(spark.sql(s"""
SELECT c1, c2 FROM (
  SELECT c1, vec_id AS c2, ROW_NUMBER() OVER (PARTITION BY c1 ORDER BY vec_id) AS srnk
  FROM ann_asg1_pruned_v WHERE rnk = 1)
WHERE srnk <= $nl2Sub"""))
    // Level-2 assignment — the SAME join shape one level down: each
    // (vector, cell) row ranks that cell's sub-centroids. Members rank
    // their home cell only; probe queries rank every probed cell.
    // Pruned to the consumers' contract like level 1: membership rows
    // (home cell, rnk = 1) + probe rows (rnk ≤ np2).
    StageViews.ensureCached(spark, "ann_asg2_pruned_v", dir)(spark.sql(s"""
SELECT vec_id, c1, c2, a1rnk, rnk FROM (
  SELECT /*+ BROADCAST(c) */ p.vec_id, p.c1, p.rnk AS a1rnk, c.c2,
         ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.c1
                            ORDER BY cosine_similarity(me.embedding, ce.embedding) DESC, c.c2) AS rnk
  FROM ann_asg1_pruned_v p
  JOIN ann_cent2_v c ON p.c1 = c.c1
  JOIN embeddings me ON p.vec_id = me.vec_id
  JOIN embeddings ce ON c.c2 = ce.vec_id)
WHERE (a1rnk = 1 AND rnk = 1) OR (vec_id < 20 AND rnk <= $np2Sub)"""))
    // IVF: (cell, sub-cell)-probed candidates reranked exactly (top-5)
    StageViews.ensureCached(spark, "ann_ivfr_v", dir)(spark.sql(s"""
SELECT query_id, neighbor_id, rank FROM (
  SELECT p.query_id, m.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY cosine_similarity(q.embedding, n.embedding) DESC, m.vec_id) AS rank
  FROM (SELECT vec_id AS query_id, c1, c2 FROM ann_asg2_pruned_v
        WHERE vec_id < 20 AND rnk <= $np2Sub) p
  JOIN (SELECT vec_id, c1, c2 FROM ann_asg2_pruned_v
        WHERE a1rnk = 1 AND rnk = 1) m
    ON p.c1 = m.c1 AND p.c2 = m.c2 AND m.vec_id <> p.query_id
  JOIN embeddings q ON p.query_id = q.vec_id
  JOIN embeddings n ON m.vec_id = n.vec_id)
WHERE rank <= 5"""))
    ()
  }

  /** Exact ground-truth ranks for the 20 probe queries (top-10 kept) —
    * what the brute baseline, k-NN, and the recall gate read.
    */
  private[operators] def ensureBruteStage(spark: SparkSession, dir: String): Unit = {
    ensureEmbeddings(spark, dir)
    StageViews.ensureCached(spark, "ann_brute_v", dir)(spark.sql("""
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY cosine_similarity(q.embedding, n.embedding) DESC, n.vec_id) AS rank
  FROM embeddings q JOIN embeddings n ON q.vec_id < 20 AND n.vec_id <> q.vec_id)
WHERE rank <= 10"""))
  }

  private def runBrute(spark: SparkSession, dir: String): DataFrame = {
    ensureBruteStage(spark, dir)
    spark.sql("""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
FROM ann_brute_v WHERE rank <= 10
ORDER BY query_id, rank""")
  }

  val qBrute = Q("q_ann_cosine_topk", runBrute _, Some(bruteSql(DuckSql)))

  // ---- two-level IVF (T ≈ √n lists = nl1 × nl2, multi-probe both levels) ----

  /** Inverted-file ANN with a TWO-LEVEL corpus-adaptive coarse
    * quantizer. T = ⌈√n⌉ total lists, factored as
    * nl1 = min(4096, ⌈√T⌉) level-1 cells × nl2 = ⌈T/nl1⌉ sub-cells.
    * Level-1 centroids are the first nl1 vectors by dense id; level-2
    * sub-centroids are the first nl2 MEMBERS of each cell by id — both
    * deterministic k-means||-seed stand-ins each engine reproduces
    * exactly. Queries probe np1 = max(2, ⌈√nl1⌉) nearest cells and,
    * within each, np2 = max(2, ⌈√nl2⌉) nearest sub-cells.
    *
    * Scale shape: np1·np2 ≈ √T probed lists of ~n/T rows each →
    * probed rows ≈ n^(3/4), sub-linear at EVERY n — the r6-r7
    * single-level version capped nlists at 4096, so past 16.7M vectors
    * T stopped tracking √n and probing re-linearized. Assignment pays
    * O(n·(nl1+nl2)) = O(n·n^(1/4)) cosines across two broadcast joins
    * (both centroid tables ≤4096 rows; the same shape applied twice —
    * a third level buys n^(1/6) factors past 2.8×10¹⁴ vectors).
    *
    * Both engines derive every parameter from `count(*)` IN the query
    * (scalar subqueries), so the Spark result and the DuckDB oracle
    * agree at every scale factor without out-of-band parameters.
    */
  private[operators] def ivfCte(d: SqlDialect): String = {
    val (norm, cos) = normCos(d)
    val hint = d match { case SparkSql => "/*+ BROADCAST(c) */ "; case DuckSql => "" }
    s"""
WITH meta AS (SELECT vec_id, embedding, $norm AS nrm FROM embeddings),
params AS (SELECT nl1, nl2,
                  GREATEST(2, CAST(ceil(sqrt(nl1)) AS INT)) AS np1,
                  GREATEST(2, CAST(ceil(sqrt(nl2)) AS INT)) AS np2
           FROM (SELECT nl1, CAST(ceil(CAST(t AS DOUBLE) / nl1) AS INT) AS nl2
                 FROM (SELECT t, LEAST(4096, CAST(ceil(sqrt(t)) AS INT)) AS nl1
                       FROM (SELECT GREATEST(1, CAST(ceil(sqrt(count(*))) AS INT)) AS t
                             FROM meta) t0) t1) t2),
cent1 AS (SELECT vec_id AS c1, embedding, nrm FROM meta
          WHERE vec_id < (SELECT nl1 FROM params)),
a1 AS (SELECT ${hint}m.vec_id, c.c1, m.embedding AS qe, c.embedding AS ne,
              m.nrm AS qn, c.nrm AS nn
       FROM meta m CROSS JOIN cent1 c),
a1s AS (SELECT vec_id, c1, $cos AS cos FROM a1),
asg1 AS (SELECT vec_id, c1,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c1) AS rnk
         FROM a1s),
cell1 AS (SELECT vec_id, c1 FROM asg1 WHERE rnk = 1),
cent2 AS (SELECT c1, c2, embedding, nrm FROM (
            SELECT cm.c1, cm.vec_id AS c2, m.embedding, m.nrm,
                   ROW_NUMBER() OVER (PARTITION BY cm.c1 ORDER BY cm.vec_id) AS srnk
            FROM cell1 cm JOIN meta m ON cm.vec_id = m.vec_id) s
          WHERE srnk <= (SELECT nl2 FROM params)),
a2 AS (SELECT cm.vec_id, c.c1, c.c2, m.embedding AS qe, c.embedding AS ne,
              m.nrm AS qn, c.nrm AS nn
       FROM cell1 cm JOIN meta m ON cm.vec_id = m.vec_id
       JOIN cent2 c ON cm.c1 = c.c1),
a2s AS (SELECT vec_id, c1, c2, $cos AS cos FROM a2),
members AS (SELECT vec_id, c1, c2 FROM (
              SELECT vec_id, c1, c2,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c2) AS rnk
              FROM a2s) r
            WHERE rnk = 1),
probe1 AS (SELECT vec_id AS query_id, c1 FROM asg1
           WHERE vec_id < 20 AND rnk <= (SELECT np1 FROM params)),
p2 AS (SELECT p.query_id, c.c1, c.c2, q.embedding AS qe, c.embedding AS ne,
              q.nrm AS qn, c.nrm AS nn
       FROM probe1 p JOIN meta q ON p.query_id = q.vec_id
       JOIN cent2 c ON p.c1 = c.c1),
p2s AS (SELECT query_id, c1, c2, $cos AS cos FROM p2),
probe2 AS (SELECT query_id, c1, c2 FROM (
             SELECT query_id, c1, c2,
                    ROW_NUMBER() OVER (PARTITION BY query_id, c1 ORDER BY cos DESC, c2) AS rnk
             FROM p2s) r
           WHERE rnk <= (SELECT np2 FROM params)),
cand AS (SELECT p.query_id, m.vec_id AS neighbor_id
         FROM probe2 p JOIN members m
           ON p.c1 = m.c1 AND p.c2 = m.c2 AND m.vec_id <> p.query_id)"""
  }

  /** The full IVF chain ending at the exact-reranked relation `ranked`
    * (starts with WITH — compose further CTEs after it). Shared by the
    * standalone oracle, the probe helpers, and the IVF hybrid-retrieval
    * oracle ([[Retrieval]] q_hybrid_retrieval_ivf), which consumes the
    * ranked relation instead of a finished query.
    */
  private[operators] def ivfRerankCtes(d: SqlDialect): String = {
    val (_, cos) = normCos(d)
    ivfCte(d) + s""",
pairs AS (SELECT c.query_id, c.neighbor_id,
                 q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
          FROM cand c JOIN meta q ON c.query_id = q.vec_id
                      JOIN meta n ON c.neighbor_id = n.vec_id),
scored AS (SELECT query_id, neighbor_id, $cos AS cos FROM pairs),
ranked AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)"""
  }

  private def ivfSql(d: SqlDialect): String =
    ivfRerankCtes(d) + s"""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM ranked
WHERE rank <= 5
ORDER BY query_id, rank"""

  private def runIvf(spark: SparkSession, dir: String): DataFrame = {
    ensureIvfStages(spark, dir)
    spark.sql("""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
FROM ann_ivfr_v WHERE rank <= 5
ORDER BY query_id, rank""")
  }

  val qIvf = Q("q_ann_ivf", runIvf _, Some(ivfSql(DuckSql)))

  /** Index-quality gate: recall@5 of the IVF index against the brute
    * exact ground truth, per probe query — the number an ANN deployment
    * watches when tuning nlists/nprobe (the ScaleSmoke probe asserts
    * the index is sub-linear; this measures what that costs in recall).
    * Integer overlap counts only; zero-recall queries stay as explicit
    * rows. Shares `meta` between the two chains; at 100 TB the brute
    * side runs over a small held-out probe set only, exactly as here
    * (20 probes), so ground truth stays affordable.
    */
  private def ivfRecallSql(d: SqlDialect): String = {
    val (_, cos) = normCos(d)
    ivfCte(d) + s""",
pairs AS (SELECT c.query_id, c.neighbor_id,
                 q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
          FROM cand c JOIN meta q ON c.query_id = q.vec_id
                      JOIN meta n ON c.neighbor_id = n.vec_id),
scored AS (SELECT query_id, neighbor_id, $cos AS cos FROM pairs),
ivfr AS (SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         FROM scored),
bpairs AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                  q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
           FROM meta q JOIN meta n ON q.vec_id < 20 AND n.vec_id <> q.vec_id),
bscored AS (SELECT query_id, neighbor_id, $cos AS cos FROM bpairs),
bru AS (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM bscored),
ov AS (SELECT i.query_id, count(*) AS n_common
       FROM ivfr i JOIN bru b
         ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
       WHERE i.rank <= 5 AND b.rank <= 5
       GROUP BY i.query_id)
SELECT q.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT vec_id AS query_id FROM meta WHERE vec_id < 20) q
LEFT JOIN ov ON q.query_id = ov.query_id
ORDER BY q.query_id"""
  }

  private def runIvfRecall(spark: SparkSession, dir: String): DataFrame = {
    ensureIvfStages(spark, dir)
    ensureBruteStage(spark, dir)
    spark.sql("""
SELECT s.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 20) s
LEFT JOIN (SELECT i.query_id, count(*) AS n_common
           FROM ann_ivfr_v i JOIN ann_brute_v b
             ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
           WHERE i.rank <= 5 AND b.rank <= 5
           GROUP BY i.query_id) ov
  ON s.query_id = ov.query_id
ORDER BY s.query_id""")
  }

  val qIvfRecall = Q("q_ann_ivf_recall", runIvfRecall _, Some(ivfRecallSql(DuckSql)))

  // ---- streaming IVF index maintenance (frozen coarse quantizer) ----

  /** The DuckDB restatement of the streamed assignment: every vector's
    * nearest frozen level-1 centroid (cos DESC, c1 tie-break — the
    * batch asg1 chain verbatim), collapsed to per-list membership
    * stats. Shared CTE text with [[ivfStreamSparkSqlForTest]] below.
    */
  private def ivfStreamSql(d: SqlDialect): String = {
    val (norm, cos) = normCos(d)
    val hint = d match { case SparkSql => "/*+ BROADCAST(c) */ "; case DuckSql => "" }
    s"""
WITH meta AS (SELECT vec_id, embedding, $norm AS nrm FROM embeddings),
cent1 AS (SELECT vec_id AS c1, embedding, nrm FROM meta WHERE vec_id < $nl1Sub),
a1 AS (SELECT ${hint}m.vec_id, c.c1, m.embedding AS qe, c.embedding AS ne,
              m.nrm AS qn, c.nrm AS nn
       FROM meta m CROSS JOIN cent1 c),
a1s AS (SELECT vec_id, c1, $cos AS cos FROM a1),
asg1 AS (SELECT vec_id, c1,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c1) AS rnk
         FROM a1s)
SELECT c1, CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(vec_id) AS BIGINT) AS min_vec,
       CAST(max(vec_id) AS BIGINT) AS max_vec,
       CAST(sum(vec_id) AS BIGINT) AS sum_vec
FROM asg1 WHERE rnk = 1
GROUP BY c1
ORDER BY c1"""
  }

  /** Spec twin: the batch restatement on the Spark side. */
  private[graft] def ivfStreamSparkSqlForTest: String = ivfStreamSql(SparkSql)

  /** Ceiling on the literal-expression spelling of the frozen
    * quantizer ([[assignToFrozen]]) — the MEASURED codegen crossover,
    * not the 4096 metadata cap. The nl1-way `greatest()` chain of
    * array<float> literals stays inside whole-stage codegen up to
    * nl1 = 512; at 1024 the generated compare chain trips Janino's
    * 64 KB method limit, whole-stage codegen bails, and the
    * INTERPRETED greatest() goes pathological — measured on 2000
    * synthetic 64-dim vectors: exec 0.4–0.9 s at nl1 ≤ 512 vs 2.7 s at
    * 1024 and 17–36 s at 4096, while [[assignToFrozenBroadcast]] holds
    * a flat ~0.3 s at every nl1 (r20; gated each round by the
    * ScaleSmoke `frozenq` lines). Above this cap the broadcast argmax
    * routes instead — same total order, O(1) plan size, and the path
    * a real 100 TB index (nl1 ≈ √n ≫ any literal tree) uses anyway.
    */
  private[graft] final val FrozenLiteralCap = 512

  /** The per-vector argmax as a single streaming-legal PROJECTION:
    * greatest over one (cos, −c1, c1) struct per frozen centroid — max
    * cosine first, then the LOWEST c1 on exact ties (identical total
    * order to the batch chain's `ORDER BY cos DESC, c1`). No window, no
    * join: the quantizer rides inside the expression as array<float>
    * literals, which is what "frozen centroids" means operationally —
    * the index's coarse level is plan-time metadata, not a relation.
    * Crossover: use only up to [[FrozenLiteralCap]] = 512 centroids —
    * the measured whole-stage-codegen limit (see the cap's scaladoc
    * for the r20 numbers); above it [[assignToFrozenBroadcast]] is
    * strictly better (the 64 KB codegen bail makes the interpreted
    * literal chain ~100× slower than the broadcast argmax at 4096).
    */
  private[graft] def assignToFrozen(
      cents: Seq[(Long, Array[Float])]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(cents.nonEmpty, "frozen-centroid assignment needs >= 1 centroid")
    val scoredCols = cents.map { case (c1, e) =>
      struct(
        graft.functions.CosineSimilarity(col("embedding"), typedLit(e)).as("cos"),
        lit(-c1).as("negc1"), lit(c1).as("c1"))
    }
    val best =
      if (scoredCols.length == 1) scoredCols.head else greatest(scoredCols: _*)
    best.getField("c1")
  }

  /** Exact double-precision cosine mirroring
    * [[graft.functions.CosineSimilarity]]'s eval bit-for-bit (min
    * length, per-element float→double casts, sequential left-to-right
    * sums, IEEE sqrt·sqrt denominator, 0.0 on zero norm) — the
    * broadcast routing path must rank by the IDENTICAL doubles the
    * literal path's expression produces, or the two paths could
    * disagree on near-tie assignments.
    */
  private def cosineExact(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** The above-[[FrozenLiteralCap]] routing path: the frozen quantizer
    * ships as ONE broadcast variable (nl1 × dims floats) and each
    * vector routes in a stateless mapPartitions argmax — max cosine,
    * lowest c1 on exact ties, the same total order as
    * [[assignToFrozen]] (Round20OpsSpec pins path parity, ties
    * included). No literal tree, so plan cost is O(1) in nl1; per-row
    * work is the same O(nl1·dims) both paths pay. Streaming-legal
    * (stateless, no shuffle). The price vs the literal path is leaving
    * whole-stage codegen — which is why the literal spelling remains
    * the default below the cap. A null/absent embedding routes like an
    * empty array (all cosines 0.0 → lowest c1), deterministically.
    */
  private[graft] def assignToFrozenBroadcast(spark: SparkSession,
      cents: Seq[(Long, Array[Float])], df: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    require(cents.nonEmpty, "frozen-centroid assignment needs >= 1 centroid")
    val sorted = cents.sortBy(_._1).toArray
    val bc = df.sparkSession.sparkContext.broadcast(sorted)
    val embIdx = df.schema.fieldIndex("embedding")
    val outSchema = df.schema.add("c1", LongType)
    df.mapPartitions { it =>
      val cs = bc.value
      it.map { row =>
        val emb: Array[Float] =
          if (row.isNullAt(embIdx)) Array.emptyFloatArray
          else row.getSeq[Float](embIdx).toArray
        var best = 0
        var bestCos = Double.NegativeInfinity
        var k = 0
        while (k < cs.length) {
          val cos = cosineExact(emb, cs(k)._2)
          // strict > keeps the FIRST maximum — centroids are sorted by
          // c1 ascending, so ties resolve to the lowest c1, matching
          // the literal path's (cos, −c1) struct order
          if (cos > bestCos) { bestCos = cos; best = k }
          k += 1
        }
        Row.fromSeq(row.toSeq :+ cs(best)._1)
      }
    }(Encoders.row(outSchema))
  }

  /** The frozen level-1 quantizer for `dir`'s corpus, collected to the
    * driver (≤ 4096 rows × 64 floats ≈ 1 MiB — index metadata, the same
    * class of driver literal as the incremental-dedup modulus).
    */
  private[graft] def frozenCentroids(spark: SparkSession, dir: String): Seq[(Long, Array[Float])] = {
    ensureEmbeddings(spark, dir)
    val nl1 = spark.sql(s"SELECT $nl1Sub AS nl1").head().getInt(0)
    spark.sql(s"SELECT vec_id AS c1, embedding FROM embeddings WHERE vec_id < $nl1")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
  }

  /** Streaming ANN index maintenance (r18 VERDICT task 5): new vectors
    * arrive as a file stream and are assigned to the FROZEN level-1
    * coarse quantizer — the index-freshness topology every streaming
    * vector store runs (centroids retrain offline; ingest only routes).
    * Completes the retrieval family's freshness story next to
    * q_bm25_index_stream (lexical) and q_dedup_embedding_incr_stream
    * (dedup verdicts).
    *
    * Shape: the assignment is a stateless map-only projection
    * ([[assignToFrozen]] — the quantizer is broadcast-free plan
    * metadata); the ONLY stateful operator is the per-list membership
    * aggregate, whose state is hard-bounded by the key domain — ≤ nl1
    * rows, one per inverted list, regardless of stream length
    * (StreamingAnnSpec asserts the bound across micro-batches and
    * batch-parity of the final table). At 100 TB: same plan, nl1 ≤
    * 4096 state rows per aggregation, vectors never cross executors
    * before the tiny keyed shuffle onto ≤ nl1 keys.
    *
    * Oracle: the batch asg1 restatement ([[ivfStreamSql]]) — the
    * streamed complete-mode table must equal the batch assignment
    * bit-for-bit (cosine parity discipline of the whole ANN family).
    */
  val qIvfStream = Q(
    "q_ann_ivf_stream",
    (spark, dir) => graft.GraftSession.withStreamingShuffle(spark,
      graft.GraftSession.adaptiveStreamParts(spark, dir, "embeddings"), noDataBatch = false) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      import spark.implicits._
      val cents = frozenCentroids(spark, dir)
      if (cents.isEmpty) {
        // empty corpus → no frozen lists, nothing to route; preserve
        // the output schema (the EmptyCorpusSpec contract)
        spark.sql(
          """SELECT CAST(0 AS BIGINT) AS c1, CAST(0 AS BIGINT) AS n_members,
                    CAST(0 AS BIGINT) AS min_vec, CAST(0 AS BIGINT) AS max_vec,
                    CAST(0 AS BIGINT) AS sum_vec""").limit(0)
      } else {
        val embSchema = StructType(Seq(
          StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)),
          StructField("label", IntegerType)))
        val stream = graft.Tables.streamTable(spark, dir, "embeddings", embSchema)
        val sinkName = graft.GraftSession.newSinkName(spark, "ivs")
        // literal-expression routing up to FrozenLiteralCap = 512 (the
        // measured codegen crossover — the catalog's nl1 = min(4096,
        // ceil(sqrt(T))) reaches 512 only past ~7e10 vectors); above
        // it the broadcast argmax routes, which is also the 100 TB
        // path where nl1 ≈ √n outgrows any literal tree
        // (Round20OpsSpec pins path parity, ties included)
        val routed =
          if (cents.size <= FrozenLiteralCap)
            stream.withColumn("c1", assignToFrozen(cents))
          else assignToFrozenBroadcast(spark, cents, stream)
        val q = routed
          .groupBy($"c1")
          .agg(
            count(lit(1)).as("n_members"),
            min($"vec_id").as("min_vec"),
            max($"vec_id").as("max_vec"),
            sum($"vec_id").as("sum_vec"))
          .writeStream.outputMode("complete")
          .format("memory").queryName(sinkName)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.table(sinkName).orderBy("c1")
      }
    },
    Some(ivfStreamSql(DuckSql)))

  // ---- LSH-bucketed ANN (sign-hyperplane tables, hamming-1 multi-probe) ----

  /** The LSH-bucketed scale path for similarity search — the classic
    * alternative to IVF: [[LshTables]] independent hash tables, table t
    * keyed by the sign pattern of embedding dims 16t+1..16t+16 (16
    * axis-aligned hyperplanes per table — the same engine-portable sign
    * bits the embedding-dedup family uses, [[Dedup]] `signWord`), folded
    * to an ADAPTIVE power-of-two modulus M = min 2^k with
    * M · [[LshTargetBucket]] ≥ n — so expected bucket occupancy stays
    * ≈ [[LshTargetBucket]] at every corpus size (the literal powers
    * table avoids cross-engine `ceil(log2)`, as in the dedup modulus).
    * Queries MULTI-PROBE each table at their own bucket plus every
    * hamming-1 neighbor bucket (XOR with each power of two < M) — the
    * standard recall lever that probes the buckets a single flipped
    * sign bit would have landed in.
    *
    * Scale shape: probed rows per query ≈ L · (1 + log₂M) · occupancy
    * = O(L · log n · TargetBucket) — LOGARITHMIC in corpus size, vs the
    * IVF's n^(3/4) and brute's n. The price is recall, measured honestly
    * by [[qLshRecall]] against the brute ground truth (the deployment
    * dial: more tables or more probes buys recall at linear probe cost).
    * Index build is L narrow sign-projections of the corpus — no
    * distance computations at all, vs IVF's O(n·n^(1/4)) assignment
    * cosines; re-ranking is exact cosine over the candidate set only.
    * Per-(table, bucket) frequency cap [[LshBucketCap]] is the skew
    * backstop bounding any single probe (the family's BandCap).
    */
  private val LshTables = 4
  private val LshTargetBucket = 128L
  private val LshBucketCap = 2048L

  /** Smallest power-of-two modulus M (2³..2¹⁶) with M · target ≥ n. */
  private def lshModulusSub: String = {
    val powers = (3 to 16).map(k => s"(CAST(${1L << k} AS BIGINT))").mkString(", ")
    s"""(SELECT coalesce(min(p), CAST(${1L << 16} AS BIGINT))
   FROM (VALUES $powers) pw(p)
   WHERE p * $LshTargetBucket >= (SELECT count(*) FROM embeddings))"""
  }

  /** 16-bit sign word of table t (dims 16t+1 .. 16t+16). */
  private def lshWord(d: SqlDialect, t: Int): String = (1 to 16)
    .map(i =>
      s"(CASE WHEN ${d.el("embedding", (16 * t + i).toString)} >= 0 THEN CAST(${1L << (i - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    .mkString(" + ")

  /** Hamming-1 probe masks: every power of two below the modulus. */
  private val lshProbePowers =
    (0 until 16).map(k => s"(CAST(${1L << k} AS BIGINT))").mkString(", ")

  /** Oracle CTE chain ending in `lranked` (candidates reranked by exact
    * cosine). `meta` must already be in scope ([[normCos]] norms).
    */
  private def lshCte(d: SqlDialect): String = {
    val (norm, cos) = normCos(d)
    val m = lshModulusSub
    val tables = (0 until LshTables)
      .map(t => s"SELECT vec_id, $t AS tbl, (${lshWord(d, t)}) % $m AS bucket FROM embeddings")
      .mkString("\n        UNION ALL ")
    s"""
WITH meta AS (SELECT vec_id, embedding, $norm AS nrm FROM embeddings),
lsh AS ($tables),
lbf AS (SELECT tbl, bucket, count(*) AS nmem FROM lsh GROUP BY tbl, bucket),
lshf AS (SELECT l.vec_id, l.tbl, l.bucket
         FROM lsh l JOIN lbf f ON l.tbl = f.tbl AND l.bucket = f.bucket
         WHERE f.nmem <= $LshBucketCap),
lprobe AS (SELECT vec_id AS query_id, tbl, bucket FROM lsh WHERE vec_id < 20
           UNION ALL
           SELECT l.vec_id, l.tbl, ${d.xor("l.bucket", "pw.p")}
           FROM lsh l CROSS JOIN (VALUES $lshProbePowers) pw(p)
           WHERE l.vec_id < 20 AND pw.p < $m),
lcand AS (SELECT DISTINCT p.query_id, m2.vec_id AS neighbor_id
          FROM lprobe p JOIN lshf m2 ON p.tbl = m2.tbl AND p.bucket = m2.bucket
          WHERE m2.vec_id <> p.query_id),
lpairs AS (SELECT c.query_id, c.neighbor_id,
                  q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
           FROM lcand c JOIN meta q ON c.query_id = q.vec_id
                        JOIN meta n ON c.neighbor_id = n.vec_id),
lscored AS (SELECT query_id, neighbor_id, $cos AS cos FROM lpairs),
lranked AS (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM lscored)"""
  }

  private def lshSql(d: SqlDialect): String = lshCte(d) + s"""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM lranked
WHERE rank <= 5
ORDER BY query_id, rank"""

  /** Spark-side LSH stages: the bucket index (narrow, no cosines) and
    * the reranked probe results, cached and shared by the top-k query
    * and the recall gate — nested-subquery spellings over the cached
    * views (StageViews CTE note).
    */
  private def ensureLshStages(spark: SparkSession, dir: String): Unit = {
    ensureEmbeddings(spark, dir)
    val m = lshModulusSub
    val tables = (0 until LshTables)
      .map(t => s"SELECT vec_id, $t AS tbl, (${lshWord(SparkSql, t)}) % $m AS bucket FROM embeddings")
      .mkString("\nUNION ALL ")
    StageViews.ensureCached(spark, "ann_lsh_v", dir)(spark.sql(tables))
    StageViews.ensureCached(spark, "ann_lshr_v", dir)(spark.sql(s"""
SELECT query_id, neighbor_id, rank FROM (
  SELECT c.query_id, c.neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY c.query_id
                            ORDER BY cosine_similarity(q.embedding, n.embedding) DESC, c.neighbor_id) AS rank
  FROM (SELECT DISTINCT p.query_id, m2.vec_id AS neighbor_id
        FROM (SELECT vec_id AS query_id, tbl, bucket FROM ann_lsh_v WHERE vec_id < 20
              UNION ALL
              SELECT l.vec_id, l.tbl, ${SparkSql.xor("l.bucket", "pw.p")}
              FROM ann_lsh_v l CROSS JOIN (VALUES $lshProbePowers) pw(p)
              WHERE l.vec_id < 20 AND pw.p < $m) p
        JOIN (SELECT l.vec_id, l.tbl, l.bucket
              FROM ann_lsh_v l
              JOIN (SELECT tbl, bucket, count(*) AS nmem FROM ann_lsh_v GROUP BY tbl, bucket) f
                ON l.tbl = f.tbl AND l.bucket = f.bucket
              WHERE f.nmem <= $LshBucketCap) m2
          ON p.tbl = m2.tbl AND p.bucket = m2.bucket
        WHERE m2.vec_id <> p.query_id) c
  JOIN embeddings q ON c.query_id = q.vec_id
  JOIN embeddings n ON c.neighbor_id = n.vec_id)
WHERE rank <= 5"""))
    ()
  }

  private def runLsh(spark: SparkSession, dir: String): DataFrame = {
    ensureLshStages(spark, dir)
    spark.sql("""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
FROM ann_lshr_v WHERE rank <= 5
ORDER BY query_id, rank""")
  }

  val qLsh = Q("q_ann_lsh", runLsh _, Some(lshSql(DuckSql)))

  /** Recall@5 of the LSH index vs brute ground truth — the honest cost
    * of the O(log n) probe shape, per probe query ([[qIvfRecall]]'s
    * exact pattern; zero-candidate queries stay as explicit rows).
    */
  private def lshRecallSql(d: SqlDialect): String = {
    val (_, cos) = normCos(d)
    lshCte(d) + s""",
bpairs AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                  q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
           FROM meta q JOIN meta n ON q.vec_id < 20 AND n.vec_id <> q.vec_id),
bscored AS (SELECT query_id, neighbor_id, $cos AS cos FROM bpairs),
bru AS (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM bscored),
ov AS (SELECT i.query_id, count(*) AS n_common
       FROM lranked i JOIN bru b
         ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
       WHERE i.rank <= 5 AND b.rank <= 5
       GROUP BY i.query_id)
SELECT q.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT vec_id AS query_id FROM meta WHERE vec_id < 20) q
LEFT JOIN ov ON q.query_id = ov.query_id
ORDER BY q.query_id"""
  }

  private def runLshRecall(spark: SparkSession, dir: String): DataFrame = {
    ensureLshStages(spark, dir)
    ensureBruteStage(spark, dir)
    spark.sql("""
SELECT s.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 20) s
LEFT JOIN (SELECT i.query_id, count(*) AS n_common
           FROM ann_lshr_v i JOIN ann_brute_v b
             ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
           WHERE i.rank <= 5 AND b.rank <= 5
           GROUP BY i.query_id) ov
  ON s.query_id = ov.query_id
ORDER BY s.query_id""")
  }

  val qLshRecall = Q("q_ann_lsh_recall", runLshRecall _, Some(lshRecallSql(DuckSql)))

  /** The adaptive LSH modulus chosen for `key`'s corpus (spec
    * observability — the dial that keeps bucket occupancy constant).
    */
  private[graft] def lshModulusOn(spark: SparkSession, key: String,
      emb: => DataFrame): Long = {
    StageViews.ensure(spark, "embeddings", key)(StageViews.widen(spark, emb, "vec_id"))
    spark.sql(s"SELECT $lshModulusSub AS m").head().getLong(0)
  }

  /** Distinct probed candidate count across the 20 probe queries — the
    * quantity whose growth must be ≈ L · log₂(modulus) · occupancy,
    * i.e. LOGARITHMIC in corpus size (ScaleSmoke asserts the ratio).
    */
  private[graft] def lshCandidatesOn(spark: SparkSession, key: String,
      emb: => DataFrame): Long = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.ensure(spark, "embeddings", key)(StageViews.widen(spark, emb, "vec_id"))
    spark.sql(lshCte(SparkSql) + "\nSELECT count(*) AS n FROM lcand")
      .head().getLong(0)
  }

  /** LSH top-k over an arbitrary embeddings frame (spec seam). */
  private[graft] def lshOn(spark: SparkSession, key: String,
      emb: => DataFrame): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.ensure(spark, "embeddings", key)(StageViews.widen(spark, emb, "vec_id"))
    spark.sql(lshSql(SparkSql))
  }

  /** Grouped embedding centroids with exact arithmetic: per group, the
    * per-dimension MEAN computed over milli-quantized components —
    * `sum(round(x·1000))` is an exact BIGINT fold (map-side
    * combinable, partition-order-free), and the final division is one
    * deterministic double op. This is the scale-correct shape for
    * centroid/cluster-mean updates (IVF training, k-means steps):
    * a raw float sum would be partition-order-sensitive and
    * non-reproducible across engines AND across runs. First 4 of 64
    * dims emitted (the pattern is per-dimension identical).
    */
  private def centroidSql(d: SqlDialect): String = {
    val dims = (1 to 4).map { i =>
      val el = d.el("embedding", i.toString)
      s"CAST(CAST(sum(CAST(round(CAST($el AS DOUBLE) * 1000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000.0e0 / CAST(count(*) AS DOUBLE) AS c$i"
    }
    s"""
SELECT CAST(vec_id % 5 AS BIGINT) AS grp, count(*) AS n,
       ${dims.mkString(",\n       ")}
FROM embeddings
GROUP BY vec_id % 5
ORDER BY grp"""
  }

  val qCentroids = Q("q_embedding_centroids", run(centroidSql(SparkSql)), Some(centroidSql(DuckSql)))

  /** IVF over an arbitrary embeddings frame (ScaleSmoke's ×m probe). */
  private[graft] def ivfOn(spark: SparkSession, key: String,
      emb: => DataFrame): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.ensure(spark, "embeddings", key)(StageViews.widen(spark, emb, "vec_id"))
    spark.sql(ivfSql(SparkSql))
  }

  /** Candidate (probed) row count for the same IVF plan — the quantity
    * that must grow SUB-linearly with corpus size for the index to be
    * an index. ScaleSmoke asserts probed(×m)/probed(×1) ≪ m.
    */
  private[graft] def ivfProbedOn(spark: SparkSession, key: String,
      emb: => DataFrame): Long = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.ensure(spark, "embeddings", key)(StageViews.widen(spark, emb, "vec_id"))
    spark.sql(ivfCte(SparkSql) + "\nSELECT count(*) AS probed FROM cand")
      .head().getLong(0)
  }

  /** Mean recall@5 over the 20 probe queries for `key`'s corpus — the
    * ScaleSmoke recall-vs-scale gate (r16 VERDICT task 6). The oracle-SF
    * recall gates (q_ann_ivf_recall) pin recall at ONE size; this runs
    * the same self-contained recall computation at replicated sizes so
    * the probe budget's n^(3/4) growth is shown to keep FINDING the
    * true neighbors, not just to stay sub-linear. Uses the CTE spelling
    * (not the cached stage views): each multiple is its own corpus key
    * and the relations are built, read once, and dropped.
    */
  private[graft] def ivfRecallAt5On(spark: SparkSession, key: String,
      emb: => DataFrame): Double = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.ensure(spark, "embeddings", key)(StageViews.widen(spark, emb, "vec_id"))
    val rows = spark.sql(ivfRecallSql(SparkSql)).collect()
    if (rows.isEmpty) 0.0
    else rows.map(_.getLong(1)).sum.toDouble / (rows.length * 5.0)
  }

  /** The derived (T, nl1, nl2, np1, np2) for `key`'s corpus — spec
    * observability for the parameter math at synthetic corpus sizes
    * the assignment joins could never run at inside a test (the
    * 30M-vector case where the old single-level 4096 cap froze T).
    * Count-only: embedding values are never read.
    */
  private[graft] def ivfParamsOn(spark: SparkSession, key: String,
      emb: => DataFrame): (Int, Int, Int, Int, Int) = {
    StageViews.ensure(spark, "embeddings", key)(emb)
    val r = spark.sql(
      s"SELECT $tSub AS t, $nl1Sub AS nl1, $nl2Sub AS nl2, $np1Sub AS np1, $np2Sub AS np2").head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  // ---- k-NN classification (majority vote over brute top-10) ----

  /** The similarity stack as an ML primitive: classify each query
    * vector by the majority label of its 10 nearest neighbors
    * (excluding itself), tie-broken by smaller label — all integer
    * after ranking, so the vote and the verdict hash-compare. Same
    * cost shape as the brute top-k (shard + per-shard rank + merge at
    * 100 TB; swap the candidate CTE for the IVF one to trade recall
    * for scan cost).
    */
  private def knnSql(d: SqlDialect): String = {
    val (norm, cos) = normCos(d)
    s"""
WITH meta AS (SELECT vec_id, embedding, label, $norm AS nrm FROM embeddings),
pairs AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.label AS nlabel,
                 q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
          FROM meta q JOIN meta n ON q.vec_id < 20 AND n.vec_id <> q.vec_id),
scored AS (SELECT query_id, neighbor_id, nlabel, $cos AS cos FROM pairs),
ranked AS (SELECT query_id, neighbor_id, nlabel,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored),
votes AS (SELECT query_id, nlabel, count(*) AS v
          FROM ranked WHERE rank <= 10 GROUP BY query_id, nlabel),
pred AS (SELECT query_id, nlabel, v,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY v DESC, nlabel) AS pr
         FROM votes)
SELECT p.query_id, CAST(m.label AS BIGINT) AS true_label,
       CAST(p.nlabel AS BIGINT) AS predicted_label,
       CAST(p.v AS BIGINT) AS votes
FROM pred p JOIN meta m ON p.query_id = m.vec_id
WHERE p.pr = 1
ORDER BY p.query_id"""
  }

  /** Spark side: the neighbor ranking is EXACTLY the cached brute
    * relation (same cosine, same tie-break), so k-NN is a thin
    * label-join + vote over `ann_brute_v` — nested subqueries, not a
    * CTE, so the cache substitutes (StageViews note).
    */
  private def runKnn(spark: SparkSession, dir: String): DataFrame = {
    ensureBruteStage(spark, dir)
    spark.sql("""
SELECT p.query_id, CAST(m.label AS BIGINT) AS true_label,
       CAST(p.nlabel AS BIGINT) AS predicted_label,
       CAST(p.v AS BIGINT) AS votes
FROM (SELECT query_id, nlabel, v,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY v DESC, nlabel) AS pr
      FROM (SELECT b.query_id, n.label AS nlabel, count(*) AS v
            FROM ann_brute_v b JOIN embeddings n ON b.neighbor_id = n.vec_id
            WHERE b.rank <= 10
            GROUP BY b.query_id, n.label) votes) p
JOIN embeddings m ON p.query_id = m.vec_id
WHERE p.pr = 1
ORDER BY p.query_id""")
  }

  val qKnn = Q("q_knn_classify", runKnn _, Some(knnSql(DuckSql)))

  // ---- matryoshka truncation quality (recall@10 of 32-dim prefixes) ----

  /** MRL-style evaluation: how much nearest-neighbor structure survives
    * truncating embeddings to their first 32 of 64 dims (the
    * matryoshka/ANN-tiering question — serve a cheap prefix index, then
    * rerank with full vectors). For each of the 20 probe queries, emits
    * |top10(full cosine) ∩ top10(truncated cosine)| — integer output,
    * so cross-engine double ulps stay internal (ties measure-zero, as
    * for the rank queries above). Scale: same shard-and-merge shape as
    * the brute baseline; the truncated pass reads a 32-dim slice, which
    * is exactly the I/O saving the tiering buys at 100 TB.
    */
  private def mrlSql(d: SqlDialect): String = {
    val (norm, cos) = normCos(d)
    val sumT = (a: String, b: String) =>
      s"(SELECT sum(CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)) FROM range(1, 33) t(i))"
    val cosT = d match {
      case SparkSql => "cosine_similarity(slice(qe, 1, 32), slice(ne, 1, 32))"
      case DuckSql =>
        s"(${sumT("qe", "ne")} / (sqrt(${sumT("qe", "qe")}) * sqrt(${sumT("ne", "ne")})))"
    }
    s"""
WITH meta AS (SELECT vec_id, embedding, $norm AS nrm FROM embeddings),
pairs AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 q.embedding AS qe, n.embedding AS ne, q.nrm AS qn, n.nrm AS nn
          FROM meta q JOIN meta n ON q.vec_id < 20 AND n.vec_id <> q.vec_id),
scored AS (SELECT query_id, neighbor_id, $cos AS cosf, $cosT AS cost FROM pairs),
rf AS (SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosf DESC, neighbor_id) AS rkf
       FROM scored),
rt AS (SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cost DESC, neighbor_id) AS rkt
       FROM scored),
ov AS (SELECT f.query_id, count(*) AS n_common
       FROM rf f JOIN rt t ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
       WHERE f.rkf <= 10 AND t.rkt <= 10
       GROUP BY f.query_id)
SELECT q.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT DISTINCT query_id FROM scored) q
LEFT JOIN ov ON q.query_id = ov.query_id
ORDER BY q.query_id"""
  }

  /** Spark side: the scored pair relation (full + truncated cosine per
    * candidate pair) is computed ONCE into a cached stage view — the
    * WITH-CTE spelling would inline `scored` into BOTH rank branches
    * and score every pair twice off six parquet scans (audited). The
    * cache is 4 narrow columns × (queries · corpus) rows; both rankings
    * and the total-query spine read it.
    */
  private def runMrl(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.embeddings(spark, dir)
    StageViews.ensureCached(spark, "mrl_scored_v", dir)(spark.sql("""
SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       cosine_similarity(q.embedding, n.embedding) AS cosf,
       cosine_similarity(slice(q.embedding, 1, 32), slice(n.embedding, 1, 32)) AS cost
FROM embeddings q JOIN embeddings n
  ON q.vec_id < 20 AND n.vec_id <> q.vec_id"""))
    spark.sql("""
SELECT q.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT DISTINCT query_id FROM mrl_scored_v) q
LEFT JOIN (SELECT f.query_id, count(*) AS n_common
           FROM (SELECT query_id, neighbor_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosf DESC, neighbor_id) AS rkf
                 FROM mrl_scored_v) f
           JOIN (SELECT query_id, neighbor_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cost DESC, neighbor_id) AS rkt
                 FROM mrl_scored_v) t
             ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
           WHERE f.rkf <= 10 AND t.rkt <= 10
           GROUP BY f.query_id) ov
  ON q.query_id = ov.query_id
ORDER BY q.query_id""")
  }

  val qMrl = Q("q_mrl_recall", runMrl _, Some(mrlSql(DuckSql)))

  // ---- built-in higher-order-function vector math ----

  /** Vector arithmetic with ONLY built-in higher-order functions —
    * `zip_with` for the elementwise product, `aggregate` for the
    * sequential fold — no UDF, no custom expression. This is the
    * "functions, not UDFs" floor for embedding math when a codegen'd
    * custom Expression isn't on the table; both fold in array order,
    * so the doubles are bit-identical to the oracle's ordered series
    * sum AND to [[graft.functions.CosineSimilarity]], which the query
    * also cross-checks (exact-equality boolean — same fold order means
    * the custom expression earns its keep on speed, not on different
    * numerics). Per-row projections over consecutive-id pairs; no
    * shuffle before the final sort.
    */
  val qHofVector = Q(
    "q_hof_vector_math",
    (spark, dir) => {
      import spark.implicits._
      graft.functions.CosineSimilarity.register(spark)
      StageViews.embeddings(spark, dir)
      spark.sql("""
SELECT vec_id, dot, cos_hof, (cos_hof = cos_expr) AS matches_custom_expr
FROM (SELECT a.vec_id,
             aggregate(zip_with(a.embedding, b.embedding,
                                (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                       CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS dot,
             aggregate(zip_with(a.embedding, b.embedding,
                                (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                       CAST(0 AS DOUBLE), (acc, v) -> acc + v)
               / (sqrt(aggregate(transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                 CAST(0 AS DOUBLE), (acc, v) -> acc + v))
                  * sqrt(aggregate(transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                   CAST(0 AS DOUBLE), (acc, v) -> acc + v))) AS cos_hof,
             cosine_similarity(a.embedding, b.embedding) AS cos_expr
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 20)
ORDER BY vec_id""")
    },
    Some("""
WITH pairs AS (SELECT a.vec_id, a.embedding AS ea, b.embedding AS eb
               FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
               WHERE a.vec_id < 20),
m AS (SELECT vec_id,
             (SELECT sum(CAST(list_extract(ea, i) AS DOUBLE) * CAST(list_extract(eb, i) AS DOUBLE))
              FROM range(1, 65) t(i)) AS dot,
             (SELECT sum(CAST(list_extract(ea, i) AS DOUBLE) * CAST(list_extract(ea, i) AS DOUBLE))
              FROM range(1, 65) t(i)) AS na,
             (SELECT sum(CAST(list_extract(eb, i) AS DOUBLE) * CAST(list_extract(eb, i) AS DOUBLE))
              FROM range(1, 65) t(i)) AS nb
      FROM pairs)
SELECT vec_id, dot, dot / (sqrt(na) * sqrt(nb)) AS cos_hof,
       true AS matches_custom_expr
FROM m ORDER BY vec_id"""))

  // ---- mutual-kNN graph over the sign-bucket LSH ----

  /** Neighbors kept per vector before the mutuality filter. */
  val KnnGraphK = 3

  /** Adaptive power-of-two modulus for the SINGLE (non-doubled) corpus —
    * the same integer-exact derivation as the embedding-dedup family's
    * ([[Dedup.powModulusSub]]), sized so buckets hold
    * ~[[Dedup.EmbedTargetBucket]] vectors in expectation.
    */
  private def knnGraphModulusSub: String =
    Dedup.powModulusSub("(SELECT count(*) FROM embeddings)")

  /** Mutual-kNN graph construction — the neighborhood graph semantic
    * clustering and SemDeDup-style curation build over a corpus's
    * embeddings: an edge (a, b) exists iff b is in a's top-[[KnnGraphK]]
    * cosine neighbors AND a is in b's (mutuality kills the hub/antihub
    * asymmetry of directed kNN). Candidates come from the adaptive
    * sign-bucket LSH (same blocking as q_dedup_embedding, on the
    * single corpus), so the graph is the BLOCKED approximation every
    * billion-scale pipeline actually computes — only same-bucket pairs
    * can become edges, which the spec pins as a law.
    *
    * Determinism: cosines are identical IEEE doubles in both engines
    * (the Similarity-family argument), ranks break ties by neighbor id,
    * and the output is id/rank columns only — all BIGINT.
    *
    * Scale shape: bucket sizes are ~[[Dedup.EmbedTargetBucket]] by the
    * adaptive modulus and hard-capped by [[Dedup.EmbedBucketCap]]
    * (dropped whole, the dedup family's skew backstop), so candidates
    * are O(n · bucket) — never quadratic; the per-vector rank windows
    * partition on vec_id, and the mutuality join is keyed on the
    * ≤ [[KnnGraphK]]·n top relation.
    */
  private def knnGraphSql(d: SqlDialect): String = {
    val (normExpr, cosExpr) = d match {
      case SparkSql => ("CAST(0 AS DOUBLE)", "cosine_similarity(ea, eb)")
      case DuckSql => (
        "sqrt((SELECT sum(CAST(list_extract(embedding, i) AS DOUBLE) * CAST(list_extract(embedding, i) AS DOUBLE)) FROM range(1, 65) t(i)))",
        "(SELECT sum(CAST(list_extract(ea, i) AS DOUBLE) * CAST(list_extract(eb, i) AS DOUBLE)) FROM range(1, 65) t(i)) / (na * nb)")
    }
    s"""
WITH meta AS (SELECT vec_id, embedding, $normExpr AS nrm,
                     (${Dedup.signWord(d)}) % $knnGraphModulusSub AS bucket
              FROM embeddings),
bf AS (SELECT bucket, count(*) AS nmem FROM meta GROUP BY bucket),
metaf AS (SELECT m.vec_id, m.embedding, m.nrm, m.bucket
          FROM meta m JOIN bf f ON m.bucket = f.bucket
          WHERE f.nmem <= ${Dedup.EmbedBucketCap}),
cand AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                a.embedding AS ea, b.embedding AS eb, a.nrm AS na, b.nrm AS nb
         FROM metaf a JOIN metaf b
           ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
sc AS (SELECT va, vb, $cosExpr AS cs FROM cand),
rk AS (SELECT va, vb,
              CAST(ROW_NUMBER() OVER (PARTITION BY va ORDER BY cs DESC, vb) AS BIGINT) AS rnk
       FROM sc),
top AS (SELECT va, vb, rnk FROM rk WHERE rnk <= $KnnGraphK),
mutual AS (SELECT f.va AS vec_a, f.vb AS vec_b, f.rnk AS rank_ab, r.rnk AS rank_ba
           FROM top f JOIN top r ON f.va = r.vb AND f.vb = r.va
           WHERE f.va < f.vb)
SELECT CAST(vec_a AS BIGINT) AS vec_a, CAST(vec_b AS BIGINT) AS vec_b,
       rank_ab, rank_ba
FROM mutual ORDER BY vec_a, vec_b"""
  }

  /** Spark staged spelling: the expensive part — bucketing, candidate
    * join, cosine scoring, per-vector rank — is ONE cached narrow
    * relation (`knng_top_v`: va, vb, rnk); the mutuality self-join then
    * reads the cache twice instead of recomputing the candidate join
    * per mention (the WITH-CTE re-inlining lesson).
    */
  /** Frequency-capped bucketed corpus over the cached bucket stage. */
  private def knngCapped: String = s"""(SELECT m.vec_id, m.embedding, m.bucket
      FROM knng_bkt_v m
      JOIN (SELECT bucket, count(*) AS nmem FROM knng_bkt_v GROUP BY bucket) f
        ON m.bucket = f.bucket
      WHERE f.nmem <= ${Dedup.EmbedBucketCap})"""

  private[graft] def knnGraphOn(spark: SparkSession, key: String,
      emb: => DataFrame): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.ensure(spark, "embeddings", key)(
      StageViews.widen(spark, emb, "vec_id"))
    // one corpus scan computes the sign bucket; the cap filter and both
    // sides of the candidate join read the cache
    StageViews.ensureCached(spark, "knng_bkt_v", key)(spark.sql(s"""
SELECT vec_id, embedding,
       (${Dedup.signWord(SparkSql)}) % $knnGraphModulusSub AS bucket
FROM embeddings"""))
    StageViews.ensureCached(spark, "knng_top_v", key)(spark.sql(s"""
SELECT va, vb, rnk FROM (
  SELECT va, vb,
         CAST(ROW_NUMBER() OVER (PARTITION BY va ORDER BY cs DESC, vb) AS BIGINT) AS rnk
  FROM (SELECT a.vec_id AS va, b.vec_id AS vb,
               cosine_similarity(a.embedding, b.embedding) AS cs
        FROM $knngCapped a JOIN $knngCapped b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id))
WHERE rnk <= $KnnGraphK"""))
    spark.sql(s"""
SELECT CAST(vec_a AS BIGINT) AS vec_a, CAST(vec_b AS BIGINT) AS vec_b,
       rank_ab, rank_ba
FROM (SELECT f.va AS vec_a, f.vb AS vec_b, f.rnk AS rank_ab, r.rnk AS rank_ba
      FROM knng_top_v f JOIN knng_top_v r ON f.va = r.vb AND f.vb = r.va
      WHERE f.va < f.vb)
ORDER BY vec_a, vec_b""")
  }

  val qKnnGraph = Q(
    "q_knn_graph",
    (spark, dir) => knnGraphOn(spark, dir, graft.Tables.embeddings(spark, dir)),
    Some(knnGraphSql(DuckSql)))

  val all: Seq[Q] =
    Seq(qBrute, qIvf, qIvfRecall, qIvfStream, qLsh, qLshRecall, qCentroids,
      qKnn, qMrl, qHofVector, qKnnGraph)
}
