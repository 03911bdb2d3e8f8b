package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Product quantization of the embedding column — the compression that
  * makes billion-vector ANN feasible (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * [[Dim]]-dim vector into [[M]] contiguous [[Dsub]]-dim subvectors,
  * quantize each against its own K-codeword codebook, and search with
  * ASYMMETRIC distance (ADC) — the query stays full-precision, each
  * database vector is priced through its reconstruction, so a 256-byte
  * float32 vector becomes [[M]] = 8 one-byte codes (32× smaller) while
  * distances stay far better than symmetric code-vs-code.
  *
  * Codebooks: codeword j of subspace m is the m-th subvector of the
  * vector with `vec_id = j`, j < K = min(256, n) — the same
  * deterministic k-means-seed stand-in the IVF family uses for its
  * centroids ([[Similarity]]), reproduced exactly by both engines (a
  * Lloyd refinement would only move codewords; every law here — code
  * range, argmin tie-break, ADC-vs-exact recall accounting — is
  * invariant to WHERE the codewords sit, which is precisely what the
  * oracle gates).
  *
  * Cross-engine float discipline (the [[Similarity]] header contract):
  * all distances are doubles built from the same float→double casts and
  * the same SEQUENTIAL fold (Spark: [[graft.functions.SubL2]]'s
  * left-to-right loop; the oracle's correlated `sum() FROM range(...)`
  * is the house spelling 15 rounds of hash-equality pin as
  * order-stable),
  * doubles never surface in output — only codes, ids, ranks, and
  * overlap counts (all BIGINT) — and every argmin/rank breaks exact
  * ties on the integer id, so bit-equal doubles on both sides yield
  * identical integers. Code assignment is ONE map-side-combinable
  * `min(struct(dist, j))` aggregate (lexicographic struct order = the
  * tie rule), no per-(vector, subspace) window shuffle; the
  * subdistance itself is the fused codegen expression
  * [[graft.functions.SubL2]] — the HOF slice/zip_with/fold spelling
  * allocated three arrays per pair and measured 10× slower on the
  * n·K·M assignment pass.
  *
  * Scale shape (the 100 TB reading):
  *  - the codebook is K·M rows ≤ 2048 — broadcast, like every centroid
  *    table in this engine;
  *  - encoding is ONE broadcast join, n·K·M subdistances of [[Dsub]]
  *    mults each, reduced by map-side-combinable min aggregates —
  *    embarrassingly parallel, O(n) shuffle rows (n·M narrow codes);
  *  - the code table is the 32×-smaller artifact downstream ANN reads;
  *    reconstruction is a code-table join against the broadcast
  *    codebook;
  *  - ADC search prices probe × corpus through reconstructions — here
  *    the full cross product (20 probes), at 100 TB the probe set rides
  *    an IVF/LSH candidate list first (`q_ann_ivf` / `q_ann_lsh`), with
  *    PQ shrinking the candidates' residency 32×. Real deployments
  *    hoist the per-(probe, subspace) distance TABLE out of the loop;
  *    relationally that is exactly the broadcast join this plan runs.
  *
  * `q_pq_encode` gates the assignment (every (vector, subspace) code,
  * integer-exact); `q_pq_recall` gates ADC search quality the
  * `q_ann_ivf_recall` way — top-[[TopK]] ADC neighbors vs exact-L2
  * ground truth per probe, overlap as BIGINT, zero-recall probes kept
  * as explicit rows. `PqSpec` pins the laws on hand corpora: exact
  * reconstruction ⇒ perfect recall, argmin tie → lowest j, codes cover
  * the corpus × subspace grid.
  */
object Pq {

  val Dim = 64
  val M = 8
  val Dsub = 8
  val Probes = 20
  val TopK = 5

  /** K = min(256, corpus size), derived in-query (house style: no
    * out-of-band parameters; both engines agree at every SF).
    */
  private val kSub = "(SELECT LEAST(256, count(*)) FROM pq_emb_v)"


  /** Register the PQ stages for corpus `emb` under `key`:
    * `pq_emb_v` (the corpus), `pq_cw_v` (K·M codebook rows, broadcast
    * everywhere it is read), and the cached `pq_codes_v` code table —
    * the shared artifact both catalog queries and the ScaleSmoke gate
    * read.
    */
  private[graft] def ensurePq(spark: SparkSession, key: String,
      emb: => DataFrame): Unit = {
    graft.functions.SubL2.register(spark)
    StageViews.ensure(spark, "pq_emb_v", key)(emb)
    // CACHED: the recall query's 8-way reconstruction join references
    // the codebook once per subspace, and an uncached view re-inlines
    // its corpus scan per reference — the r16 explain audit counted 75
    // parquet scans in q_pq_recall's plan before this. 2048 rows in
    // memory turns each reference into an InMemoryTableScan; at 100 TB
    // this is the broadcast codebook artifact, built once.
    StageViews.ensureCached(spark, "pq_cw_v", key)(spark.sql(s"""
SELECT ms.m, vec_id AS j, slice(embedding, ms.m * $Dsub + 1, $Dsub) AS cw
FROM pq_emb_v
CROSS JOIN (SELECT explode(sequence(0, ${M - 1})) AS m) ms
WHERE vec_id < $kSub"""))
    StageViews.ensureCached(spark, "pq_codes_v", key)(spark.sql(s"""
SELECT vec_id, m, min(named_struct('d', dist, 'j', j)).j AS code
FROM (SELECT /*+ BROADCAST(c) */ e.vec_id, c.m, c.j,
             sub_l2(e.embedding, c.m * $Dsub, c.cw) AS dist
      FROM pq_emb_v e CROSS JOIN pq_cw_v c)
GROUP BY vec_id, m"""))
  }

  /** Search-side shared stages, cached once per (session, key) —
    * [[qPqRecall]] and the composed [[qIvfAdcRecall]] both read them:
    *
    *  - `pq_recon_v`: per-vector code reconstruction (codes →
    *    codewords pivoted by a fixed 8-way equi-join against the
    *    broadcast codebook, concatenated in subspace order);
    *  - `pq_exact_v`: exact-L2 ground-truth ranks for the [[Probes]]
    *    probe queries, PRUNED to rank ≤ [[TopK]] (the consumers'
    *    contract — extend the predicate, don't read around it).
    */
  private[graft] def ensurePqSearchStages(spark: SparkSession, key: String,
      emb: => DataFrame): Unit = {
    ensurePq(spark, key, emb)
    val joins = (1 until M).map { m =>
      s"""JOIN (SELECT k.vec_id, c.cw FROM pq_codes_v k
       JOIN pq_cw_v c ON c.m = k.m AND c.j = k.code WHERE k.m = $m) r$m
  ON r$m.vec_id = r0.vec_id"""
    }.mkString("\n")
    val concat = (0 until M).map(m => s"r$m.cw").mkString("concat(", ", ", ")")
    StageViews.ensureCached(spark, "pq_recon_v", key)(spark.sql(s"""
SELECT r0.vec_id, $concat AS recon
FROM (SELECT k.vec_id, c.cw FROM pq_codes_v k
      JOIN pq_cw_v c ON c.m = k.m AND c.j = k.code WHERE k.m = 0) r0
$joins"""))
    StageViews.ensureCached(spark, "pq_exact_v", key)(spark.sql(s"""
SELECT query_id, neighbor_id, rnk FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY sub_l2(q.embedding, 0, e.embedding) ASC, e.vec_id) AS rnk
  FROM pq_emb_v q JOIN pq_emb_v e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < $Probes)
WHERE rnk <= $TopK"""))
  }

  /** Code table for corpus `emb` under `key` — the spec/gate entry
    * point (the `Dedup.minhashOn` pattern).
    */
  private[graft] def encodeOn(spark: SparkSession, key: String,
      emb: => DataFrame): DataFrame = {
    ensurePq(spark, key, emb)
    spark.sql("""
SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code
FROM pq_codes_v
ORDER BY vec_id, m""")
  }

  private def runEncode(spark: SparkSession, dir: String): DataFrame =
    encodeOn(spark, dir, StageViews.widen(spark, Tables.embeddings(spark, dir), "vec_id"))

  private[graft] def recallOn(spark: SparkSession, key: String,
      emb: => DataFrame): DataFrame = {
    ensurePqSearchStages(spark, key, emb)
    spark.sql(s"""
SELECT p.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT vec_id AS query_id FROM pq_emb_v WHERE vec_id < $Probes) p
LEFT JOIN (
  SELECT a.query_id, count(*) AS n_common
  FROM (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dist ASC, neighbor_id) AS rnk
        FROM (SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
                     sub_l2(q.embedding, 0, r.recon) AS dist
              FROM pq_emb_v q JOIN pq_recon_v r ON r.vec_id <> q.vec_id
              WHERE q.vec_id < $Probes)) a
  JOIN pq_exact_v b
    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
  WHERE a.rnk <= $TopK
  GROUP BY a.query_id) ov
  ON p.query_id = ov.query_id
ORDER BY p.query_id""")
  }

  private def runRecall(spark: SparkSession, dir: String): DataFrame =
    recallOn(spark, dir, StageViews.widen(spark, Tables.embeddings(spark, dir), "vec_id"))

  /** IVFADC — the composed billion-scale ANN architecture (Jégou et
    * al. §5; the FAISS `IndexIVFPQ` layout): the two-level IVF coarse
    * quantizer routes each probe to ~n^(3/4) candidates
    * ([[Similarity.ensureIvfStages]]), and PQ's asymmetric distance
    * reranks ONLY those candidates through their reconstructions — the
    * corpus-sized scan of `q_pq_recall` becomes candidate-sized, and
    * the candidates' memory residency is the 32×-smaller code table.
    * Recall accounting vs the same exact-L2 ground truth
    * (`pq_exact_v`), so the three gates read together: brute ADC
    * (`q_pq_recall`) prices quantization loss alone, `q_ann_ivf_recall`
    * prices routing loss alone, this prices the composition a real
    * deployment runs.
    */
  private def runIvfAdcRecall(spark: SparkSession, dir: String): DataFrame = {
    Similarity.ensureIvfStages(spark, dir)
    ensurePqSearchStages(spark, dir,
      StageViews.widen(spark, Tables.embeddings(spark, dir), "vec_id"))
    spark.sql(s"""
SELECT p.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT vec_id AS query_id FROM pq_emb_v WHERE vec_id < $Probes) p
LEFT JOIN (
  SELECT a.query_id, count(*) AS n_common
  FROM (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dist ASC, neighbor_id) AS rnk
        FROM (SELECT c.query_id, c.neighbor_id,
                     sub_l2(q.embedding, 0, r.recon) AS dist
              FROM (SELECT p2.vec_id AS query_id, m.vec_id AS neighbor_id
                    FROM (SELECT vec_id, c1, c2 FROM ann_asg2_pruned_v
                          WHERE vec_id < $Probes AND rnk <= ${Similarity.np2Sub}) p2
                    JOIN (SELECT vec_id, c1, c2 FROM ann_asg2_pruned_v
                          WHERE a1rnk = 1 AND rnk = 1) m
                      ON p2.c1 = m.c1 AND p2.c2 = m.c2 AND m.vec_id <> p2.vec_id) c
              JOIN pq_emb_v q ON c.query_id = q.vec_id
              JOIN pq_recon_v r ON c.neighbor_id = r.vec_id)) a
  JOIN pq_exact_v b
    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
  WHERE a.rnk <= $TopK
  GROUP BY a.query_id) ov
  ON p.query_id = ov.query_id
ORDER BY p.query_id""")
  }

  // ---- DuckDB oracle: the self-contained CTE restatement ----

  /** `(SELECT sum(...) FROM range(lo, hi) t(i))` sequential-fold L2²
    * over `width` elements, `a` offset by `aOff` elements, `b` by
    * `bOff` (DuckDB lists are 1-based).
    */
  private def duckL2(a: String, aOff: String, b: String, bOff: String,
      width: Int): String = {
    val x = s"CAST(list_extract($a, $aOff + i) AS DOUBLE)"
    val y = s"CAST(list_extract($b, $bOff + i) AS DOUBLE)"
    s"(SELECT sum(($x - $y) * ($x - $y)) FROM range(1, ${width + 1}) t(i))"
  }

  /** The subdistance relation is marked MATERIALIZED: it is read twice
    * (the min and the argmin-by-equality join), DuckDB inlines an
    * unmarked CTE per reference, and the two inlinings can optimize the
    * correlated fold into different accumulation orders — measured: 14
    * of 4000 codes dropped at sf0.01 because best.mind carried bits
    * from one evaluation and the join probed bits from the other.
    * One materialized evaluation restores dist = dist as an identity
    * (Spark needs no analogue: its fold is per-row codegen,
    * bit-deterministic across re-evaluations by construction).
    */
  private def duckCodesCte: String = s"""
cw AS (SELECT ms.m, vec_id AS j, list_slice(embedding, ms.m * $Dsub + 1, ms.m * $Dsub + $Dsub) AS cw
       FROM embeddings CROSS JOIN range(0, $M) ms(m)
       WHERE vec_id < (SELECT LEAST(256, count(*)) FROM embeddings)),
asub AS MATERIALIZED (SELECT e.vec_id, c.m, c.j,
                ${duckL2("e.embedding", s"c.m * $Dsub", "c.cw", "0", Dsub)} AS dist
         FROM embeddings e CROSS JOIN cw c),
best AS (SELECT vec_id, m, min(dist) AS mind FROM asub GROUP BY vec_id, m),
codes AS (SELECT asub.vec_id, asub.m, min(asub.j) AS code
          FROM asub JOIN best ON asub.vec_id = best.vec_id
            AND asub.m = best.m AND asub.dist = best.mind
          GROUP BY asub.vec_id, asub.m)"""

  private val encodeOracle = s"""
WITH $duckCodesCte
SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code
FROM codes ORDER BY vec_id, m"""

  private val recallOracle = {
    val joins = (1 until M).map(m =>
      s"JOIN (SELECT vec_id, cw FROM cj WHERE m = $m) r$m ON r$m.vec_id = r0.vec_id")
      .mkString("\n      ")
    val concat = (0 until M).map(m => s"r$m.cw").mkString(" || ")
    s"""
WITH $duckCodesCte,
cj AS (SELECT k.vec_id, k.m, c.cw FROM codes k
       JOIN cw c ON c.m = k.m AND c.j = k.code),
rec AS (SELECT r0.vec_id, $concat AS recon
        FROM (SELECT vec_id, cw FROM cj WHERE m = 0) r0
      $joins),
probes AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < $Probes),
adcr AS (SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dist ASC, neighbor_id) AS rnk
         FROM (SELECT p.query_id, r.vec_id AS neighbor_id,
                      ${duckL2("p.qe", "0", "r.recon", "0", Dim)} AS dist
               FROM probes p JOIN rec r ON r.vec_id <> p.query_id)),
exr AS (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dist ASC, neighbor_id) AS rnk
        FROM (SELECT p.query_id, e.vec_id AS neighbor_id,
                     ${duckL2("p.qe", "0", "e.embedding", "0", Dim)} AS dist
              FROM probes p JOIN embeddings e ON e.vec_id <> p.query_id)),
ov AS (SELECT a.query_id, count(*) AS n_common
       FROM adcr a JOIN exr b
         ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
       WHERE a.rnk <= $TopK AND b.rnk <= $TopK
       GROUP BY a.query_id)
SELECT p.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM probes p LEFT JOIN ov ON p.query_id = ov.query_id
ORDER BY p.query_id"""
  }

  /** IVFADC oracle: the self-contained composition of the IVF candidate
    * CTE chain ([[Similarity.ivfCte]] — identical coarse routing) and
    * the PQ code/reconstruction chain, reranked by the same ordered
    * fold and counted against the same exact-L2 top-[[TopK]].
    */
  private val ivfAdcOracle = {
    val joins = (1 until M).map(m =>
      s"JOIN (SELECT vec_id, cw FROM cj WHERE m = $m) r$m ON r$m.vec_id = r0.vec_id")
      .mkString("\n      ")
    val concat = (0 until M).map(m => s"r$m.cw").mkString(" || ")
    s"""${Similarity.ivfCte(graft.operators.DuckSql)},
$duckCodesCte,
cj AS (SELECT k.vec_id, k.m, c.cw FROM codes k
       JOIN cw c ON c.m = k.m AND c.j = k.code),
rec AS (SELECT r0.vec_id, $concat AS recon
        FROM (SELECT vec_id, cw FROM cj WHERE m = 0) r0
      $joins),
pprobes AS (SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id < $Probes),
adcr AS (SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dist ASC, neighbor_id) AS rnk
         FROM (SELECT cd.query_id, cd.neighbor_id,
                      ${duckL2("p.qe", "0", "r.recon", "0", Dim)} AS dist
               FROM cand cd
               JOIN pprobes p ON cd.query_id = p.query_id
               JOIN rec r ON cd.neighbor_id = r.vec_id)),
exr AS (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dist ASC, neighbor_id) AS rnk
        FROM (SELECT p.query_id, e.vec_id AS neighbor_id,
                     ${duckL2("p.qe", "0", "e.embedding", "0", Dim)} AS dist
              FROM pprobes p JOIN embeddings e ON e.vec_id <> p.query_id)),
ov AS (SELECT a.query_id, count(*) AS n_common
       FROM adcr a JOIN exr b
         ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
       WHERE a.rnk <= $TopK AND b.rnk <= $TopK
       GROUP BY a.query_id)
SELECT p.query_id, CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common
FROM pprobes p LEFT JOIN ov ON p.query_id = ov.query_id
ORDER BY p.query_id"""
  }

  val qPqEncode = Q("q_pq_encode", runEncode _, Some(encodeOracle))
  val qPqRecall = Q("q_pq_recall", runRecall _, Some(recallOracle))
  val qIvfAdcRecall = Q("q_ivfadc_recall", runIvfAdcRecall _, Some(ivfAdcOracle))

  val all: Seq[Q] = Seq(qPqEncode, qPqRecall, qIvfAdcRecall)
}
