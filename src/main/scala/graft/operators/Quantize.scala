package graft.operators

import graft.Q

/** Int8 scalar quantization of the embedding column — the storage step
  * a 100 TB vector store runs before indexing: per-vector min/max
  * affine mapping onto 0..255 codes (4× smaller than float32, and the
  * input IVF/LSH variants consume directly).
  *
  * The catalog query emits per-vector code statistics plus the
  * reconstruction error in parts-per-million of the quantization step.
  * Every emitted number is either an exact integer or the result of an
  * IDENTICAL sequence of IEEE double ops in both engines (min/max/abs
  * are order-free; no reordered summation), so the driver hash-compares
  * the actual quantization arithmetic. Scale shape: one narrow
  * projection, no shuffle, no join — embarrassingly parallel.
  *
  * [[SketchLayoutSpec]] pins the scheme's laws: codes span exactly
  * 0..255 (both extremes hit), and the dequantization error never
  * exceeds half a step.
  */
object Quantize {

  /** 64-dim embeddings (driver corpus contract, same as Similarity). */
  private val Dim = 64

  private val sparkSql = s"""
WITH m AS (SELECT vec_id, embedding,
                  CAST(array_min(embedding) AS DOUBLE) AS mn,
                  CAST(array_max(embedding) AS DOUBLE) AS mx
           FROM embeddings),
s AS (SELECT vec_id, embedding, mn,
             CASE WHEN mx = mn THEN 1.0e0 ELSE (mx - mn) / 255 END AS scale
      FROM m),
c AS (SELECT vec_id, mn, scale,
             transform(embedding, v -> CAST(round((CAST(v AS DOUBLE) - mn) / scale, 0) AS BIGINT)) AS codes,
             transform(embedding, v -> CAST(v AS DOUBLE)) AS vals
      FROM s)
SELECT vec_id,
       aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x) AS code_sum,
       CAST(size(filter(codes, x -> x = 0)) AS BIGINT) AS n_lo,
       CAST(size(filter(codes, x -> x = 255)) AS BIGINT) AS n_hi,
       CAST(round(aggregate(zip_with(vals, codes, (v, k) -> abs(v - (mn + k * scale))),
                            CAST(0 AS DOUBLE), (a, x) -> greatest(a, x)) * 1e6 / scale, 0) AS BIGINT) AS err_ppm
FROM c
ORDER BY vec_id"""

  private val duckSql = {
    def el = s"CAST(list_extract(embedding, i) AS DOUBLE)"
    def code = s"CAST(round(($el - mn) / scale, 0) AS BIGINT)"
    s"""
WITH m AS (SELECT vec_id, embedding,
                  (SELECT min($el) FROM range(1, ${Dim + 1}) t(i)) AS mn,
                  (SELECT max($el) FROM range(1, ${Dim + 1}) t(i)) AS mx
           FROM embeddings),
s AS (SELECT vec_id, embedding, mn,
             CASE WHEN mx = mn THEN 1.0e0 ELSE (mx - mn) / 255 END AS scale
      FROM m)
SELECT vec_id,
       CAST((SELECT sum($code) FROM range(1, ${Dim + 1}) t(i)) AS BIGINT) AS code_sum,
       CAST((SELECT count(*) FROM range(1, ${Dim + 1}) t(i) WHERE $code = 0) AS BIGINT) AS n_lo,
       CAST((SELECT count(*) FROM range(1, ${Dim + 1}) t(i) WHERE $code = 255) AS BIGINT) AS n_hi,
       CAST(round((SELECT max(abs($el - (mn + $code * scale)))
                   FROM range(1, ${Dim + 1}) t(i)) * 1e6 / scale, 0) AS BIGINT) AS err_ppm
FROM s
ORDER BY vec_id"""
  }

  val qEmbeddingQuantize = Q(
    "q_embedding_quantize",
    (spark, dir) => {
      StageViews.embeddings(spark, dir)
      spark.sql(sparkSql)
    },
    Some(duckSql))

  val all: Seq[Q] = Seq(qEmbeddingQuantize)
}
