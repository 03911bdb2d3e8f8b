package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization laws ([[Pq]]), each on a hand-built corpus:
  *
  *  - grid coverage: exactly n × M codes, every code in [0, K);
  *  - exact-reconstruction recall: when every vector is a codebook
  *    seed (n ≤ 256), its reconstruction is bit-identical to itself,
  *    ADC distance equals exact distance pairwise, and recall@5 is
  *    perfect for every probe — the law that pins ADC's arithmetic to
  *    the exact side's;
  *  - argmin tie-break: duplicated codewords must code to the LOWEST
  *    j (the determinism the oracle hash relies on);
  *  - coarseness: a non-seed vector built from other seeds' subvectors
  *    codes to exactly those donors (assignment is truly per-subspace,
  *    not whole-vector nearest).
  */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** 64-dim float corpus with dense ids from 0. */
  private def corpus(vecs: Seq[Array[Float]]): DataFrame = {
    require(vecs.forall(_.length == Pq.Dim))
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
  }

  /** Deterministic distinct vectors: v(i)_d = sin(i · 64 + d) scaled —
    * fixed arithmetic, no RNG state.
    */
  private def mk(i: Int): Array[Float] =
    Array.tabulate(Pq.Dim)(d => (math.sin(i * Pq.Dim + d) * 10.0).toFloat)

  private def codesOf(key: String, vecs: Seq[Array[Float]]): Map[(Long, Long), Long] =
    Pq.encodeOn(spark, key, corpus(vecs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("grid coverage: n x M codes, all in [0, K)") {
    val n = 30
    val codes = codesOf("pq-grid", (0 until n).map(mk))
    assert(codes.size == n * Pq.M)
    assert(codes.keys.map(_._1).toSet == (0L until n).toSet)
    assert(codes.keys.map(_._2).toSet == (0L until Pq.M).toSet)
    assert(codes.values.forall(c => c >= 0 && c < n), // K = min(256, n) = n
      s"codes must index the codebook: ${codes.values.toSeq.sorted.distinct}")
  }

  test("seed corpus: every vector reconstructs exactly, recall@5 is perfect") {
    val n = 30 // > Probes + TopK, and <= 256 so every vector seeds the codebook
    val vecs = (0 until n).map(mk)
    val recall = Pq.recallOn(spark, "pq-seed", corpus(vecs)).collect()
    assert(recall.length == Pq.Probes)
    assert(recall.forall(_.getLong(1) == Pq.TopK),
      s"ADC over exact reconstructions must reproduce the exact top-${Pq.TopK}: " +
        recall.map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString(", "))
  }

  test("argmin tie-break: a duplicated codeword codes to the lowest j") {
    // vectors 0 and 1 are identical -> for every subspace, codewords 0
    // and 1 tie at distance 0; both vectors (and any later duplicate)
    // must take code 0 in every subspace
    val vecs = Seq(mk(7), mk(7)) ++ (2 until 25).map(mk) :+ mk(7)
    val codes = codesOf("pq-tie", vecs)
    (0 until Pq.M).foreach { m =>
      assert(codes((0L, m.toLong)) == 0L)
      assert(codes((1L, m.toLong)) == 0L, s"duplicate seed must tie-break to j=0 (m=$m)")
      assert(codes((25L, m.toLong)) == 0L, "a later duplicate codes to j=0 too")
    }
  }

  test("IVFADC on a seed corpus: per-probe recall == |exact top-5 ∩ IVF candidates|") {
    // seed corpus (n=30 ≤ 256): reconstruction is exact, so ADC == exact
    // L2 and the composed pipeline's only loss is ROUTING — each probe's
    // n_common must equal the count of its true top-5 that the IVF
    // coarse quantizer even surfaced. Computed from the session's own
    // registered stages (candidate join + pq_exact_v), not a
    // re-implementation.
    val dir = java.nio.file.Files.createTempDirectory("pq_ivfadc").toString
    corpus((0 until 30).map(mk))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q_ivfadc_recall")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == Pq.Probes)
    val cands = spark.sql(s"""
SELECT p2.vec_id AS query_id, m.vec_id AS neighbor_id
FROM (SELECT vec_id, c1, c2 FROM ann_asg2_pruned_v
      WHERE vec_id < ${Pq.Probes} AND rnk <= ${Similarity.np2Sub}) p2
JOIN (SELECT vec_id, c1, c2 FROM ann_asg2_pruned_v
      WHERE a1rnk = 1 AND rnk = 1) m
  ON p2.c1 = m.c1 AND p2.c2 = m.c2 AND m.vec_id <> p2.vec_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact5 = spark.table("pq_exact_v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until Pq.Probes).map(q =>
      q -> exact5.count { case (qq, n) => qq == q && cands((q, n)) }.toLong).toMap
    assert(out == expected,
      "with exact reconstructions the composed recall must be exactly the routing overlap")
    assert(out.values.sum > 0, "IVF routing should surface at least some true neighbors")
  }

  test("per-subspace assignment: a chimera codes to its donors") {
    // vector 20 borrows subspace 0 from seed 3 and subspaces 1..7 from
    // seed 11 -> its codes must be (3, 11, 11, ..., 11), which a
    // whole-vector-nearest assignment could not produce
    val base = (0 until 20).map(mk)
    val chimera = (base(3).slice(0, Pq.Dsub) ++
      base(11).slice(Pq.Dsub, Pq.Dim)).toArray
    val codes = codesOf("pq-chimera", base :+ chimera)
    assert(codes((20L, 0L)) == 3L)
    (1 until Pq.M).foreach(m => assert(codes((20L, m.toLong)) == 11L))
  }
}
