package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-21 optimization laws. r21 moved three per-query candidate
  * self-joins into shared cached stages (the r20 sim64_pairs_v /
  * emb_pairs_v pattern): `sim_pairs_v` (32-bit simhash verified pairs)
  * and `ngp_v` (DF-capped shingle intersection counts, doc_a < doc_b,
  * shared by the n-gram Jaccard and containment finals). These laws pin
  * that the staged finals compute EXACTLY what the self-contained
  * one-shot SQL computes, and that containment's direction-swap
  * restatement (the a<b half re-emitted swapped, ic being symmetric)
  * preserves the old `<>` join's ordered-pair semantics on a fixture
  * where the two directions genuinely differ.
  */
class Round21OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val OracleSf = "/root/testdata/sf0.001"

  test("containment: asymmetric directions on a hand fixture") {
    import spark.implicits._
    // docA (1 shingle) is fully contained in docB (6 shingles):
    // C(A->B) = 1/1 = 10000 bp passes, C(B->A) = 1/6 = 1666 bp fails —
    // exactly ONE ordered row must survive, proving the swap spelling
    // emits per-direction rows with the RIGHT source denominator.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5", "en"),
      (2L, "w1 w2 w3 w4 w5 x1 x2 x3 x4 x5", "en")).toDF("doc_id", "text", "lang")
    val got = Dedup.containmentOn(spark, "r21_contain_fix", docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 2L, 1L, 1L, 10000L)), s"got $got")
    StageViews.unpersistAll(spark)
  }

  test("ngram jaccard: staged pair stage keeps the exact boundary score") {
    import spark.implicits._
    // 3 shingles each, 2 shared: J = 2 / (3 + 3 - 2) = 0.5 — ON the
    // >= 0.5 boundary, so any drift in the staged ic or denominators
    // flips the row out of the result.
    val docs = Seq(
      (1L, "a b c d e f g", "en"),
      (2L, "a b c d e f x", "en")).toDF("doc_id", "text", "lang")
    val got = Dedup.ngramJaccardOn(spark, "r21_ngram_fix", docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.5)), s"got $got")
    StageViews.unpersistAll(spark)
  }

  test("staged finals equal the self-contained spellings on the oracle corpus") {
    StageViews.unpersistAll(spark)
    // catalog queries first: they build the shared stages (documents,
    // sh_v, sz_v, ngp_v, tok_v, sim_v, sim_pairs_v)
    val ngramStaged = Dedup.qNgram.run(spark, OracleSf).collect().map(_.toSeq).toSeq
    val containStaged = Dedup.qContainment.run(spark, OracleSf).collect().map(_.toSeq).toSeq
    val simStaged = Dedup.qSimhash.run(spark, OracleSf).collect().map(_.toSeq).toSeq
    // self-contained CTE spellings over the same registered views
    val ngramSelf = spark.sql(Dedup.ngramSparkSqlForTest).collect().map(_.toSeq).toSeq
    val containSelf = spark.sql(Dedup.containSparkSqlForTest).collect().map(_.toSeq).toSeq
    val simSelf = spark.sql(Dedup.simhashSparkSqlForTest).collect().map(_.toSeq).toSeq
    assert(ngramStaged.nonEmpty, "ngram result is vacuous at sf0.001")
    assert(containStaged.nonEmpty, "containment result is vacuous at sf0.001")
    assert(simStaged.nonEmpty, "simhash result is vacuous at sf0.001")
    assert(ngramStaged == ngramSelf)
    assert(containStaged == containSelf)
    assert(simStaged == simSelf)
    StageViews.unpersistAll(spark)
  }
}
