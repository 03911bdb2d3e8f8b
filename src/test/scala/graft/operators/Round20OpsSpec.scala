package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 operator laws: duplicated-span EXCISION
  * (q_dedup_span_excise) — hand-derived fixture covering overlap
  * merge, adjacency merge, intra-doc repeats, multi-region docs, full
  * excision and clean docs; the conservation law against the span
  * audit (excised mass == q_dedup_spans' n_dup_tokens per doc); and
  * staged-vs-self-contained equality on the oracle corpus.
  */
class Round20OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val OracleSf = "/root/testdata/sf0.001"

  // ---- duplicated-span excision ----

  test("span excise: hand-derived regions, merge semantics, kept text") {
    import spark.implicits._
    // doc0 "a b c d e f": dup starts {1 ("a b c d e" ×3 with doc1,
    //   doc4), 2 ("b c d e f" ×2 with doc4)} → overlap-merge to one
    //   region [1,6] → fully excised.
    // doc1 "a b c d e x": dup start {1} only ("b c d e x" is unique)
    //   → region [1,5], kept "x".
    // doc2 "z z z z z z z": intra-doc repeats — all three 5-gram
    //   occurrences share one text → starts {1,2,3} merge to [1,7],
    //   fully excised.
    // doc3 "p q r": shorter than a gram → clean, full text kept.
    // doc4 "a b c d e u1 u2 b c d e f": dup starts {1, 8}; 8 > 5+1
    //   opens a gap → TWO regions [1,5], [8,12]; kept "u1 u2".
    // doc5 "q w e r t y u i o p": dup starts {1 (with doc6), 6 (with
    //   doc7)}; 6 == 5+1 is ADJACENT → one region [1,10], fully
    //   excised (the adjacency-merge law).
    // doc6 "q w e r t" / doc7 "y u i o p": single all-covering gram
    //   each → fully excised.
    val docs = Seq(
      (0L, "a b c d e f", "en"),
      (1L, "a b c d e x", "en"),
      (2L, "z z z z z z z", "en"),
      (3L, "p q r", "en"),
      (4L, "a b c d e u1 u2 b c d e f", "en"),
      (5L, "q w e r t y u i o p", "en"),
      (6L, "q w e r t", "en"),
      (7L, "y u i o p", "en"))
    docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    try {
      val got = spark.sql(Dedup.spanExciseSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5))).toSeq
      assert(got == Seq(
        (0L, 6L, 1L, 6L, 0L, ""),
        (1L, 6L, 1L, 5L, 1L, "x"),
        (2L, 7L, 1L, 7L, 0L, ""),
        (3L, 3L, 0L, 0L, 3L, "p q r"),
        (4L, 12L, 2L, 10L, 2L, "u1 u2"),
        (5L, 10L, 1L, 10L, 0L, ""),
        (6L, 5L, 1L, 5L, 0L, ""),
        (7L, 5L, 1L, 5L, 0L, "")), s"hand span excision mismatch: $got")
    } finally {
      spark.catalog.dropTempView("documents")
      StageViews.unpersistAll(spark)
    }
  }

  test("span excise: staged catalog query equals the self-contained spelling") {
    StageViews.documents(spark, OracleSf)
    val selfContained =
      spark.sql(Dedup.spanExciseSparkSqlForTest).collect().map(_.toSeq).toSeq
    val staged = Dedup.qSpanExcise.run(spark, OracleSf).collect().map(_.toSeq).toSeq
    assert(staged.nonEmpty && staged == selfContained)
    StageViews.unpersistAll(spark)
  }

  test("span excise: conservation laws against the span audit") {
    StageViews.documents(spark, OracleSf)
    val audit = Dedup.qSpans.run(spark, OracleSf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toMap
    val excised = Dedup.qSpanExcise.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(excised.size == audit.size, "both queries emit the full doc spine")
    // non-vacuity: the synthetic corpus must exercise excision AND keeps
    assert(excised.exists(_._4 > 0L), "corpus has dup spans by construction")
    assert(excised.exists(r => r._4 > 0L && r._5 > 0L),
      "some doc must be PARTIALLY excised for the laws to bite")
    excised.foreach { case (id, nTok, nSpans, nDup, nKept, keptText) =>
      val (aTok, aDup, aClean) = audit(id)
      assert(nTok == aTok, s"doc $id token count disagrees with audit")
      // the merged-region mass IS the audit's distinct covered positions
      assert(nDup == aDup, s"doc $id excised mass != audit n_dup_tokens")
      assert(nKept == nTok - nDup, s"doc $id kept+excised != total")
      assert((nSpans == 0L) == aClean, s"doc $id clean flag vs region count")
      // the reassembled text has exactly the kept tokens
      val reTok = if (keptText.isEmpty) 0L else keptText.split(" ").length.toLong
      assert(reTok == nKept, s"doc $id kept_text token count != kept_tokens")
    }
    StageViews.unpersistAll(spark)
  }

  // ---- quality-aware canonicalization (keep best, not min-id) ----

  test("keep-best: longest wins, stopword tie-break, identical-pair id tie, singletons") {
    import spark.implicits._
    val base = (1 to 60).map("w" + _).mkString(" ")
    val docs = Seq(
      (10L, base, "en"),                                         // 60 words
      (11L, base + " " + (1 to 5).map("e" + _).mkString(" "), "en"), // 65 words, superset near-dup
      (13L, (1 to 30).map("v" + _).mkString(" "), "en"),         // identical pair
      (14L, (1 to 30).map("v" + _).mkString(" "), "en"),
      // one-word difference (jaccard 55/57 ≈ 0.965 — a 0.89 variant
      // lost the deterministic banding draw): equal length, doc16
      // carries the one stopword
      (15L, (1 to 58).map("u" + _).mkString(" ") + " qq zz", "en"),
      (16L, (1 to 58).map("u" + _).mkString(" ") + " qq the", "en"),
      (17L, (1 to 10).map("x" + _).mkString(" "), "en"))         // singleton
    val got = Dedup.keepBestOn(spark, "r20-keepbest",
        docs.toDF("doc_id", "text", "lang")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5))).toMap
    try {
      // {10, 11}: the LONGER doc wins — the keep verdict DIFFERS from
      // the min-id canonical (cluster_rep is still 10)
      assert(got(10L) == ((10L, 60L, 0L, false, 11L)), s"doc10: ${got(10L)}")
      assert(got(11L) == ((10L, 65L, 0L, true, 11L)), s"doc11: ${got(11L)}")
      // {13, 14}: identical metrics → lowest doc_id keeps
      assert(got(13L) == ((13L, 30L, 0L, true, 13L)))
      assert(got(14L) == ((13L, 30L, 0L, false, 13L)))
      // {15, 16}: equal length → stopword mass breaks the tie AGAINST min-id
      assert(got(15L) == ((15L, 60L, 0L, false, 16L)), s"doc15: ${got(15L)}")
      assert(got(16L) == ((15L, 60L, 1L, true, 16L)), s"doc16: ${got(16L)}")
      // singleton keeps itself
      assert(got(17L) == ((17L, 10L, 0L, true, 17L)))
    } finally StageViews.unpersistAll(spark)
  }

  test("keep-best laws vs q_dedup_clusters on the oracle corpus") {
    StageViews.documents(spark, OracleSf)
    val clusters = Dedup.qClusters.run(spark, OracleSf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kb = Dedup.qKeepBest.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5))).toSeq
    assert(kb.size == clusters.size, "full doc spine")
    // identical cluster assignment (both ride cc_comp_v)
    kb.foreach { case (id, rep, _, _, _, _) => assert(clusters(id) == rep) }
    // exactly ONE keep per cluster, and it is the best_doc every
    // member agrees on
    kb.groupBy(_._2).foreach { case (rep, members) =>
      val keeps = members.filter(_._5)
      assert(keeps.size == 1, s"cluster $rep keeps ${keeps.size}")
      assert(members.map(_._6).distinct == Seq(keeps.head._1),
        s"cluster $rep best_doc disagrees")
      // the keep is maximal under (n_words DESC, n_stop DESC, id ASC)
      val best = members.minBy(m => (-m._3, -m._4, m._1))
      assert(keeps.head._1 == best._1, s"cluster $rep kept ${keeps.head._1}, best is ${best._1}")
    }
    StageViews.unpersistAll(spark)
  }

  // ---- frozen-quantizer routing: literal vs broadcast path parity ----

  test("assignToFrozenBroadcast equals the literal greatest() path, ties included") {
    import spark.implicits._
    // deterministic synthetic quantizer + vectors; centroid 7 is a
    // bit-identical COPY of centroid 2 (a scaled copy would perturb
    // float rounding and break the tie), so every vector nearest that
    // direction is an exact cosine tie the lowest-c1 rule must break
    // identically on both paths
    val dims = 8
    def unit(seed: Int): Array[Float] =
      Array.tabulate(dims)(d => (((seed * 131 + d * 17) % 97) - 48).toFloat / 48f)
    val cents: Seq[(Long, Array[Float])] =
      (0L until 7L).map(c => c -> unit(c.toInt)) :+ (7L -> unit(2))
    val vecs = (0 until 400).map { i =>
      (i.toLong, Array.tabulate(dims)(d => (((i * 37 + d * 13) % 89) - 44).toFloat / 44f).toSeq)
    }.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
    val viaLiteral = vecs.withColumn("c1", Similarity.assignToFrozen(cents))
      .select("vec_id", "c1").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBroadcast = Similarity.assignToFrozenBroadcast(spark, cents, vecs)
      .select("vec_id", "c1").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBroadcast == viaLiteral, "routing paths disagree")
    // the tie trap must actually bite: some vector routes to c1=2 and
    // NONE to the duplicate direction c1=7 (lowest-c1 tie-break)
    assert(viaLiteral.values.exists(_ == 2L), "tie fixture vacuous — no vector near the shared direction")
    assert(!viaLiteral.values.exists(_ == 7L), "tie-break failed: duplicate-direction centroid won")
  }
}
