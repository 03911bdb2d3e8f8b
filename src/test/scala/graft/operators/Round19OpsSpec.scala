package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 operator laws: hybrid retrieval over the SERVING dense
  * ranker (q_hybrid_retrieval_ivf — staged spelling equals the
  * self-contained one, fused output equals a Scala re-derivation from
  * the two rankers' own outputs, dominance law at depths (5, 5)) and
  * the frozen-centroid argmax projection behind q_ann_ivf_stream.
  */
class Round19OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val OracleSf = "/root/testdata/sf0.01"

  test("hybrid ivf: catalog query is non-vacuous, totally ordered, law-abiding") {
    val rows = Retrieval.qHybridIvf.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r._1, r._2))
    assert(keys == keys.sorted && keys.distinct.length == keys.length,
      "total ORDER BY (query_id, rank)")
    assert(rows.groupBy(_._1).values.forall(_.size <= Retrieval.TopK))
    // dominance at depths (5, 5): worst both-lists 2·(10000 DIV 65) =
    // 306 bp > best single-list 10000 DIV 61 = 163 bp
    rows.groupBy(_._1).values.foreach { qs =>
      val both = qs.filter(_._5 == 2L).map(_._4)
      val single = qs.filter(_._5 == 1L).map(_._4)
      if (both.nonEmpty && single.nonEmpty)
        assert(both.min > single.max, s"dominance law violated: $qs")
    }
  }

  test("hybrid ivf: staged spelling equals the self-contained CTE spelling") {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.documents(spark, OracleSf)
    StageViews.embeddings(spark, OracleSf)
    val selfContained = spark.sql(Retrieval.hybridIvfSparkSqlForTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val staged = Retrieval.qHybridIvf.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(staged == selfContained,
      "cached-stage fusion must equal the self-contained chain")
    StageViews.unpersistAll(spark)
  }

  test("hybrid ivf: fused query equals the Scala re-derivation from both rankers") {
    // the two ranked lists as the CATALOG rankers themselves emit them
    val bm = Retrieval.qBm25.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSeq // (q, doc, rank)
    val an = Similarity.qIvf.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSeq
    assert(bm.nonEmpty && an.nonEmpty)
    val expected = (bm.filter(_._3 <= Retrieval.TopK) ++
        an.filter(_._3 <= Retrieval.IvfAnnTopK))
      .groupBy(t => (t._1, t._2))
      .map { case ((q, d), ts) =>
        (q, d, ts.map(t => 10000L / (60L + t._3)).sum, ts.size.toLong)
      }.toSeq
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(Retrieval.TopK).zipWithIndex
          .map { case ((q, d, s, n), i) => (q, (i + 1).toLong, d, s, n) }
      }.sortBy(r => (r._1, r._2))
    val got = Retrieval.qHybridIvf.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, "fused SQL must equal the independent re-derivation")
    assert(got.exists(_._5 == 2L),
      "corpus must exercise the both-lists path")
    StageViews.unpersistAll(spark)
  }

  // ---- retrieval recall@k ----

  test("retrieval recall: staged equals self-contained; spine complete; range law") {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.documents(spark, OracleSf)
    StageViews.embeddings(spark, OracleSf)
    val selfContained = spark.sql(Retrieval.recallSparkSqlForTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val staged = Retrieval.qRecall.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(staged.nonEmpty && staged == selfContained)
    // spine: every dense probe query appears exactly once, recall in range
    assert(staged.map(_._1) == staged.map(_._1).sorted)
    assert(staged.map(_._1).distinct.size == staged.size)
    staged.foreach { case (_, n, bp) =>
      assert(n >= 0 && n <= Retrieval.TopK && bp == 10000 * n / Retrieval.TopK)
    }
    StageViews.unpersistAll(spark)
  }

  // ---- cross-document duplicated-span coverage ----

  test("dedup spans: hand-derived coverage incl. intra-doc repeats and short docs") {
    import spark.implicits._
    // doc0/doc1 share the 5-gram "a b c d e" → positions 1..5 covered
    // in both (5 of 6 tokens → 8333 bp); doc2 is "z"×7 → its three
    // 5-gram occurrences share one text (intra-doc repeats count, as
    // in Lee et al.) → all 7 positions covered (10000 bp); doc3 is
    // shorter than a gram → clean.
    val docs = Seq(
      (0L, "a b c d e f", "en"),
      (1L, "a b c d e x", "en"),
      (2L, "z z z z z z z", "en"),
      (3L, "p q r", "en"))
    docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    try {
      val got = spark.sql(Dedup.spanSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSeq
      assert(got == Seq(
        (0L, 6L, 5L, 8333L, false),
        (1L, 6L, 5L, 8333L, false),
        (2L, 7L, 7L, 10000L, false),
        (3L, 3L, 0L, 0L, true)), s"hand span coverage mismatch: $got")
    } finally {
      spark.catalog.dropTempView("documents")
      StageViews.unpersistAll(spark)
    }
  }

  test("dedup spans: staged catalog query equals the self-contained spelling") {
    StageViews.documents(spark, OracleSf)
    val selfContained = spark.sql(Dedup.spanSparkSqlForTest).collect().map(_.toSeq).toSeq
    val staged = Dedup.qSpans.run(spark, OracleSf).collect().map(_.toSeq).toSeq
    assert(staged.nonEmpty && staged == selfContained)
    // non-vacuity: the synthetic corpus contains near-dup documents by
    // construction, so SOME span coverage must exist at the oracle SF
    assert(staged.exists(r => r(2).asInstanceOf[Long] > 0L),
      "corpus has near-dups; span coverage must be non-vacuous")
    StageViews.unpersistAll(spark)
  }

  // ---- frozen-centroid argmax projection (q_ann_ivf_stream) ----

  test("assignToFrozen: argmax by cosine with lowest-c1 tie-break") {
    import spark.implicits._
    // axis-aligned centroids: c0 along dim0, c5 along dim1, c9 = c0's
    // direction again (duplicate centroid → exact cosine tie with c0)
    val cents = Seq(
      0L -> Array(1.0f, 0.0f),
      5L -> Array(0.0f, 1.0f),
      9L -> Array(2.0f, 0.0f))
    val vecs = Seq(
      (100L, Seq(3.0f, 0.1f)), // nearest c0/c9 (tie on cosine? no: 3,0.1 not collinear — but c0 and c9 ARE collinear, exact tie → pick c0)
      (101L, Seq(0.1f, 3.0f))) // nearest c5
    val df = vecs.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
    val got = df.withColumn("c1", Similarity.assignToFrozen(cents))
      .select("vec_id", "c1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((100L, 0L), (101L, 5L)),
      s"argmax must pick max cosine, lowest c1 on exact ties: $got")
  }

  // ---- t-closeness (privacy triad completion) ----

  test("t-closeness: hand-derived integer EMD over ordered bands") {
    import spark.implicits._
    // global bands: band0 ×9, band1 ×9 (N = 18, m = 2 → m−1 = 1)
    // group (1,'A'): 3+3 → matches global → cum = 3·18 − 9·6 = 0 →
    //                emd 0, close
    // group (2,'B'): 6 band0 → |cum| = 6·18 − 9·6 = 54 →
    //                emd_bp = 10000·54 / (1·6·18) = 5000, not close
    // group (3,'C'): 6 band1 → cum = 0·18 − 9·6 = −54 → 5000, not close
    val rows =
      (1 to 3).map(i => (i.toLong, "c", 1, 100.0, "A")) ++
      (4 to 6).map(i => (i.toLong, "c", 1, 1100.0, "A")) ++
      (7 to 12).map(i => (i.toLong, "c", 2, 200.0, "B")) ++
      (13 to 18).map(i => (i.toLong, "c", 3, 1200.0, "C"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .createOrReplaceTempView("customer_tc")
    try {
      val got = spark.sql(Privacy.tClosenessSql(SparkSql, "customer_tc"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSeq
      assert(got == Seq(
        (1L, "A", 6L, 0L, true),
        (2L, "B", 6L, 5000L, false),
        (3L, "C", 6L, 5000L, false)), s"hand EMD mismatch: $got")
    } finally spark.catalog.dropTempView("customer_tc")
  }

  test("t-closeness: catalog query is non-vacuous and totally ordered at the oracle SF") {
    val rows = Privacy.qTCloseness.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r._1, r._2))
    assert(keys == keys.sorted && keys.distinct.size == keys.size)
    assert(rows.forall(r => r._3 >= 0L && r._3 <= 10000L),
      "EMD in basis points must live in [0, 10000]")
  }

  // ---- RAKE keyphrases ----

  test("rake: hand-derived degree/frequency scores, phrase collapse, tie-breaks") {
    import spark.implicits._
    // 'of' is a stopword; phrases are maximal stopword-free runs.
    // freq: red 2, apple 4, green 1, blue 1, sky 1
    // deg:  red 2+2=4, apple 2+2+2+1=7, green 2, blue 2, sky 2
    // wscore_bp: red 20000, apple 17500, green 20000, blue 20000, sky 20000
    // phrases: "blue sky" 40000×1, "red apple" 37500×2,
    //          "green apple" 37500×1, "apple" 17500×1
    val docs = Seq(
      (0L, "red apple of red apple", "en"),
      (1L, "green apple", "en"),
      (2L, "blue sky", "en"),
      (3L, "apple", "en"))
    docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    try {
      val got = spark.sql(TextAnalysis.rakeSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == Seq(
        (1L, "blue sky", 2L, 1L, 40000L),
        (2L, "red apple", 2L, 2L, 37500L),
        (3L, "green apple", 2L, 1L, 37500L),
        (4L, "apple", 1L, 1L, 17500L)), s"hand RAKE mismatch: $got")
    } finally {
      spark.catalog.dropTempView("documents")
      StageViews.unpersistAll(spark)
    }
  }

  test("rake: staged catalog query equals the self-contained spelling") {
    StageViews.documents(spark, OracleSf)
    val selfContained = spark.sql(TextAnalysis.rakeSparkSqlForTest).collect()
      .map(_.toSeq).toSeq
    val staged = TextAnalysis.qRake.run(spark, OracleSf).collect()
      .map(_.toSeq).toSeq
    assert(staged.nonEmpty && staged == selfContained)
    StageViews.unpersistAll(spark)
  }

  test("q_ann_ivf_stream: streamed per-list table equals the batch restatement") {
    graft.functions.CosineSimilarity.register(spark)
    val streamed = Similarity.qIvfStream.run(spark, OracleSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    StageViews.embeddings(spark, OracleSf)
    val batch = spark.sql(Similarity.ivfStreamSparkSqlForTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "stream-assigned membership stats must equal the batch asg1 chain")
    StageViews.unpersistAll(spark)
  }
}
