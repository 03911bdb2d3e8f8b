package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 operator laws: the hybrid-retrieval reciprocal-rank fusion
  * (hand-derived integer arithmetic, the list-membership dominance law,
  * equivalence of the fused query to a Scala re-derivation from the two
  * rankers' own outputs), the BPE driver/SQL framing-space parity on
  * control-character words (r17 ADVICE high), and the stored-stage-view
  * disk reclamation (r17 ADVICE low).
  */
class Round18OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- BPE: the r17 ADVICE-high regression ----

  test("bpe train: word-initial/word-final control chars survive the driver collect") {
    // seg0 frames every segmentation with EXACTLY one space per side;
    // the driver once stripped it with Java String.trim, which eats
    // every char <= U+0020 — so the "\n" base token of word "\nb"
    // vanished from the driver token arrays while the SQL spelling
    // (space-only trim) kept it, silently diverging the learned merges
    // from the DuckDB oracle.
    import spark.implicits._
    val docs = Seq((0L, "\nb \nb c\n", "en")).toDF("doc_id", "text", "lang")
    val got = Bpe.trainOn(spark, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    // words: "\nb" x2 (pairs ("\n","b") cnt 2), "c\n" x1 (("c","\n") cnt 1)
    assert(got.take(2) == Seq(
      (1L, "\n", "b", "\nb", 2L), (2L, "c", "\n", "c\n", 1L)),
      s"control-char base tokens must survive framing-space removal: $got")
  }

  // ---- hybrid retrieval: reciprocal-rank fusion ----

  private def withRankedLists[A](bm: Seq[(Long, Long, Long)],
      an: Seq[(Long, Long, Long)])(f: => A): A = {
    import spark.implicits._
    bm.toDF("query_id", "doc_id", "rank").createOrReplaceTempView("bm_test")
    an.toDF("query_id", "doc_id", "rank").createOrReplaceTempView("an_test")
    try f finally {
      spark.catalog.dropTempView("bm_test")
      spark.catalog.dropTempView("an_test")
    }
  }

  private def fuse(): Seq[(Long, Long, Long, Long, Long)] =
    spark.sql(Retrieval.rrfFuseSparkSqlForTest("bm_test", "an_test")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("rrf: hand-derived integer fusion arithmetic and tie-break") {
    // q0 lexical: docs 1,2,3 at ranks 1..3; dense: docs 3,9 at ranks 1,2.
    // rrf_bp = 10000 DIV (60 + rank):
    //   doc3 = 10000 DIV 63 + 10000 DIV 61 = 158 + 163 = 321 (n_lists 2)
    //   doc1 = 163; doc2 = 10000 DIV 62 = 161; doc9 = 161
    //   tie at 161 breaks by doc_id: doc2 before doc9
    val got = withRankedLists(
      Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)),
      Seq((0L, 3L, 1L), (0L, 9L, 2L)))(fuse())
    assert(got == Seq(
      (0L, 1L, 3L, 321L, 2L),
      (0L, 2L, 1L, 163L, 1L),
      (0L, 3L, 2L, 161L, 1L),
      (0L, 4L, 9L, 161L, 1L)))
  }

  test("rrf: worst both-lists doc outranks the best single-list doc") {
    // The dominance law at its WORST margin: doc 15 sits at the very
    // bottom of both lists (lexical rank 5, dense rank 10) and must
    // still beat every rank-1 single-list doc:
    //   10000 DIV 65 + 10000 DIV 70 = 153 + 142 = 295 > 10000 DIV 61 = 163.
    // A fortiori, a doc TOP-ranked by both rankers outranks any
    // single-ranker doc (the r17 VERDICT done-condition).
    val bm = (1L to 5L).map(r => (1L, 10L + r, r))           // docs 11..15
    val an = (1L to 9L).map(r => (1L, 24L + r, r)) :+ ((1L, 15L, 10L))
    val got = withRankedLists(bm, an)(fuse())
    assert(got.head == (1L, 1L, 15L, 295L, 2L),
      s"worst both-lists doc must rank first: $got")
    assert(got.tail.forall(_._5 == 1L))
  }

  private def withCorpus[A](nDocs: Int)(f: => A): A = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val docs = (0 until nDocs).map { i =>
      val words = Seq.fill(nDocs - i)("alpha") ++ Seq.fill(i % 3)("beta") ++
        Seq.fill(i % 5)("gamma") ++ Seq(s"w$i")
      (i.toLong, words.mkString(" "), "en")
    }
    docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    // near-parallel vectors with an id-keyed perturbation: neighbor
    // order is deterministic and id-local, so dense lists overlap the
    // lexical lists on low ids
    val embs = (0 until nDocs).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        (if (j == 0) 1.0 else math.sin(i * 31 + j * 7) * 1e-3).toFloat))
    }
    embs.toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
    try f finally {
      spark.catalog.dropTempView("documents")
      spark.catalog.dropTempView("embeddings")
      // replacing 'documents'/'embeddings' clobbered any harness-level
      // StageViews registrations (and invalidated their caches); clear
      // the registry so a later catalog-path test re-registers cleanly
      StageViews.unpersistAll(spark)
    }
  }

  test("hybrid retrieval: fused query equals the Scala re-derivation from both rankers") {
    withCorpus(30) {
      // the two ranked lists, as the rankers themselves emit them
      val bm = spark.sql(Retrieval.bm25SparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSeq // (q, doc, rank)
      val an = spark.sql(Similarity.bruteSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSeq
      assert(bm.nonEmpty && an.nonEmpty)
      val expected = (bm ++ an)
        .groupBy(t => (t._1, t._2))
        .map { case ((q, d), ts) =>
          (q, d, ts.map(t => 10000L / (60L + t._3)).sum, ts.size.toLong)
        }.toSeq
        .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          rows.sortBy(r => (-r._3, r._2)).take(Retrieval.TopK).zipWithIndex
            .map { case ((q, d, s, n), i) => (q, (i + 1).toLong, d, s, n) }
        }.sortBy(r => (r._1, r._2))
      val got = spark.sql(Retrieval.hybridSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == expected, "fused SQL must equal the independent re-derivation")
      assert(got.exists(_._5 == 2L),
        "corpus must exercise the both-lists path (overlap exists by construction)")
      // dominance law on the fused output itself
      got.groupBy(_._1).values.foreach { rows =>
        val worstBoth = rows.filter(_._5 == 2L).map(_._4)
        val bestSingle = rows.filter(_._5 == 1L).map(_._4)
        if (worstBoth.nonEmpty && bestSingle.nonEmpty)
          assert(worstBoth.min > bestSingle.max)
      }
    }
  }

  test("hybrid retrieval: catalog query is non-vacuous, totally ordered, law-abiding at the oracle SF") {
    val rows = Retrieval.qHybrid.run(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r._1, r._2))
    assert(keys == keys.sorted && keys.distinct.length == keys.length,
      "total ORDER BY (query_id, rank)")
    assert(rows.groupBy(_._1).values.forall(_.size <= Retrieval.TopK))
    // every both-lists doc outranks every single-list doc, per query
    rows.groupBy(_._1).values.foreach { qs =>
      val both = qs.filter(_._5 == 2L).map(_._4)
      val single = qs.filter(_._5 == 1L).map(_._4)
      if (both.nonEmpty && single.nonEmpty)
        assert(both.min > single.max, s"dominance law violated: $qs")
    }
  }

  // ---- BM25 pseudo-relevance feedback ----

  test("bm25 prf: no expandable vocabulary reduces PRF to plain BM25") {
    // A 2-term corpus: both terms land in the SINGLE query (query 0
    // owns {cat, dog}), so the per-query anti-join leaves zero
    // expansion candidates — terms of OTHER queries would be fair
    // expansions, which is why a merely-small corpus (all terms in the
    // 40-term workload) does NOT reduce: the law needs the top docs to
    // contain only the query's own terms.
    import spark.implicits._
    val docs = (0 until 12).map { i =>
      val words = Seq.fill(1 + i % 4)("cat") ++ Seq.fill(i % 3)("dog")
      (i.toLong, words.mkString(" "), "en")
    }
    docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    try {
      val bm = spark.sql(Retrieval.bm25SparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val prf = spark.sql(Retrieval.prfSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toSeq
      assert(prf.map(r => (r._1, r._2, r._3, r._4)) == bm,
        "PRF with no expansion must reproduce the BM25 ranking exactly")
      assert(prf.forall(r => r._5 == "" && r._6 == ""))
    } finally {
      spark.catalog.dropTempView("documents")
      StageViews.unpersistAll(spark)
    }
  }

  test("bm25 prf: expansion terms are fresh, non-stop, and drawn from round-1 top docs") {
    import spark.implicits._
    // 61 distinct non-stop terms (> QueryTerms=40), so real expansion
    // candidates exist outside the query workload
    val docs = (0 until 50).map { i =>
      val words = Seq.fill(3 + i % 4)("alpha") ++
        Seq.fill(i % 3)(s"mid${i % 10}") ++ Seq.fill(1 + i % 5)(s"u$i")
      (i.toLong, words.mkString(" "), "en")
    }
    docs.map { case (i, t, l) => (i, t, l) }
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    try {
      val bm = spark.sql(Retrieval.bm25SparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4),
          r.getString(5))).toSeq // (q, rank, doc, term_a, term_b)
      val prf = spark.sql(Retrieval.prfSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4),
          r.getString(5))).toSeq
      assert(prf.nonEmpty)
      val docTokens = docs.map { case (id, text, _) => id -> text.split(" ").toSet }.toMap
      val origTerms = bm.map(r => r._1 -> Set(r._4, r._5)).toMap
      val top3 = bm.filter(_._2 <= Retrieval.PrfDocs).groupBy(_._1)
        .view.mapValues(_.map(_._3).toSet).toMap
      val exps = prf.map(r => (r._1, r._4, r._5)).distinct
      assert(exps.exists(e => e._2.nonEmpty), "corpus must produce real expansions")
      val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
      for ((q, a, b) <- exps; t <- Seq(a, b) if t.nonEmpty) {
        assert(!stop(t), s"expansion term '$t' is a stopword")
        assert(!origTerms(q)(t), s"expansion term '$t' already in query $q")
        assert(top3(q).exists(d => docTokens(d)(t)),
          s"expansion term '$t' of query $q not present in its round-1 top-${Retrieval.PrfDocs} docs")
      }
    } finally {
      spark.catalog.dropTempView("documents")
      StageViews.unpersistAll(spark)
    }
  }

  test("bm25 prf: catalog query is non-vacuous, expanding, totally ordered at the oracle SF") {
    val rows = Retrieval.qPrf.run(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r._1, r._2))
    assert(keys == keys.sorted && keys.distinct.length == keys.length)
    assert(rows.exists(_._5.nonEmpty),
      "the oracle-SF corpus has > 40 terms; some query must actually expand")
  }

  // ---- positional phrase search ----

  private def withPlainDocs[A](rows: (Long, String)*)(f: => A): A = {
    import spark.implicits._
    rows.toDF("doc_id", "text").selectExpr("doc_id", "text", "'en' AS lang")
      .createOrReplaceTempView("documents")
    try f finally {
      spark.catalog.dropTempView("documents")
      StageViews.unpersistAll(spark)
    }
  }

  private def phrase(): Seq[(Long, Long, Long, Long, String, String)] =
    spark.sql(Retrieval.phraseSparkSqlForTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq

  test("phrase search: hand-derived workload, per-doc counts, ranking") {
    // doc0 "big cat big cat": bigrams (big,cat)x2, (cat,big)x1
    // doc1 "big cat dog":     (big,cat)x1, (cat,dog)x1
    // workload by total DESC, terms ASC: 1=(big,cat) 3, 2=(cat,big) 1,
    // 3=(cat,dog) 1. Ranks by per-doc tf DESC, doc_id ASC.
    val got = withPlainDocs(0L -> "big cat big cat", 1L -> "big cat dog")(phrase())
    assert(got == Seq(
      (1L, 1L, 0L, 2L, "big", "cat"),
      (1L, 2L, 1L, 1L, "big", "cat"),
      (2L, 1L, 0L, 1L, "cat", "big"),
      (3L, 1L, 1L, 1L, "cat", "dog")))
  }

  test("phrase search: overlapping occurrences count per position pair") {
    // "z z z" has (z,z) at positions 1 and 2 — positional-index
    // semantics count both (unlike a non-overlapping string scan)
    val got = withPlainDocs(0L -> "z z z")(phrase())
    assert(got == Seq((1L, 1L, 0L, 2L, "z", "z")))
  }

  test("phrase search: stopword-adjacent bigrams and 1-word docs are excluded") {
    val got = withPlainDocs(
      0L -> "x", 1L -> "the cat", 2L -> "ant bee")(phrase())
    assert(got == Seq((1L, 1L, 2L, 1L, "ant", "bee")),
      s"only the non-stop bigram survives: $got")
  }

  test("phrase search: catalog query is non-vacuous and totally ordered at the oracle SF") {
    val rows = Retrieval.qPhrase.run(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.nonEmpty)
    assert(rows == rows.sorted && rows.distinct.length == rows.length)
  }

  test("bm25 index stream: stream-maintained workload equals the batch staged relation") {
    val dir = "/root/testdata/sf0.01"
    val streamed = Retrieval.qIndexStream.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty && streamed.size <= Retrieval.QueryTerms,
      s"workload carries min(${Retrieval.QueryTerms}, distinct non-stop terms); " +
        s"sf0.01 has fewer than ${Retrieval.QueryTerms}")
    // the batch side: force the staged workload via the bm25 catalog
    // query's stage builder, then read bm25_qt_v directly
    Retrieval.qBm25.run(spark, dir).collect()
    val batch = spark.table("bm25_qt_v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(r => (r._1, r._2))
    assert(streamed == batch,
      "incremental (stream-maintained) index must derive the identical workload")
  }

  // ---- StageViews: stored-tier disk reclamation (r17 ADVICE) ----

  private def storeDirs(): Set[String] = {
    val root = new java.io.File("target/stageviews")
    Option(root.listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
  }

  test("ensureStored: key supersession deletes the superseded parquet store") {
    import spark.implicits._
    try {
      StageViews.ensureStored(spark, "r18_store_v", "k1")(Seq(1, 2).toDF("x"))
      val afterK1 = storeDirs().filter(_.startsWith("r18_store_v_"))
      assert(afterK1.size == 1, s"one store dir per live (name, key): $afterK1")
      StageViews.ensureStored(spark, "r18_store_v", "k2")(Seq(3, 4).toDF("x"))
      val afterK2 = storeDirs().filter(_.startsWith("r18_store_v_"))
      assert(afterK2.size == 1 && afterK2 != afterK1,
        s"supersession must delete the k1 store and leave only k2's: $afterK2")
      assert(spark.table("r18_store_v").collect().map(_.getInt(0)).sorted.toSeq
        == Seq(3, 4))
    } finally StageViews.unpersistAll(spark)
  }

  test("unpersistAll: reclaims stored parquet dirs, and rebuild works after") {
    import spark.implicits._
    StageViews.ensureStored(spark, "r18_reclaim_v", "k")(Seq(5).toDF("x"))
    assert(storeDirs().exists(_.startsWith("r18_reclaim_v_")))
    StageViews.unpersistAll(spark)
    assert(!storeDirs().exists(_.startsWith("r18_reclaim_v_")),
      "end-of-run eviction must reclaim the stored tier's disk")
    // a later ensure transparently rebuilds into a fresh dir
    val df = StageViews.ensureStored(spark, "r18_reclaim_v", "k")(Seq(6).toDF("x"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(6))
    StageViews.unpersistAll(spark)
  }
}
