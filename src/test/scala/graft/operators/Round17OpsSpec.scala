package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 operator laws: the integer-exact BM25 scorer — hand-derived
  * contribution arithmetic on a corpus small enough to check by hand,
  * ranking order, the deterministic query-workload construction, and
  * the two-phase == single-phase top-k law the salted spelling relies
  * on at scale.
  */
class Round17OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withDocs[A](rows: (Long, String)*)(f: => A): A = {
    import spark.implicits._
    rows.toDF("doc_id", "text").selectExpr("doc_id", "text", "'en' AS lang")
      .createOrReplaceTempView("documents")
    try f finally spark.catalog.dropTempView("documents")
  }

  private def run(): Seq[(Long, Long, Long, Long, String, String)] =
    spark.sql(Retrieval.bm25SparkSqlForTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq

  test("bm25: hand-derived integer contribution on a 2-doc corpus") {
    // docs: 0 = "cat cat dog" (len 3), 1 = "dog fish fish fish" (len 4)
    // N=2, TL=7; terms: cat(df1) dog(df2) fish(df1)
    // qrank by (df DESC, term): dog(1), cat(2), fish(3)
    // -> query 0 = {dog, cat}, query 1 = {fish} (odd tail: term_a==term_b)
    // idf_bp: df=2 -> 10000*1 DIV 3 = 3333; df=1 -> 10000*2 DIV 2 = 10000
    // ratio_bp(tf, len) = 440000*tf*7 DIV (140*tf + 42 + 36*len):
    //   doc0 cat tf2 len3: 6160000 DIV 430 = 14325 -> c = 10000*14325 DIV 10000 = 14325
    //   doc0 dog tf1 len3: 3080000 DIV 290 = 10620 -> c = 3333*10620 DIV 10000 = 3539
    //   doc1 dog tf1 len4: 3080000 DIV 326 =  9447 -> c = 3333*9447  DIV 10000 = 3148
    //   doc1 fish tf3 len4: 9240000 DIV 606 = 15247 -> c = 15247
    // query 0: doc0 = 14325+3539 = 17864; doc1 = 3148
    // query 1: doc1 = 15247
    val got = withDocs(0L -> "cat cat dog", 1L -> "dog fish fish fish")(run())
    assert(got == Seq(
      (0L, 1L, 0L, 17864L, "cat", "dog"),
      (0L, 2L, 1L, 3148L, "cat", "dog"),
      (1L, 1L, 1L, 15247L, "fish", "fish")))
  }

  test("bm25: stopwords are excluded from terms and query workload") {
    val got = withDocs(0L -> "the the the cat", 1L -> "the cat cat")(run())
    assert(got.forall(r => r._5 != "the" && r._6 != "the"))
    // only 'cat' survives -> a single 1-term query over both docs;
    // doc1 (tf 2, len 3) must outrank doc0 (tf 1, len 4)
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((0L, 1L, 1L), (0L, 2L, 0L)))
  }

  test("bm25: two-phase salted top-k equals the single-phase spelling") {
    // 80 docs with varying tf of a shared vocabulary — enough doc_ids
    // to populate many salt groups per query
    val docs = (0L until 80L).map { i =>
      val words = Seq.fill((i % 7).toInt + 1)("alpha") ++
        Seq.fill((i % 5).toInt)("beta") ++
        Seq.fill((i % 3).toInt)("gamma") ++ Seq("delta")
      i -> words.mkString(" ")
    }
    withDocs(docs: _*) {
      val two = run()
      val one = spark.sql(Retrieval.bm25SinglePhaseSparkSql).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toSeq
      assert(two == one, "salted pre-rank must not change the top-k")
      assert(two.nonEmpty && two.groupBy(_._1).values.forall(_.size <= Retrieval.TopK))
    }
  }

  test("collocations: hand-derived integer PMI ratio, min support, ordering") {
    // doc0 "big cat big cat", doc1 "big cat dog": W=7 tokens,
    // unigrams big=3 cat=3 dog=1; bigrams B=5: (big,cat)x3 (cat,big)x1
    // (cat,dog)x1 — min support 3 keeps only (big,cat):
    // assoc_bp = ((10000*3*7) DIV 5) * 7 DIV 9 = 42000*7 DIV 9 = 32666
    val got = withDocs(0L -> "big cat big cat", 1L -> "big cat dog") {
      spark.sql(TextAnalysis.collocationsSparkSqlForTest).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    }
    assert(got == Seq((1L, "big", "cat", 3L, 3L, 3L, 32666L)))
  }

  test("collocations: single-word docs and stopword-adjacent pairs are excluded") {
    // "x" alone has no bigram slot (Spark's sequence(1,0) DESCENDS —
    // the len>=2 filter must fire before the position series);
    // "the cat"-style pairs die on the stopword filter
    val got = withDocs(
      0L -> "x", 1L -> "the cat", 2L -> "ant bee ant bee ant bee") {
      spark.sql(TextAnalysis.collocationsSparkSqlForTest).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    assert(got == Seq(("ant", "bee", 3L)),
      s"only the supported non-stop bigram survives, got $got")
  }

  test("StageViews.ensureStored: build-once, key supersession, exact round-trip") {
    import spark.implicits._
    var builds = 0
    def mk(n: Int) = { builds += 1; Seq((1L, s"v$n"), (2L, s"w$n")).toDF("id", "s") }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    try {
      val a = StageViews.ensureStored(spark, "r17_store_v", "k1")(mk(1))
      assert(builds == 1)
      assert(rows(a) == Seq((1L, "v1"), (2L, "w1")),
        "stored view round-trips the relation exactly")
      // same key: the builder must not even be evaluated (no rewrite)
      StageViews.ensureStored(spark, "r17_store_v", "k1")(mk(2))
      assert(builds == 1, "same (name, key): registration is a no-op")
      assert(rows(spark.table("r17_store_v")) == Seq((1L, "v1"), (2L, "w1")))
      // a new corpus key supersedes: rebuilt, view reads the new store
      val c = StageViews.ensureStored(spark, "r17_store_v", "k2")(mk(3))
      assert(builds == 2)
      assert(rows(c) == Seq((1L, "v3"), (2L, "w3")),
        "new key re-materializes and the view follows")
    } finally StageViews.unpersistAll(spark)
  }

  test("StageViews.ensureStored: attributed build lands in the build log") {
    import spark.implicits._
    StageViews.enableBuildAttribution(() => "r17_spec_query")
    try {
      StageViews.ensureStored(spark, "r17_store_attr_v", "k")(
        Seq(1, 2, 3).toDF("x"))
      val log = StageViews.buildLog
      assert(log.exists(b => b.view == "r17_store_attr_v" &&
        b.chargedTo == "r17_spec_query" && b.sec >= 0.0),
        s"stored build must be itemized like a cached one: $log")
    } finally {
      StageViews.disableBuildAttribution()
      StageViews.unpersistAll(spark)
    }
  }

  test("bm25: catalog query is non-vacuous and totally ordered at the oracle SF") {
    val rows = Retrieval.qBm25.run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(keys == keys.sorted, "total ORDER BY (query_id, rank)")
    assert(keys.distinct.length == keys.length)
  }
}
