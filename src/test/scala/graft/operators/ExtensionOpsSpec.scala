package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the training-data-pipeline operators
  * (hash-equality vs DuckDB is covered by the driver gate / tools/check.py;
  * these pin the properties that must hold regardless of data).
  */
class ExtensionOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("exact dedup on self-union: every group has exactly 2 copies") {
    val rows = Dedup.qExact.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_copies") == 2L))
    // keeper is always the original (unshifted) id
    assert(rows.forall(_.getAs[Long]("keep_id") < 10000000L))
  }

  test("minhash-LSH pairs are a subset of exact n-gram Jaccard pairs") {
    val exact = Dedup.qNgram.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.qMinhash.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact), s"LSH produced non-near-dup pairs: ${lsh -- exact}")
    // recall on this corpus should be high (bands are generous)
    assert(lsh.size * 10 >= exact.size * 8, s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("embedding dedup finds exactly the self-union twins") {
    val rows = Dedup.qEmbed.run(spark, dir).collect()
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(rows.length == n) // each vector pairs with its shifted copy
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 10000000L))
  }

  test("brute-force ANN: ranks are 1..10 per query, no self-matches") {
    val rows = Similarity.qBrute.run(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 20)
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L))
      assert(!rs.map(_.getAs[Long]("neighbor_id")).contains(q))
    }
  }

  test("IVF ANN: neighbors drawn from probed lists, ranks 1..5") {
    val rows = Similarity.qIvf.run(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 20)
    for ((_, rs) <- byQ)
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L))
  }

  test("langid predicts a language for every document") {
    val rows = TextAnalysis.qLangId.run(spark, dir).collect()
    assert(rows.length == graft.Tables.documents(spark, dir).count())
    assert(rows.forall(r => r.getAs[String]("predicted_lang") != null))
  }

  test("session_window MERGES an event at the EXACT gap boundary (oracle uses > gap)") {
    // Empirically (Spark 4.1): an event exactly gap-separated from its
    // predecessor is merged into the SAME session — the merge treats the
    // window as closed at start+gap. Only a strictly-larger gap splits.
    // The DuckDB oracle's new-session predicate is therefore `diff > gap`;
    // this fixture pins Spark's side so a future semantics change is loud.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gapUs = Sessionize.GapUs // 30 min in µs
    val t0 = 1700000000000000L
    val events = Seq(
      (1L, t0),                 // session A
      (1L, t0 + gapUs),         // exactly gap later -> merged, still A
      (1L, t0 + gapUs + 1000L), // inside A's extension
      (2L, t0),                 // session B
      (2L, t0 + 2 * gapUs + 1L) // strictly beyond gap from t0+gap -> NEW session C
    ).toDF("user_id", "ts_us")
    val sessions = events
      .withColumn("event_time", expr("timestamp_micros(ts_us)"))
      .groupBy($"user_id", session_window($"event_time", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(sessions.toSeq == Seq((1L, 3L), (2L, 1L), (2L, 1L)),
      s"unexpected session split: ${sessions.toSeq}")
  }

  test("multimodal decode: md5 matches, batching preserves all rows") {
    val rows = Multimodal.qDecode.run(spark, dir).collect()
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "text", "md5(text) AS h").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows.length == docs.size)
    for (r <- rows.take(20)) {
      val (text, h) = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("content_md5") == h)
      assert(r.getAs[Long]("byte_len") == text.getBytes("UTF-8").length)
      assert(r.getAs[Boolean]("decode_ok"))
    }
  }
}
