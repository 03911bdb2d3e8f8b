package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 behavioral specs: the embedding near-dup candidate join is
  * bounded (adaptive modulus + bucket-frequency cap) — the last
  * candidate-generation family to get a skew bound.
  */
class Round8OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 64-dim embedding whose first 6 signs encode `j` (bit set →
    * positive) and whose remaining dims are negative — with a 64-bucket
    * modulus the vector lands in bucket `j`.
    */
  private def patterned(j: Int): Array[Float] =
    Array.tabulate(64) { d =>
      if (d < 6) { if (((j >> d) & 1) == 1) 1.0f else -1.0f }
      else -0.5f - 0.01f * ((j + d) % 7)
    }

  /** All-positive embedding (bucket = modulus − 1 at any modulus) with
    * per-vector jitter so dense-bucket members are not exact copies.
    */
  private def allPositive(i: Int): Array[Float] =
    Array.tabulate(64)(d => 1.0f + 0.001f * ((i * (d + 1)) % 7))

  test("embedding near-dup: planted dense bucket is frequency-capped out of the self-join") {
    import spark.implicits._
    val nDense = 300 // doubled corpus puts 600 > EmbedBucketCap=200 in one bucket
    val nOk = 20
    val emb =
      ((0 until nOk).map(j => (j.toLong, patterned(j))) ++
        (0 until nDense).map(i => (100L + i, allPositive(i))))
        .toDF("vec_id", "embedding")

    // corpus = 640 rows → smallest 2^k with 2^k·16 ≥ 640 is 64
    assert(Dedup.embedModulusOn(spark, "dense-r8", emb) == 64L)
    Dedup.ensureEmbedBuckets(spark, "dense-r8", emb) // registers emb_bkt_v

    // UNCAPPED, the dense bucket alone would emit 600·599/2 pairs —
    // the n²-class blow-up the cap exists for; the 20 patterned vectors
    // contribute one (self, shifted-self) pair each.
    val uncapped = spark.sql("""
      SELECT count(*) FROM emb_bkt_v a
      JOIN emb_bkt_v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id""")
      .head().getLong(0)
    assert(uncapped == 600L * 599 / 2 + nOk, s"uncapped fan-out: $uncapped")

    // Capped: the dense bucket is dropped whole; only the 20 two-member
    // buckets survive into the candidate join.
    val capped = Dedup.embedCandidatesOn(spark, "dense-r8", emb)
    assert(capped == nOk.toLong, s"capped candidates: $capped")

    // …and the verified output is exactly the 20 true duplicate pairs
    // (each patterned vector with its IdShift copy, cosine 1.0); the
    // dense mega-cluster is the documented exact-dedup hand-off.
    val pairs = Dedup.embedOn(spark, "dense-r8", emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == (0 until nOk).map(j => (j.toLong, 10000000L + j)))
  }

  test("embedding near-dup: bucket modulus doubles with corpus size") {
    import spark.implicits._
    def corpus(n: Int) =
      spark.range(n).selectExpr("id AS vec_id", "array_repeat(CAST(1.0 AS FLOAT), 64) AS embedding")
    // 2n=1000 → 64·16=1024 ≥ 1000; 2n=10000 → 1024·16=16384 ≥ 10000
    assert(Dedup.embedModulusOn(spark, "mod-500-r8", corpus(500)) == 64L)
    assert(Dedup.embedModulusOn(spark, "mod-5000-r8", corpus(5000)) == 1024L)
  }

  test("incremental embedding dedup: copies match their source, negations miss, existing pairs stay silent") {
    import spark.implicits._
    // ids 0..11; the two planted IDENTICAL existing vectors (2 and 5,
    // both % 3 == 2) must never be reported — the asymmetric join
    // excludes existing×existing by construction
    val emb = ((0 to 11).map {
      case j @ (2 | 5) => (j.toLong, patterned(99))
      case j           => (j.toLong, patterned(j))
    }).toDF("vec_id", "embedding")
    val out = Dedup.embedIncrementalOn(spark, "incr-r8", emb)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
    val copies = Seq(0L, 3L, 6L, 9L).map(j => (10000000L + j, true, j))
    val negs = Seq(1L, 4L, 7L, 10L).map(j => (20000000L + j, false, -1L))
    assert(out == (copies ++ negs).sortBy(_._1))
  }

  test("weighted median: bucketed prefix-sum == naive single-window on tie-heavy data") {
    import spark.implicits._
    // adversarially tie-heavy: few distinct prices, many duplicate
    // (price, w) rows, prices straddling several $1000 buckets — the
    // case where per-row cum_w DOES depend on accumulation order and
    // only the end-of-price-group invariant saves determinism
    val rows = for {
      i <- 0 until 5000
      flag = Seq("A", "N", "R")(i % 3)
    } yield (flag, 900.0 + 997.0 * (i % 7), (1 + i % 5).toDouble)
    rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .createOrReplaceTempView("lineitem_wm")
    val naive = spark.sql(MultiDimAgg.weightedMedianSqlForTest("lineitem_wm"))
      .collect().map(_.toSeq).toSeq
    val bucketed = spark.sql(MultiDimAgg.wmBucketedSparkSqlForTest)
      .collect().map(_.toSeq).toSeq
    assert(bucketed == naive)
  }

  test("top customers: per-order pre-aggregate == naive countDistinct spelling") {
    val dir = "/root/testdata/sf0.001"
    val opt = Joins.qTopCustomers.run(spark, dir).collect().map(_.toSeq).toSeq
    val naive = Joins.topCustomersNaiveForTest(spark, dir).collect().map(_.toSeq).toSeq
    assert(opt == naive)
  }

  test("stream-static incremental dedup == batch incremental dedup (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val stream = Dedup.qEmbedIncrStream.run(spark, dir).collect().map(_.toSeq).toSeq
    val batch = Dedup.qEmbedIncremental.run(spark, dir).collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("file-stream sources read directory-layout tables (sf1-probe regression)") {
    // driver testdata is single-FILE parquet; df.write.parquet produces
    // a DIRECTORY — the layout every real dataset has. The old
    // dir+pathGlobFilter spelling silently streamed zero files from it.
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("dirlayout_r8").toString
    graft.Tables.documents(spark, src).write.parquet(s"$dir/documents.parquet")
    graft.Tables.embeddings(spark, src).write.parquet(s"$dir/embeddings.parquet")
    val streamRows = Dedup.qDedupStreamExact.run(spark, dir).collect()
    val batchRows = spark.sql(
      "SELECT source, count(DISTINCT md5(text)) AS n FROM parquet.`" +
        s"$dir/documents.parquet` GROUP BY source ORDER BY source").collect()
    assert(streamRows.nonEmpty)
    assert(streamRows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      batchRows.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // the stream-static join reads the same layout-aware source
    val incr = Dedup.qEmbedIncrStream.run(spark, dir).count()
    assert(incr > 0)
  }

  test("two-level IVF: total lists track sqrt(n) past the old 4096 single-level ceiling") {
    def corpus(n: Long) =
      spark.range(n).selectExpr("id AS vec_id", "array(CAST(1.0 AS FLOAT)) AS embedding")
    // 30M vectors: T = ceil(sqrt 3e7) = 5478 — the r7 single-level cap
    // froze nlists at 4096 here; two levels factor T as 75 × 74 with
    // both centroid tables broadcastable
    val (t, nl1, nl2, np1, np2) =
      Similarity.ivfParamsOn(spark, "params-30m-r8", corpus(30000000L))
    assert((t, nl1, nl2) == ((5478, 75, 74)), s"got ($t, $nl1, $nl2)")
    assert(nl1 * nl2 >= t, "factored list count must cover T")
    assert((np1, np2) == ((9, 9)))
    // …and at driver scale the same formulas stay sane
    val (t2, a, b, p1, p2) = Similarity.ivfParamsOn(spark, "params-2k-r8", corpus(2000))
    assert((t2, a, b, p1, p2) == ((45, 7, 7, 3, 3)))
  }
}
