package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic laws for the round-6 operators (cross-engine hash equality
  * is the driver gate's job; these pin data-independent properties and
  * the distributed-vs-naive equivalence of the prefix-sum packing).
  */
class Round6OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("sequence_pack: two-phase prefix sum == naive global window; seq spans consistent") {
    val out = Packing.qSequencePack.run(spark, dir)
    out.createOrReplaceTempView("pack")
    graft.Tables.documents(spark, dir).createOrReplaceTempView("docs_raw")
    // naive single-partition reference (fine at spec scale)
    val laws = spark.sql(s"""
      WITH ref AS (
        SELECT doc_id,
               sum(CAST(size(split(text, ' ')) AS BIGINT))
                 OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - CAST(size(split(text, ' ')) AS BIGINT) AS ref_start
        FROM docs_raw)
      SELECT
        count_if(p.start_tok <> r.ref_start) AS wrong_start,
        count_if(p.first_seq <> p.start_tok DIV ${Packing.SeqLen}) AS wrong_first,
        count_if(p.last_seq < p.first_seq) AS inverted_span,
        count_if(p.n_seqs <> p.last_seq - p.first_seq + 1) AS wrong_nseqs,
        count_if(p.n_tok > ${Packing.SeqLen} AND
                 p.n_seqs < (p.n_tok + ${Packing.SeqLen} - 1) DIV ${Packing.SeqLen}) AS span_too_small
      FROM pack p JOIN ref r USING (doc_id)
      """).collect()(0)
    (0 until 5).foreach(i => assert(laws.getLong(i) == 0L,
      s"law ${laws.schema(i).name} violated ${laws.getLong(i)} times"))
  }

  test("corpus_mix: shares sum to ~10000 and weights invert shares exactly") {
    val rows = Packing.qCorpusMix.run(spark, dir).collect()
    val nLangs = rows.length
    val shareSum = rows.map(_.getAs[Long]("actual_share_bp")).sum
    // floor division loses < 1 bp per language
    assert(shareSum > 10000L - nLangs && shareSum <= 10000L)
    val allTokens = rows.map(_.getAs[Long]("lang_tokens")).sum
    rows.foreach { r =>
      val expect = 10000L * allTokens / (nLangs * r.getAs[Long]("lang_tokens"))
      assert(r.getAs[Long]("uniform_weight_bp") == expect)
    }
  }

  test("reservoir sample: per-stratum size = min(K, stratum size), stable under repartition") {
    val out = Sampling.qReservoir.run(spark, dir)
    val sizes = out.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.Tables.events(spark, dir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (t, n) =>
      assert(sizes(t) == math.min(Sampling.ReservoirK.toLong, n))
    }
    // determinism: a differently-partitioned input draws the same rows
    // (fed through reservoirOn — run() re-registers the base `events`
    // view and would clobber a repartitioned view of the same name)
    val again = Sampling.reservoirOn(spark,
      graft.Tables.events(spark, dir).repartition(13)).collect().toSet
    assert(again == out.collect().toSet)
  }

  test("containment: synthetic sub-document is detected in its container, not vice versa") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"w$i").mkString(" ")       // doc 1 = prefix
    val container = words + " " + (100 to 160).map(i => s"x$i").mkString(" ")
    val unrelated = (200 to 240).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, words), (2L, container), (3L, unrelated)).toDF("doc_id", "text")
    val out = Dedup.containmentOn(spark, "containtest-r6", docs)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("containment_bp"))).toList
    // every shingle of doc 1 appears in doc 2 → containment 10000
    assert(out.exists { case (a, b, bp) => a == 1L && b == 2L && bp == 10000L })
    // doc 2 is NOT contained in doc 1 (it has many extra shingles)
    assert(!out.exists { case (a, b, _) => a == 2L && b == 1L })
    // unrelated doc matches nothing
    assert(!out.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  test("source boilerplate: planted template flagged per source; small sources exempt") {
    import spark.implicits._
    val template = (1 to 10).map(i => s"tmpl$i").mkString(" ")
    // source A: 6 docs sharing a 10-word template prefix + distinct tails
    val a = (0 until 6).map { i =>
      (i.toLong, template + " " + (0 until 20).map(j => s"a${i}w$j").mkString(" "), "srcA")
    }
    // source B: 4 docs (< 5-doc floor) sharing the same template
    val b = (0 until 4).map { i =>
      (100L + i, template + " " + (0 until 20).map(j => s"b${i}w$j").mkString(" "), "srcB")
    }
    val docs = (a ++ b).toDF("doc_id", "text", "source")
    val out = TextAnalysis.boilerplateOn(spark, "boiler-r6", docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_boiler"), r.getAs[Long]("boiler_bp"))).toMap
    // the 6 template shingles appear in all 6 srcA docs -> boilerplate
    (0L until 6L).foreach { id =>
      assert(out(id)._1 == 6L, s"doc $id: expected 6 boiler shingles, got ${out(id)._1}")
      assert(out(id)._2 > 0L)
    }
    // srcB is under the 5-doc floor: nothing flagged
    (100L until 104L).foreach(id => assert(out(id)._1 == 0L))
  }

  test("weighted sample: saturated docs always kept; kept rate grows with token count") {
    import spark.implicits._
    val out = Sampling.qWeighted.run(spark, dir)
    out.createOrReplaceTempView("wsmp")
    graft.Tables.documents(spark, dir).createOrReplaceTempView("docs_w")
    // every kept row satisfies its own threshold, and every EXCLUDED
    // doc fails it (recompute hv independently in SQL)
    val laws = spark.sql("""
      WITH t AS (SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tok FROM docs_w),
      w AS (SELECT doc_id, n_tok,
                   CASE WHEN n_tok >= 256 THEN CAST(268435456 AS BIGINT)
                        ELSE n_tok * CAST(1048576 AS BIGINT) END AS thresh FROM t)
      SELECT
        count_if(s.doc_id IS NOT NULL AND s.hv >= w.thresh) AS kept_over_threshold,
        count_if(s.doc_id IS NULL AND w.n_tok >= 256) AS saturated_dropped
      FROM w LEFT JOIN wsmp s USING (doc_id)
      """).collect()(0)
    assert(laws.getLong(0) == 0L && laws.getLong(1) == 0L)
  }

  test("leakage-safe split: a cluster never straddles splits; buckets cover 90/5/5") {
    val out = Sampling.qLeakageSafeSplit.run(spark, dir)
    out.createOrReplaceTempView("lsplit")
    val laws = spark.sql("""
      SELECT
        count_if(n_splits > 1) AS straddling_clusters,
        count_if(bad_label) AS bad_labels
      FROM (SELECT cluster_rep,
                   count(DISTINCT split) AS n_splits,
                   bool_or(split NOT IN ('train', 'val', 'test') OR
                           (split = 'train') <> (min_b < 90)) AS bad_label
            FROM (SELECT *, min(bucket) OVER (PARTITION BY cluster_rep) AS min_b
                  FROM lsplit)
            GROUP BY cluster_rep)
      """).collect()(0)
    assert(laws.getLong(0) == 0L, "near-dup cluster split across train/test")
    assert(laws.getLong(1) == 0L)
    // same corpus as q_split_assign: every doc appears exactly once
    assert(out.count() == graft.Tables.documents(spark, dir).count())
  }

  test("ivf recall: one row per probe, overlap in [0,5], multi-probe holds real recall") {
    val out = Similarity.qIvfRecall.run(spark, dir).collect()
    assert(out.length == 20)
    val ns = out.map(_.getAs[Long]("n_common"))
    assert(ns.forall(n => n >= 0L && n <= 5L))
    // the multi-probe index must beat chance decisively — a broken
    // assignment (wrong centroid join, probe list off-by-one) craters
    // this to ~0 long before it fails the hash gate on fresh data
    val mean = ns.sum.toDouble / ns.length
    assert(mean > 3.0, s"mean recall@5 $mean — index quality collapsed")
  }

  test("mrl recall: one row per probe query (zero-overlap included), overlap in [0,10]") {
    val out = Similarity.qMrl.run(spark, dir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val n = r.getAs[Long]("n_common")
      assert(n >= 0L && n <= 10L)
    }
    // the 32-dim prefix of random-ish embeddings should retain real
    // neighbor structure: average overlap strictly above chance
    val mean = out.map(_.getAs[Long]("n_common")).sum.toDouble / out.length
    assert(mean > 1.0, s"mean overlap $mean suspiciously low")
  }
}
