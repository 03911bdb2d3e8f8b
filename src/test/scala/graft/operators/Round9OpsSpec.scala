package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 behavioral specs: plan pins for the r8 perf rewrites —
  * the audit conclusions that used to live only in a judge-read
  * explain dump become CI assertions.
  */
class Round9OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  /** The EXPLAIN_r9_top_customers.txt audit as an assertion: the
    * pre-aggregate rewrite must stay shuffle-minimal — ONE fact-side
    * exchange (lineitem → l_orderkey for the per-order pre-aggregate)
    * plus ONE for the final per-customer aggregate. The orders and
    * customer joins broadcast at test scale; the join must NOT
    * re-shuffle the pre-aggregated fact side (its l_orderkey
    * partitioning is exactly the join key). A third shuffle appearing
    * here means the rewrite's whole point — killing the re-shuffle of
    * the joined fact relation — has regressed.
    *
    * Planned at sf0.1 (the artifact's scale) but never executed.
    * sf0.001 would pin nothing: its single-partition scans satisfy
    * every required distribution trivially, so EnsureRequirements
    * plans no Exchange at all there. The sweep reads the FORMATTED
    * explain (same surface the artifact commits) because the plain
    * `executedPlan` of an un-run AQE query is the pre-EnsureRequirements
    * input plan, which never contains exchanges.
    */
  test("q_top_customers: exactly 2 shuffles (pre-agg + final customer agg)") {
    val fmt = Joins.qTopCustomers.run(spark, "/root/testdata/sf0.1")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // detail-section headers, one per node: "(4) Exchange"
    val shuffles = """(?m)^\(\d+\) Exchange\s*$""".r.findAllIn(fmt).size
    assert(shuffles == 2,
      s"expected 2 shuffle Exchanges in the formatted plan, got $shuffles:\n$fmt")
    assert(fmt.contains("hashpartitioning(l_orderkey"),
      s"no l_orderkey pre-aggregate shuffle:\n$fmt")
    assert(fmt.contains("hashpartitioning(c_custkey"),
      s"no per-customer aggregate shuffle:\n$fmt")
  }

  /** The PageRank adaptive-threshold seam (same design as
    * connectedComponents' local union-find): below the raw-pair
    * threshold the power iteration runs on the driver with the exact
    * integer recurrence, so both paths must return BIT-EQUAL rows.
    * Exercised on a graph with a hub, a chain, a triangle with a
    * self-loop, and duplicate/reversed pairs — the shapes where an
    * adjacency or degree mistake would diverge.
    */
  /** Build-attribution seconds are EXCLUSIVE of nested stage builds:
    * when a parent view's builder triggers a child ensureCached
    * (cc_comp_v → dpairs_v in the real catalog), the child's cost must
    * appear only on the child's line — otherwise per-view seconds
    * double-count shared parents (the r9 "15 s cc_comp_v" was ~13 s of
    * nested dpairs_v). The child's build sleeps a full second; the
    * parent does no work of its own beyond the materializing count, so
    * inclusive timing would report ≥1 s for BOTH lines.
    */
  test("StageViews attribution: parent build excludes nested child time") {
    import spark.implicits._
    StageViews.enableBuildAttribution(() => "spec_query")
    try {
      StageViews.ensureCached(spark, "r9_attr_parent_v", "k") {
        val child = StageViews.ensureCached(spark, "r9_attr_child_v", "k") {
          Thread.sleep(1000) // stand-in for a heavy child materialization
          Seq(1, 2, 3).toDF("x")
        }
        child.select($"x" + 1 as "y")
      }
      val log = StageViews.buildLog.map(b => b.view -> b.sec).toMap
      assert(log.keySet == Set("r9_attr_child_v", "r9_attr_parent_v"), s"log=$log")
      assert(log("r9_attr_child_v") >= 1.0, s"child should carry its sleep: $log")
      assert(log("r9_attr_parent_v") < 0.9,
        s"parent must be exclusive of the child's 1 s build: $log")
    } finally {
      StageViews.disableBuildAttribution()
      StageViews.unpersistAll(spark)
    }
  }

  /** The BPE-ish tokenizer's foundation: the pretokenizer regex is a
    * PARTITION of the text — concatenating the extracted pretokens
    * rebuilds the body exactly (GPT-2's pretokenizer has the same
    * property; it's what makes per-class counts additive). Tested over
    * the real corpus WITH the planted digit/punctuation suffixes, via
    * the same shared pattern/body constants the query template uses.
    */
  test("q_text_tokens_bpe: pretokenization is lossless; classes add up") {
    StageViews.documents(spark, dir)
    val bad = spark.sql(s"""
WITH planted AS (SELECT doc_id, ${TextAnalysis.BpePlantedBody} AS body FROM documents)
SELECT count(*) AS n FROM planted
WHERE concat_ws('', regexp_extract_all(body, '${TextAnalysis.BpePretokenPattern}', 0)) <> body""")
      .head().getLong(0)
    assert(bad == 0, s"$bad documents do not re-concatenate losslessly")
    val rows = TextAnalysis.qTokensBpe.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pre, sub, w, num, other) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(pre == w + num + other, s"classes don't partition: $r")
      assert(sub >= pre, s"pieces below pretokens: $r")
      assert(num >= 1 && other >= 1, s"planted digits/punct not found: $r")
    }
  }

  /** The winnowing guarantee (Schleimer et al. §3): two documents
    * sharing a substring of length ≥ k + w − 1 (= 11 here) share at
    * least one selected fingerprint — any window of k-gram positions
    * fully inside the shared region has identical hashes in both docs,
    * so both select its minimum. Conversely, docs sharing no 8-char
    * substring share no fingerprint (md5 collisions aside).
    */
  test("winnowing: shared substring ⇒ shared fingerprint; disjoint ⇒ none") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over"
    val docA = s"aaa bbb ccc $shared ddd eee fff"
    val docB = s"gg hh kk ll mm nn $shared tt"
    val docC = "0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9" // digit-only: no 8-gram shared with A
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprintsOn(spark, "winnow_spec", docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sets = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((sets(1L) & sets(2L)).nonEmpty,
      s"30-char shared substring produced no shared fingerprint: $sets")
    assert((sets(1L) & sets(3L)).isEmpty,
      s"8-gram-disjoint docs share a fingerprint: $sets")
  }

  /** Edit-distance verify over the LSH candidate stage: a one-word
    * substitution stays a verified dup (tiny Levenshtein on the shared
    * prefix), while swapping the document's halves — which PRESERVES
    * most of the shingle set (both halves' interiors survive), so the
    * banded candidate join still emits the pair — fails the
    * edit-distance verdict, because the prefixes now differ completely.
    * That divergence (bag-of-shingles similar, character stream not) is
    * exactly what this verify metric adds over Jaccard.
    */
  test("q_dedup_edit_distance: word-swap dup passes, half-swap fails") {
    import spark.implicits._
    // halves drawn from disjoint character material, so the half-swap's
    // prefixes are character-level FAR apart (same-prefix words like
    // "word1..word60" would keep the Levenshtein small and mask the law)
    val words = (1 to 30).map(i => s"alpha$i") ++ (31 to 60).map(i => s"zulu$i")
    val base = words.mkString(" ")
    val oneSub = words.updated(29, "qqqqq").mkString(" ")
    val halfSwap = (words.drop(30) ++ words.take(30)).mkString(" ")
    val docs = Seq((1L, base), (2L, oneSub), (3L, halfSwap)).toDF("doc_id", "text")
    val out = Dedup.editDistOn(spark, "editdist_spec", docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(4))).toMap
    assert(out.contains((1L, 2L)), s"one-word-sub pair not a candidate: $out")
    assert(out((1L, 2L)), s"one-word substitution should verify as dup: $out")
    assert(out.contains((1L, 3L)), s"half-swap pair not a candidate: $out")
    assert(!out((1L, 3L)), s"half-swap must fail the prefix edit-distance verdict: $out")
  }

  /** LSH ANN retrieval law: an identical planted vector shares every
    * table's bucket with its source (signs equal ⇒ words equal ⇒
    * buckets equal — no hashing luck involved), so it MUST surface, and
    * at rank 1 (cosine exactly 1 beats every other candidate; rank ties
    * broken by id keep the outcome deterministic).
    */
  test("q_ann_lsh: planted identical vector is retrieved at rank 1") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, dir)
    val dup = emb.where(col("vec_id") === 3)
      .withColumn("vec_id", lit(100000L))
    val topk = Similarity.lshOn(spark, "lsh_spec_plant", emb.unionByName(dup))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(topk.contains((3L, 1L, 100000L)),
      s"identical vector not at rank 1 for query 3: ${topk.filter(_._1 == 3L).toSeq}")
  }

  /** The adaptive-modulus law for the LSH tables: the power-of-two
    * modulus must grow with the corpus so expected bucket occupancy
    * stays ≤ [[Similarity.LshTargetBucket]] (the ScaleSmoke stage
    * asserts the resulting log-growth of probed candidates end-to-end).
    */
  test("LSH modulus tracks corpus size") {
    // sf0.01 (200 vectors) sits at the 2³ modulus floor; sf0.1 (2000)
    // must push past it — sf0.001 vs sf0.01 would BOTH floor at 8
    val e1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val e2 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val m1 = Similarity.lshModulusOn(spark, "lsh_spec_m1", e1)
    val m2 = Similarity.lshModulusOn(spark, "lsh_spec_m2", e2)
    val n1 = e1.count(); val n2 = e2.count()
    assert(m1 * 128 >= n1 && m2 * 128 >= n2, s"occupancy target violated: $m1/$n1 $m2/$n2")
    assert(m2 > m1, s"modulus did not grow with the corpus: m1=$m1 m2=$m2")
    assert(m1 * 128 < 2 * n1 || m1 == 8, s"modulus overshoots (not minimal): m1=$m1 n1=$n1")
  }

  /** Embedding cluster law: the catalog corpus doubles itself with
    * IdShift-ed exact copies, so every vector's twin has cosine exactly
    * 1 and MUST land in the same cluster (same sign word ⇒ same bucket
    * ⇒ candidate pair ⇒ verified ⇒ one component). Reps are minimal
    * ids by the CC contract.
    */
  test("q_dedup_embedding_clusters: twins share a cluster, reps are minimal") {
    val rows = Dedup.qEmbedClusters.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.size / 2
    assert(n > 0)
    (0 until n).foreach { i =>
      assert(rows(i.toLong) == rows(i + 10000000L), s"twin $i diverged")
    }
    rows.foreach { case (v, r) => assert(r <= v, s"rep $r above member $v") }
  }

  test("pageRankInt: local and distributed paths are bit-equal") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), // hub
      (5L, 6L), (6L, 7L),                     // chain
      (8L, 9L), (9L, 10L), (10L, 8L),         // triangle
      (8L, 8L),                               // self-loop
      (2L, 1L), (1L, 2L)                      // reversed + duplicate pair
    ).toDF("u", "v")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("id", "degree", "rank_micros").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val local = rows(Graph.pageRankInt(pairs, 5))
    val dist = rows(Graph.pageRankInt(pairs, 5, localThreshold = 0L))
    assert(local == dist, s"local=$local\ndist=$dist")
  }
}
