package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan hygiene: no query may ever plan a
  * CartesianProduct — every intentional cross join in the engine is a
  * 1-row or bounded broadcast (BroadcastNestedLoopJoin), and a
  * CartesianProduct appearing instead means a join lost its condition
  * or its broadcast and would be quadratic at scale. Planning is lazy,
  * so most queries are swept without executing; the action-driven ones
  * (ML training, file roundtrips, iterative CC/PageRank) are RUN at
  * sf0.001 and their returned plan swept, with the lineage-truncated
  * iterated rounds asserted on the factored one-round builders, and
  * streaming restatements asserted on their batch-equivalent chain.
  */
class PlanHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  /** Queries whose run() performs actions (writes, stream execution,
    * model fits, iterative graph loops, driver-side samples) — planning
    * them here would re-run real work, not just plan it.
    */
  private val actionDriven: Set[String] = Set(
    "q_csv_roundtrip", "q_json_roundtrip", "q_orc_roundtrip",
    "q_parquet_zstd_roundtrip", "q_schema_merge", "q_partitioned_scan",
    "q_rf_train_score", "q_rf_pretrained_score", "q_rf_compiled_score",
    "q_gbt_train_score", "q_dedup_clusters", "q_corpus_build",
    "q_pagerank_dup", "q_split_leakage_safe", "q_dedup_stream_exact",
    "q_bucketed_join")

  private def assertClean(name: String,
      df: => org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"$name planned a CartesianProduct — a join lost its " +
        "condition or broadcast")
  }

  graft.SparkEntry.catalog
    .filterNot(q => actionDriven(q.name)
      || q.name.contains("stream") || q.name.startsWith("q_tws"))
    .foreach { q =>
      test(s"${q.name}: no CartesianProduct in the physical plan") {
        assertClean(q.name, q.run(spark, dir))
      }
    }

  // ---- the action-driven exclusions, swept anyway ----
  //
  // Their run() executes real work (writes, model fits, iterative
  // loops), but at sf0.001 that work is trivial and the RETURNED
  // DataFrame is still lazily planned — so the final-stage plan gets
  // the same sweep. The parts a run() plan can no longer show (each
  // CC / PageRank round localCheckpoints, truncating lineage) are
  // asserted separately on the factored one-round builders below.
  graft.SparkEntry.catalog
    .filter(q => actionDriven(q.name) && !q.name.contains("stream"))
    .foreach { q =>
      test(s"${q.name}: no CartesianProduct (action-driven, sf0.001 run)") {
        assertClean(q.name, q.run(spark, dir))
      }
    }

  // ---- unpartitioned-window boundedness ----
  //
  // "WARN WindowExec: No Partition Defined for Window operation" is
  // benign ONLY when the window's input is provably bounded — a global
  // window over an unbounded relation serializes the whole dataset
  // through one task at scale. Rounds 6-8 re-audited each warning by
  // hand; this sweep encodes the audit: an unpartitioned WindowExec
  // must sit above a Limit/TakeOrdered in its child subtree, or the
  // query must be whitelisted HERE with the bounding argument.

  /** name -> why every unpartitioned window in that query's plan reads
    * a bounded relation. Adding a NEW unbounded global window to a
    * whitelisted query still fails nothing — keep justifications
    * specific enough that a reviewer can re-check them.
    */
  private val boundedWindowJustification: Map[String, String] = Map(
    "q_wow_delta" ->
      ("the unpartitioned lag reads the per-epoch-week HashAggregate output — " +
        "one row per calendar week with at least one order. The input is " +
        "bounded by the CALENDAR (~365 rows for the 7-year TPC-H date span, " +
        "~5k rows for a century), not by order count; the reduce below it is " +
        "map-side combinable and sees all the data."),
    "q_pareto_front" ->
      ("the unpartitioned running-max reads the per-price-point skyline cells " +
        "(one row per distinct cents value after the same-price max-date " +
        "reduce) — bounded by the PRICE DOMAIN (<= ~10^7 distinct cents for " +
        "any realistic price range), not by order count. The two reduces " +
        "below it are map-side combinable; a range-partitioned two-phase " +
        "prefix-max (Packing.scala's pattern) is the documented fallback if " +
        "the value domain ever widens."),
    "q_sequence_pack" ->
      ("phase-2 of the two-phase distributed prefix sum (Packing.scala): the " +
        "unpartitioned running sum reads ONE ROW PER 1024-DOC BUCKET (child is " +
        "the per-bucket HashAggregate), a 1024x reduction vs the input — 10^11 " +
        "docs -> 10^8 two-long rows (~1.6 GB) through the single task, vs 10^11 " +
        "rows for the naive one-window spelling. Bounded relative to input by " +
        "construction; phase 1 (the per-row scatter) is fully partitioned."),
    "q_peak_concurrency" ->
      ("phase-2 of the two-phase distributed prefix sum (same shape as " +
        "q_sequence_pack): the unpartitioned running sum reads ONE ROW PER " +
        "CALENDAR DAY (child is the per-day_idx HashAggregate of endpoint " +
        "deltas) — bounded by the calendar (~365/year), not by session or " +
        "event count. Phase 1 (the within-day running sum) is partitioned " +
        "on day_idx."),
    "q_new_vs_returning" ->
      ("the unpartitioned running sum reads the per-day dau/new_users join " +
        "output — one row per calendar day with activity, the q_wow_delta " +
        "calendar-bounded argument. Everything below it is user-day-sized " +
        "combinable aggregation."),
    "q_spend_deciles" ->
      ("the unpartitioned exclusive prefix sum reads the per-cents-value " +
        "histogram (HashAggregate keyed by the exact cent amount) — bounded " +
        "by the PRICE DOMAIN (<= ~10^7 distinct cents for any realistic " +
        "amount range), the q_pareto_front argument. The per-customer rank " +
        "itself is the partitioned tie window plus this broadcast prefix — " +
        "no per-customer global window anywhere."),
    "q_daily_coverage" ->
      ("same shape as q_peak_concurrency: the unpartitioned window is " +
        "phase-2 of the two-phase prefix sum over per-day delta totals — " +
        "one row per calendar day (the day spine is exploded from a 1-row " +
        "min/max bound), never session- or event-sized."),
    "q_rfm_segments" ->
      ("three unpartitioned exclusive prefix sums, one per RFM axis, each " +
        "over that axis's value HISTOGRAM (HashAggregate keyed by the " +
        "value): recency days are calendar-bounded, order counts are " +
        "per-customer-activity-bounded, cents are price-domain-bounded — " +
        "the q_spend_deciles argument three times over; per-customer ranks " +
        "come from the partitioned tie windows."),
    "q_corpus_mix" ->
      ("the unpartitioned window computes corpus-level shares over the output " +
        "of HashAggregate(keys=[lang]) — one row per distinct language. " +
        "Language cardinality is a data-model constant (O(100) even for a " +
        "100-TB multilingual corpus), not a function of corpus size.") ,
    "q_corpus_unimax" ->
      ("every unpartitioned window (the cap-ascending rank, the cap cumsum, " +
        "and the corpus totals) runs over the output of " +
        "HashAggregate(keys=[lang]) — one row per distinct language, the " +
        "q_corpus_mix cardinality argument. The data-sized work is the one " +
        "map-side-combinable token-count aggregate below them; the UniMax " +
        "closed form itself is source-count-sized by construction."),
    "q_corpus_temperature" ->
      ("every unpartitioned window (the corpus totals, the Hamilton " +
        "largest-remainder rank) runs over the output of " +
        "HashAggregate(keys=[lang]) — one row per distinct language, the " +
        "q_corpus_mix cardinality argument; the data-sized work is the one " +
        "map-side-combinable token-count aggregate below them."),
    "q_mg_est_error" ->
      ("the unpartitioned window reads the exact-counts FULL OUTER summary " +
        "join — at most |lang domain| + m rows (the q_corpus_mix language " +
        "argument plus the sketch's hard capacity), never corpus-sized; " +
        "both inputs below it are map-side-combinable aggregates."),
    "q_qdigest_quantiles" ->
      ("the unpartitioned post-order cumsum reads the DIGEST NODE relation — " +
        "≤ 4k nodes after compression (the sketch's hard size bound, " +
        "property-tested), or ≤ distinct clamped cents ≤ 2^20 in the " +
        "t = 0 exact regime — bounded by sketch capacity and value " +
        "universe, never by event count."),
    "q_qdigest_est_error" ->
      ("two bounded unpartitioned windows: the digest post-order cumsum " +
        "(≤ 4k sketch nodes, the q_qdigest_quantiles argument) and the " +
        "exact-rank audit's cents-histogram cumsum — keyed by the clamped " +
        "cent value, ≤ 2^20 rows whatever N, the q_spend_deciles " +
        "price-domain argument."),
    "q_window_threat_screen" ->
      ("the unpartitioned trailing-baseline frame reads the per-WINDOW " +
        "stats relation — one row per observed hour window (wall-clock " +
        "bounded, the q_daily_coverage day-spine argument), after both " +
        "data-sized aggregations have already collapsed packets to " +
        "(window, src) and (window, length) counts; never packet-sized.")
  )

  private def stripAqe(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.inputPlan
    case other => other
  }

  private def hasLimitBelow(p: SparkPlan): Boolean = p.exists {
    case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => true
    case _ => false
  }

  private def unboundedWindows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] =
    stripAqe(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !hasLimitBelow(w.child) => w
    }

  test("window-sweep canary: the detector flags a real unbounded global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // unbounded: row_number over the whole relation, no partition, no limit
    assert(unboundedWindows(
      docs.withColumn("rn", row_number().over(Window.orderBy("doc_id")))).nonEmpty,
      "detector missed a global window over an unbounded scan — sweep is blind")
    // bounded: same window above a LIMIT must pass
    assert(unboundedWindows(
      docs.limit(100).withColumn("rn", row_number().over(Window.orderBy("doc_id")))).isEmpty)
  }

  graft.SparkEntry.catalog
    .filterNot(q => q.name.contains("stream") || q.name.startsWith("q_tws"))
    .foreach { q =>
      test(s"${q.name}: every unpartitioned window is bounded or justified") {
        val unbounded = unboundedWindows(q.run(spark, dir))
        assert(unbounded.isEmpty || boundedWindowJustification.contains(q.name),
          s"${q.name} has ${unbounded.size} unpartitioned window(s) with no " +
            "Limit/TakeOrdered below and no whitelist justification:\n" +
            unbounded.map(_.simpleString(3)).mkString("\n"))
      }
    }

  test("CC iterated round (large-star ∘ small-star): no CartesianProduct") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 1L)).toDF("u", "v")
    assertClean("ccRound", Graph.ccRound(edges))
  }

  test("PageRank iterated round: no CartesianProduct") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 2L), (2L, 1L, 1L), (2L, 3L, 2L)).toDF("u", "v", "d")
    val ranks = Seq((1L, 1000000L), (2L, 1000000L), (3L, 1000000L)).toDF("id", "r")
    assertClean("prRound", Graph.prRound(edges, ranks))
  }

  test("q_dedup_stream_exact inner chain (batch restatement): no CartesianProduct") {
    // The streaming query's per-batch plan can't be swept lazily; its
    // logical chain (select → dropDuplicates → agg) restated over a
    // batch read covers the same operator shape.
    import org.apache.spark.sql.functions._
    assertClean("q_dedup_stream_exact",
      spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("source", "md5(text) AS h")
        .dropDuplicates("source", "h")
        .groupBy("source").agg(count(lit(1)).as("n_distinct_texts")))
  }
}
