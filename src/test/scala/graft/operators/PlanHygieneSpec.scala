package graft.operators

import org.apache.spark.sql.SparkSession
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
    "q_pagerank_dup", "q_split_leakage_safe", "q_dedup_stream_exact")

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
