package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan hygiene: no query may ever plan a
  * CartesianProduct — every intentional cross join in the engine is a
  * 1-row or bounded broadcast (BroadcastNestedLoopJoin), and a
  * CartesianProduct appearing instead means a join lost its condition
  * or its broadcast and would be quadratic at scale. Planning is lazy,
  * so this sweeps every query whose `run` doesn't execute internal
  * actions; the action-driven ones (streaming restatements, ML
  * training, file roundtrips, iterative CC/PageRank) are exercised by
  * Verify/EmptyCorpus instead — their inner DataFrames go through the
  * same builders checked here.
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

  graft.SparkEntry.catalog
    .filterNot(q => actionDriven(q.name)
      || q.name.contains("stream") || q.name.startsWith("q_tws"))
    .foreach { q =>
      test(s"${q.name}: no CartesianProduct in the physical plan") {
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"${q.name} planned a CartesianProduct — a join lost its " +
            "condition or broadcast")
      }
    }
}
