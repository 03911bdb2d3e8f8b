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
