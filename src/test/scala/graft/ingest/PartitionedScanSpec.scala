package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that the partitioned-layout query actually PRUNES: the
  * event_type filter must appear as a partition filter resolved at
  * planning time, and the scanned file set must shrink to the one
  * matching directory — scan-and-discard at 100 TB reads 5× the data.
  */
class PartitionedScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("partition filter prunes to one directory at planning time") {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_prune_spec"
    graft.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    val scan = spark.read.parquet(tmp).where(col("event_type") === "purchase")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    // the pushed partition filter names event_type; the data filter set
    // must NOT re-check it (that would mean scan-and-discard)
    assert(plan.matches("(?s).*PartitionFilters: \\[.*event_type.*\\].*"),
      s"event_type not in PartitionFilters:\n$plan")
    // pruned scan reads strictly fewer files than the full table
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    val all = filesRead(spark.read.parquet(tmp))
    val pruned = filesRead(scan)
    assert(pruned > 0 && pruned < all, s"pruned=$pruned all=$all")
    // and the pruned result is correct
    val n = scan.count()
    val expected = graft.Tables.events(spark, dir)
      .where(col("event_type") === "purchase").count()
    assert(n == expected)
  }
}
