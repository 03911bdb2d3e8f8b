package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves min/max data skipping responds to LAYOUT: the same selective
  * predicate over the same rows reads far less when the table was
  * written range-partitioned + sorted on the filter column (each file's
  * parquet footer then bounds a narrow key range, so non-matching files
  * contribute zero rows) than when written key-randomly. This is the
  * sort-on-write / clustering decision that turns a 100 TB point query
  * from a full scan into a handful of row groups — partition pruning's
  * finer-grained sibling (PartitionedScanSpec covers the directory
  * level).
  */
class LayoutSkippingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rowsReadByScan(df: DataFrame): Long = {
    df.collect()
    var n = 0L
    df.queryExecution.executedPlan.foreach {
      case s: FileSourceScanExec => n += s.metrics("numOutputRows").value
      case _ =>
    }
    n
  }

  test("range-sorted layout reads a fraction of the key-random layout") {
    val tmp = System.getProperty("java.io.tmpdir")
    val (sorted, shuffled) = (s"$tmp/graft_layout_sorted", s"$tmp/graft_layout_random")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "user_id", "event_type")
    ev.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sorted)
    ev.repartition(8, col("event_id")) // key-random w.r.t. user_id
      .write.mode("overwrite").parquet(shuffled)

    def q(path: String) =
      spark.read.parquet(path).where(col("user_id") === 5)

    // same answer either way...
    assert(q(sorted).count() == q(shuffled).count())
    val readSorted = rowsReadByScan(q(sorted))
    val readRandom = rowsReadByScan(q(shuffled))
    // ...but the sorted layout's footer stats confine the read to the
    // one file covering user 5's range
    assert(readSorted * 4 <= readRandom,
      s"sorted layout read $readSorted rows vs $readRandom — no skipping happened")
  }
}
