package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Bucketing for co-located joins: both sides bucketed on the join key
  * join WITHOUT a shuffle — the plan-level proof of the technique that
  * turns repeated 100 TB fact-fact joins from shuffle-bound into local
  * merge work.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("bucket_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("join of two tables bucketed on the key plans with zero exchanges") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val ord = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        spark.table("li_bucketed")("l_orderkey") === spark.table("ord_bucketed")("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    // and it still computes the right thing
    val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
    assert(joined.count() == expected)
  }
}
