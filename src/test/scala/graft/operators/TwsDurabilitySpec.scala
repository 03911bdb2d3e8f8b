package graft.operators

import graft.operators.StatefulTotals.{RunningTotalsProcessor, TwsEvent, TwsTotals}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.apache.spark.sql.{Dataset, Encoders}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** `transformWithState` durability: the RocksDB ValueState behind the
  * running-totals operator must survive a full query RESTART from
  * checkpoint — a fresh query object, same checkpoint location — and
  * resume per-key accumulation rather than restarting from zero.
  * StateDurabilitySpec pins this contract for the
  * flatMapGroupsWithState featurizer; this spec pins it for the Spark
  * 4.1 API the tws family runs on (snapshot + changelog restore is a
  * different code path from the HDFS-backed store). Quiet keys must
  * NOT re-emit after restart (update mode emits active keys only), so
  * recovery is observable as continued totals, not replay.
  */
class TwsDurabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeBatch(dir: String, name: String,
      rows: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "ts_us", "cents")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def runOnce(src: String, ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema("user_id BIGINT, ts_us BIGINT, cents BIGINT")
      .parquet(src)
      .as[TwsEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update(), Encoders.product[TwsTotals])
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[TwsTotals], id: Long) =>
        if (!batch.isEmpty)
          batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def readOut(outDir: String) = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    assert(dirs.nonEmpty, s"no batches written under $outDir")
    spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("cents_sum"),
          r.getAs[Long]("first_ts_us"), r.getAs[Long]("last_ts_us"))).toMap
  }

  test("ValueState resumes across a query restart from checkpoint") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("tws_src").toString
      val ckpt = Files.createTempDirectory("tws_ckpt").toString
      val out1 = Files.createTempDirectory("tws_out1").toString
      val out2 = Files.createTempDirectory("tws_out2").toString
      // run 1: user 1 x3, user 2 x1
      writeBatch(src, "b1", Seq(
        (1L, 1000L, 10L), (1L, 2000L, 20L), (1L, 3000L, 30L),
        (2L, 1500L, 5L)))
      runOnce(src, ckpt, out1)
      val r1 = readOut(out1)
      assert(r1(1L) == ((3L, 60L, 1000L, 3000L)))
      assert(r1(2L) == ((1L, 5L, 1500L, 1500L)))
      // run 2, FRESH query, same checkpoint: user 1 x2 more, user 3 new
      writeBatch(src, "b2", Seq(
        (1L, 4000L, 40L), (1L, 5000L, 50L), (3L, 100L, 7L)))
      runOnce(src, ckpt, out2)
      val r2 = readOut(out2)
      // cumulative across the restart, first_ts from run 1's state
      assert(r2(1L) == ((5L, 150L, 1000L, 5000L)),
        "restart must resume run-1 state, not restart totals")
      assert(r2(3L) == ((1L, 7L, 100L, 100L)))
      // quiet key: no replay under update mode
      assert(!r2.contains(2L), "user 2 was inactive in run 2 and must not re-emit")
    }
  }
}
