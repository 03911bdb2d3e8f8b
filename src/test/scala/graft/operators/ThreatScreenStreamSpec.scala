package graft.operators

import graft.operators.ThreatScreenStream.{ScreenEmit, ScreenProcessor, SRow}
import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.{Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Lifecycle laws for the live threat screen: FINAL-ON-CLOSE emission
  * (data batches emit nothing; the close timer emits the finished
  * summary exactly once and clears the group; late rows neither emit
  * nor resurrect state) and the salt-merge report (MG disjoint union,
  * keywise length sum, HLL union inside the tolerance boolean, replay
  * guard).
  */
class ThreatScreenStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val WinMs = 1000L

  private def writeBatch(dir: String, name: String,
      rows: Seq[(Long, Int, String, Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("win", "salt", "src", "len", "ts_ms")
      .withColumn("ts", timestamp_millis($"ts_ms")).drop("ts_ms")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def runOnce(src: String, ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema("win BIGINT, salt INT, src STRING, len BIGINT, ts TIMESTAMP")
      .parquet(src)
      .withWatermark("ts", "0 seconds")
      .select($"win", $"salt", $"src", $"len").as[SRow]
      .groupByKey(r => (r.win, r.salt))
      .transformWithState(new ScreenProcessor(16, 64, 12, winMs = WinMs),
        TimeMode.EventTime(), OutputMode.Update(), Encoders.product[ScreenEmit])
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[ScreenEmit], id: Long) =>
        if (!batch.isEmpty)
          batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def readEmits(outDir: String): Seq[ScreenEmit] = {
    import spark.implicits._
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    if (dirs.isEmpty) Seq.empty
    else spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*)
      .as[ScreenEmit].collect().toSeq
  }

  private def stateWins(ckpt: String): Set[Long] =
    spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "scr")
      .load().select("key.*").collect().map(_.getLong(0)).toSet

  test("final-on-close: one emission per closed window, state cleared, late rows dropped") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("tscr_src").toString
      val ckpt = Files.createTempDirectory("tscr_ckpt").toString
      val out1 = Files.createTempDirectory("tscr_out1").toString
      val out2 = Files.createTempDirectory("tscr_out2").toString
      // window 1: a×2 (len 40), b×1 (len 100); window 9 holds the
      // watermark at 9500 ms — past window 1's close (2000), short of
      // its own (10000)
      writeBatch(src, "b1", Seq(
        (1L, 0, "a", 40L, 1100L), (1L, 0, "a", 40L, 1200L),
        (1L, 0, "b", 100L, 1300L), (9L, 0, "c", 64L, 9500L)))
      runOnce(src, ckpt, out1)
      val e1 = readEmits(out1)
      assert(e1.map(_.win) == Seq(1L),
        s"exactly the closed window emits (its timer fired); got ${e1.map(_.win)}")
      val e = e1.head
      assert(e.srcs.zip(e.srcCnts).toMap == Map("a" -> 2L, "b" -> 1L),
        "MG entries are the exact per-source counts in the exact regime")
      assert(e.lenVals.zip(e.lenCnts).toMap == Map(40L -> 2L, 100L -> 1L),
        "q-digest leaves are the exact length histogram")
      assert(HllSketch.heapify(e.hll).getEstimate.round == 2L)
      assert(e.n == 3L)
      assert(!stateWins(ckpt).contains(1L), "emitted group's state is freed")
      assert(stateWins(ckpt).contains(9L), "open window 9 persists")
      // run 2: a LATE row for window 1 — no emission, no resurrection
      writeBatch(src, "b2", Seq((1L, 0, "a", 40L, 1400L)))
      runOnce(src, ckpt, out2)
      assert(readEmits(out2).isEmpty,
        "a late row for an already-reported window must emit nothing")
      assert(!stateWins(ckpt).contains(1L))
    }
  }

  test("hitCap latches through the stream: eviction marks the emitted summary") {
    // cap is 16 in this harness: window 1 sees 20 DISTINCT sources —
    // the 17th update takes the global-decrement branch (all counts 1
    // -> every key drops), so the summary closes far UNDER capacity
    // but must still emit hitCap = true (r16 ADVICE: the final size
    // cannot reveal the hit). Window 2 sees exactly 16 distinct
    // sources — AT capacity but never evicted -> hitCap = false.
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("tscr_cap_src").toString
      val ckpt = Files.createTempDirectory("tscr_cap_ckpt").toString
      val out = Files.createTempDirectory("tscr_cap_out").toString
      val w1 = (0 until 20).map(i => (1L, 0, f"s$i%02d", 40L, 1100L + i))
      val w2 = (0 until 16).map(i => (2L, 0, f"t$i%02d", 40L, 2100L + i))
      writeBatch(src, "b1", w1 ++ w2 :+ ((9L, 0, "z", 64L, 9500L)))
      runOnce(src, ckpt, out)
      val byWin = readEmits(out).map(e => e.win -> e).toMap
      assert(byWin.keySet == Set(1L, 2L))
      assert(byWin(1L).hitCap, "20 distinct sources at cap 16: eviction fired")
      assert(byWin(1L).srcs.length < 16,
        "the degraded summary closes under capacity — the size-based " +
          "guard this flag replaced would have passed it silently")
      assert(!byWin(2L).hitCap,
        "exactly-at-cap with no eviction stays exact: no spurious flag")
      assert(byWin(2L).srcs.length == 16)
    }
  }

  test("report: salt groups merge losslessly; replayed emissions collapse") {
    import spark.implicits._
    def hllOf(keys: String*): Array[Byte] = {
      val sk = new HllSketch(ThreatScreenStream.LgK)
      keys.foreach(sk.update)
      sk.toCompactByteArray
    }
    // window 0 split across two salts: salt 0 has a×3/len 40×3,
    // salt 1 has b×1/len 100×1 — merged: 2 sources, 4 packets,
    // top a @ 7500 bp, p50 40, p99 100
    val e0 = ScreenEmit(0L, 0, Array("a"), Array(3L), Array(40L), Array(3L),
      hllOf("a"), 3L, hitCap = false)
    val e1 = ScreenEmit(0L, 1, Array("b"), Array(1L), Array(100L), Array(1L),
      hllOf("b"), 1L, hitCap = false)
    val out = ThreatScreenStream.screenReport(
      Seq(e0, e1, e1).toDS().toDF()) // e1 twice = a replayed batch
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_src") == 2L && r.getAs[Long]("n_pkts") == 4L)
    assert(r.getAs[String]("top_src") == "a")
    assert(r.getAs[Long]("top_share_bp") == 7500L)
    assert(r.getAs[Long]("p50_len") == 40L && r.getAs[Long]("p99_len") == 100L)
    assert(r.getAs[Boolean]("hll_within"),
      "HLL union across salts estimates the exact merged cardinality")
    assert(r.getAs[Boolean]("talker_dom") && !r.getAs[Boolean]("threat"))
  }
}
