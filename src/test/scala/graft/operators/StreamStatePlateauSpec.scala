package graft.operators

import graft.operators.HllStream.{DistinctSourcesProcessor, HsEmit, HsRow}
import graft.operators.MgStream.{MgEmit, MgRow, TopTalkersProcessor}
import graft.operators.QdStream.{QdEmit, QdRow, WindowQuantileProcessor}
import graft.operators.ThreatScreenStream.{ScreenEmit, ScreenProcessor, SRow}
import org.apache.spark.sql.{Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Long-horizon state PLATEAU for every in-stream windowed processor
  * (r15 VERDICT task 4). [[StreamStateGcSpec]] proves the GC mechanism
  * at 2 windows; the 100 TB claim is stronger — "on a multi-week
  * stream, state is O(open windows × salts) FOREVER, not O(windows
  * ever seen)" — and this spec measures it the direct way: it replays
  * a few hundred 1 s windows in several chunks (each chunk one
  * AvailableNow run against the same checkpoint, the production
  * restart pattern), reads the checkpoint's state store BETWEEN
  * chunks, and asserts that
  *
  *  - the state-store key set after every chunk is exactly the one
  *    still-open window (the chunk's last — its close timer sits past
  *    the watermark), i.e. the plateau never grows with stream length,
  *    while
  *  - emissions keep growing chunk over chunk (every closed window's
  *    result was delivered before its state was freed).
  *
  * Grid: window w spans [w·1000, (w+1)·1000) ms; every row for w
  * carries ts = w·1000 + 500; watermark delay 0 s. After a chunk
  * ending at window L the watermark is L·1000+500, so close timers
  * (w+1)·1000 ≤ L·1000 have all fired (windows < L cleared in the
  * trailing no-data batch) and window L alone survives — including
  * across the chunk boundary, where the NEXT run's data batch must not
  * resurrect anything.
  */
class StreamStatePlateauSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Chunks = 4
  private val WinsPerChunk = 75 // 300 windows total

  private def chunkWins(c: Int): Range =
    (c * WinsPerChunk) until ((c + 1) * WinsPerChunk)

  private def lastWin(c: Int): Long = chunkWins(c).last.toLong

  /** One parquet file per chunk so the file source sees exactly one
    * new file per run (the StreamStateGcSpec/MgStreamDurabilitySpec
    * recipe).
    */
  private def writeChunk(dir: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    df.withColumn("ts", timestamp_millis($"ts_ms")).drop("ts_ms")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def stateWins(ckpt: String, stateVar: String): Set[Long] =
    spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", stateVar)
      .load()
      .select("key.*")
      .collect().map(_.getLong(0)).toSet

  private def emittedWins(outDir: String): Set[Long] = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    if (dirs.isEmpty) Set.empty
    else spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("win").collect().map(_.getLong(0)).toSet
  }

  /** Drive `chunks` runs of `runOnce` over per-chunk sources, asserting
    * the plateau between every pair and the per-chunk emission law.
    * `expectEmitted(c)` is the window set chunk c must emit.
    */
  private def soak(tag: String, stateVar: String,
      writeFor: (String, String, Range) => Unit,
      runOnce: (String, String, String) => Unit,
      expectEmitted: Int => Set[Long]): Unit = {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory(s"plateau_${tag}_src").toString
      val ckpt = Files.createTempDirectory(s"plateau_${tag}_ckpt").toString
      val outs = (0 until Chunks).map(_ =>
        Files.createTempDirectory(s"plateau_${tag}_out").toString)
      (0 until Chunks).foreach { c =>
        writeFor(src, s"b$c", chunkWins(c))
        runOnce(src, ckpt, outs(c))
        val wins = stateWins(ckpt, stateVar)
        assert(wins == Set(lastWin(c)),
          s"$tag after chunk $c: state must plateau at the one open window " +
            s"${lastWin(c)}, not ${wins.size} keys (${wins.toSeq.sorted.take(8)}…)")
        assert(emittedWins(outs(c)) == expectEmitted(c),
          s"$tag chunk $c emitted the wrong window set")
      }
      val cumulative = outs.map(emittedWins).reduce(_ ++ _)
      assert(cumulative.size >= Chunks * WinsPerChunk - 1,
        s"$tag: emissions must keep growing while state plateaus — " +
          s"saw ${cumulative.size} of ${Chunks * WinsPerChunk} windows")
    }
  }

  // ---- triad: emit-per-data-batch, timers only GC ----
  // every window of the chunk emits in the chunk's own data batch

  test("MG top talkers: 300-window soak, state plateaus at 1 open window") {
    soak("mg", "mg",
      writeFor = (src, name, wins) => writeChunk(src, name,
        wins.flatMap(w => Seq(
          (w.toLong, 0, "a", w * 1000L + 500),
          (w.toLong, 0, s"k${w % 7}", w * 1000L + 500)))
          .toDF("win", "salt", "k", "ts_ms")),
      runOnce = (src, ckpt, out) => {
        val q = spark.readStream
          .schema("win BIGINT, salt INT, k STRING, ts TIMESTAMP")
          .parquet(src)
          .withWatermark("ts", "0 seconds")
          .select($"win", $"salt", $"k").as[MgRow]
          .groupByKey(r => (r.win, r.salt))
          .transformWithState(new TopTalkersProcessor(16, winMs = 1000L),
            TimeMode.EventTime(), OutputMode.Update(), Encoders.product[MgEmit])
          .writeStream.outputMode(OutputMode.Update())
          .foreachBatch { (batch: Dataset[MgEmit], id: Long) =>
            if (!batch.isEmpty)
              batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$out/batch=$id")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      },
      expectEmitted = c => chunkWins(c).map(_.toLong).toSet)
  }

  test("q-digest quantiles: 300-window soak, state plateaus at 1 open window") {
    soak("qd", "qd",
      writeFor = (src, name, wins) => writeChunk(src, name,
        wins.flatMap(w => Seq(
          (w.toLong, 0, 40L + w % 13, w * 1000L + 500),
          (w.toLong, 0, 60L, w * 1000L + 500)))
          .toDF("win", "salt", "v", "ts_ms")),
      runOnce = (src, ckpt, out) => {
        val q = spark.readStream
          .schema("win BIGINT, salt INT, v BIGINT, ts TIMESTAMP")
          .parquet(src)
          .withWatermark("ts", "0 seconds")
          .select($"win", $"salt", $"v").as[QdRow]
          .groupByKey(r => (r.win, r.salt))
          .transformWithState(new WindowQuantileProcessor(64, winMs = 1000L),
            TimeMode.EventTime(), OutputMode.Update(), Encoders.product[QdEmit])
          .writeStream.outputMode(OutputMode.Update())
          .foreachBatch { (batch: Dataset[QdEmit], id: Long) =>
            if (!batch.isEmpty)
              batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$out/batch=$id")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      },
      expectEmitted = c => chunkWins(c).map(_.toLong).toSet)
  }

  test("HLL distinct sources: 300-window soak, state plateaus at 1 open window") {
    soak("hs", "hs",
      writeFor = (src, name, wins) => writeChunk(src, name,
        wins.flatMap(w => Seq(
          (w.toLong, 0, s"src${w % 5}", w * 1000L + 500),
          (w.toLong, 0, "src9", w * 1000L + 500)))
          .toDF("win", "salt", "k", "ts_ms")),
      runOnce = (src, ckpt, out) => {
        val q = spark.readStream
          .schema("win BIGINT, salt INT, k STRING, ts TIMESTAMP")
          .parquet(src)
          .withWatermark("ts", "0 seconds")
          .select($"win", $"salt", $"k").as[HsRow]
          .groupByKey(r => (r.win, r.salt))
          .transformWithState(new DistinctSourcesProcessor(12, winMs = 1000L),
            TimeMode.EventTime(), OutputMode.Update(), Encoders.product[HsEmit])
          .writeStream.outputMode(OutputMode.Update())
          .foreachBatch { (batch: Dataset[HsEmit], id: Long) =>
            if (!batch.isEmpty)
              batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$out/batch=$id")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      },
      expectEmitted = c => chunkWins(c).map(_.toLong).toSet)
  }

  // ---- threat screen: final-on-close — a window emits in the chunk
  // whose watermark closes it, so chunk c delivers [L_{c-1}, L_c - 1]
  // (chunk 0: [0, L_0 - 1]); the final chunk's last window correctly
  // never emits (still open at end-of-stream)

  test("threat screen: 300-window soak, final-on-close, state plateaus") {
    soak("scr", "scr",
      writeFor = (src, name, wins) => writeChunk(src, name,
        wins.flatMap(w => Seq(
          (w.toLong, 0, s"src${w % 5}", 40L + w % 13, w * 1000L + 500),
          (w.toLong, 0, "src9", 60L, w * 1000L + 500)))
          .toDF("win", "salt", "src", "len", "ts_ms")),
      runOnce = (src, ckpt, out) => {
        val q = spark.readStream
          .schema("win BIGINT, salt INT, src STRING, len BIGINT, ts TIMESTAMP")
          .parquet(src)
          .withWatermark("ts", "0 seconds")
          .select($"win", $"salt", $"src", $"len").as[SRow]
          .groupByKey(r => (r.win, r.salt))
          .transformWithState(new ScreenProcessor(16, 64, 12, winMs = 1000L),
            TimeMode.EventTime(), OutputMode.Update(), Encoders.product[ScreenEmit])
          .writeStream.outputMode(OutputMode.Update())
          .foreachBatch { (batch: Dataset[ScreenEmit], id: Long) =>
            if (!batch.isEmpty)
              batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$out/batch=$id")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      },
      expectEmitted = c => {
        val from = if (c == 0) 0L else lastWin(c - 1)
        (from until lastWin(c)).toSet
      })
  }

  // ---- flow featurizer (A1, the reference's core operator): session
  // state keyed by FLOW, freed by ProcessingTimeTimeout + state.remove
  // rather than window-close timers (r16 VERDICT task 4). The soak
  // replays waves of distinct flows through one continuously-running
  // query with a short timeout and asserts, after each wave's
  // quiescence, that the state store returns to EXACTLY ZERO live
  // groups while the cumulative _TIMEOUT emissions keep growing — on
  // a multi-week stream, state is O(active flows), not O(flows ever
  // seen).

  test("flow featurizer: multi-wave soak, state returns to zero while _TIMEOUT rows grow") {
    import graft.flow.{FlowFeaturizer, PacketRow}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val Waves = 3
    val FlowsPerWave = 1000
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[PacketRow]
    val ckpt = Files.createTempDirectory("plateau_flow_ckpt").toString
    val sink = "plateau_flow_sink"
    // ProcessingTimeTimeout runs continuous timer-check micro-batches,
    // which livelocks processAllAvailable — poll the sink instead
    // (the FlowFeaturizerSpec recipe); timers fire without new input.
    val q = FlowFeaturizer.featurize(input.toDS(), timeoutMs = 500)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .start()
    def pollUntil(what: String, deadlineMs: Long = 60000)(done: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + deadlineMs
      while (!done && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(done, s"flow soak: timed out waiting for $what")
    }
    def liveGroups(): Long =
      spark.read.format("statestore").option("path", ckpt).load().count()
    try {
      (0 until Waves).foreach { w =>
        input.addData((0 until FlowsPerWave).map { i =>
          PacketRow(i.toLong, i.toLong, 6, 100,
            s"10.$w.${i / 256}.${i % 256}", "8.8.8.8", 10, 20,
            40, 0, 0, 1, 0, 0, 1, 0, 0, 0)
        })
        val want = (w + 1) * FlowsPerWave
        pollUntil(s"wave $w: $want timeout rows") {
          spark.table(sink).count() == want
        }
        // quiescence: every flow's timer fired, emitted, and REMOVED
        // its group — the store must return to zero, not plateau at
        // "flows ever seen" (the statestore reader sees the last
        // committed batch; poll across the commit race)
        pollUntil(s"wave $w: state store back to 0 groups") {
          liveGroups() == 0L
        }
        val rows = spark.table(sink).collect()
        assert(rows.length == want, s"wave $w: emissions must accumulate")
        assert(rows.forall(_.getString(0).endsWith("_TIMEOUT")),
          "every emission on the timeout-only path carries _TIMEOUT")
        assert(rows.map(_.getString(0)).distinct.length == want,
          "each flow times out exactly once (state removed, never resurrected)")
      }
    } finally q.stop()
  }
}
