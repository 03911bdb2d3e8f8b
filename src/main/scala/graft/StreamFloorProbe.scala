package graft

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** Streaming fixed-floor diagnostics: runs the named catalog queries
  * (default: the micro-batch-bound streaming family) with a
  * StreamingQueryListener attached and itemizes EVERY micro-batch —
  * batchId, input rows, and the durationMs breakdown
  * (addBatch/getBatch/planning/walCommit/state commit) — so "the
  * streaming queries cost ~2 s for tiny outputs" is attributable to
  * named phases instead of guessed at. Wall time per run is printed
  * alongside for the end-to-end floor (query start/stop overhead =
  * wall − Σ batch time).
  *
  * Usage: runMain graft.StreamFloorProbe <sfDir> [query...]
  *        runMain graft.StreamFloorProbe <sfDir> detection
  *
  * The `detection` mode (r17 VERDICT task 6) prices the reference's
  * HEADLINE path end-to-end — packet JSON frames → from_json decode →
  * stateful featurizer → RF scoring → NDJSON sink — as a sustained
  * rate, with the per-batch addBatch/stateCommit breakdown, against a
  * bare decode+featurize twin on the SAME frame stream. Gate: the full
  * scored pipeline's batch time must stay under 2× the bare
  * featurizer's (scoring is a stateless projection; if it ever
  * dominates the stateful operator, something is wrong).
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.length > 1 && args(1) == "detection") {
      detectionFloor(dir)
      return
    }
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_stream_stream_join", "q_stream_stream_left_join",
        "q_src_entropy_stream", "q_rate_window_stream")
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup

    // Progress events arrive asynchronously on the listener-bus thread
    // and can land AFTER the driving count() returns. A run's slice is
    // therefore keyed by the runIds whose STARTED event landed during
    // this run's window (not by a terminated-set diff — a straggling
    // terminated event from the previous run would land in the diff
    // and misattribute its batches), and the wait holds until EVERY
    // started runId has terminated (a query may drive several
    // streaming queries; the bus is FIFO per listener, so a runId's
    // terminated event follows all its progress events). A name that
    // starts no streaming query skips the wait and is reported as
    // such instead of stalling to the deadline and printing batches=0
    // as if measured.
    case class Batch(runId: String, batchId: Long, rows: Long,
        dur: Map[String, Long])
    val batches = ArrayBuffer.empty[Batch]
    val started = scala.collection.mutable.Set.empty[String]
    val terminated = scala.collection.mutable.Set.empty[String]
    val lock = new Object
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        lock.synchronized { started += e.runId.toString }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        lock.synchronized {
          batches += Batch(e.progress.runId.toString, e.progress.batchId,
            e.progress.numInputRows,
            e.progress.durationMs.asScala.map { case (k, v) => k -> v.toLong }.toMap)
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        lock.synchronized { terminated += e.runId.toString; lock.notifyAll() }
    }
    spark.streams.addListener(listener)
    for (n <- names; run <- 1 to 2) {
      val startedBefore = lock.synchronized(started.toSet)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // wait (bounded) for every started runId's terminated event
      val deadline = System.nanoTime() + 5000000000L
      val bs = lock.synchronized {
        var mine = started.diff(startedBefore)
        while (!mine.subsetOf(terminated) && System.nanoTime() < deadline) {
          lock.wait(200)
          mine = started.diff(startedBefore)
        }
        if (mine.isEmpty)
          println(s"[floor] $n started NO streaming query -- batch-only, nothing to itemize")
        else if (!mine.subsetOf(terminated))
          println(s"[floor] $n WARNING: ${mine.diff(terminated).size} of ${mine.size} " +
            "streaming runs never delivered a terminated event within 5 s -- slice incomplete")
        batches.filter(b => mine.contains(b.runId)).toVector
      }
      val total = bs.map(_.dur.getOrElse("triggerExecution", 0L)).sum
      println(f"[floor] $n run$run wall=$wall%6.2f s batches=${bs.size} trigger_total=${total / 1000.0}%5.2f s startstop=${wall - total / 1000.0}%5.2f s")
      for (b <- bs.sortBy(_.batchId)) {
        val d = b.dur
        println(s"[floor]   batch=${b.batchId} rows=${b.rows} " +
          Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
            "walCommit", "commitOffsets", "triggerExecution")
            .flatMap(k => d.get(k).map(v => s"$k=${v}ms")).mkString(" "))
      }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }

  /** End-to-end detection throughput floor: JSON frames (the Kafka wire
    * contract, rendered by PacketReplay) replayed through a
    * maxFilesPerTrigger'd file stream so the run spans several real
    * micro-batches, driven once as decode+featurize (bare) and once as
    * the FULL pipeline (decode+featurize+RF score+NDJSON sink, the
    * DetectionPipeline composition). Both paths share timeoutMs = 0 so
    * flows finalize on the next batch — the only way processing-time
    * timers fire under a replay trigger. Each path runs twice; run 2
    * (warm: streaming codegen, state-store provider, model broadcast
    * already paid) is the reported floor.
    */
  private def detectionFloor(dir: String): Unit = {
    val spark = GraftSession.getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    spark.range(1000000).selectExpr("sum(id)").collect()
    // ×10 replication with remapped ip space (the ScaleSmoke shape):
    // flows AND packets scale, so per-batch work is dominated by
    // per-row cost instead of the ~150 ms micro-batch fixed floor —
    // the sustained rate this artifact prices.
    val packets = flow.BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir))
      .crossJoin(spark.range(10).toDF("rep"))
      .withColumn("src_ip", concat(col("rep"), lit("."), col("src_ip")))
      .withColumn("dst_ip", concat(col("rep"), lit("."), col("dst_ip")))
      .withColumn("event_id", col("event_id") + col("rep") * lit(100000000L))
      .drop("rep")
    val frames = packets.as[flow.PacketRow].map(ingest.PacketReplay.toJson).toDF("value")
    val frameDir = java.nio.file.Files.createTempDirectory("floor_frames").toString
    frames.repartition(32).write.mode("overwrite").parquet(frameDir)
    val nPkts = spark.read.parquet(frameDir).count()
    val model = ml.PretrainedRf.model // load OUTSIDE any timed window
    println(s"[floor] detection: $nPkts packet frames under $frameDir")

    case class Batch(runId: String, batchId: Long, rows: Long,
        stateRows: Long, dur: Map[String, Long])
    val batches = ArrayBuffer.empty[Batch]
    val started = scala.collection.mutable.Set.empty[String]
    val terminated = scala.collection.mutable.Set.empty[String]
    val lock = new Object
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        lock.synchronized { started += e.runId.toString }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        lock.synchronized {
          batches += Batch(e.progress.runId.toString, e.progress.batchId,
            e.progress.numInputRows,
            e.progress.stateOperators.headOption.map(_.numRowsTotal).getOrElse(-1L),
            e.progress.durationMs.asScala.map { case (k, v) => k -> v.toLong }.toMap)
          lock.notifyAll()
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        lock.synchronized { terminated += e.runId.toString; lock.notifyAll() }
    }
    spark.streams.addListener(listener)

    // Per-STAGE variants (r18 VERDICT task 4): the scored path's extra
    // addBatch over bare is attributed by running the pipeline at four
    // cut points —
    //   bare   : decode + stateful featurizer            → memory sink
    //   filter : bare + `_TIMEOUT` completed-flow filter → memory sink
    //   score  : filter + RF vote projection + label     → foreachBatch count
    //   scored : score + NDJSON file sink (the production composition,
    //            via DetectionPipeline.start's persist-once foreachBatch)
    // so (filter − bare) prices the filter, (score − filter) the RF
    // projection, (scored − score) the sink IO + per-batch overheads.
    def runOnce(label: String, mode: String): (Double, Vector[Batch], Option[String]) = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"floor_ckpt_$label").toString
      // batch-size lever (SPARK_GRAFT_FLOOR_FILES, default 4 of 32
      // files): 4 spans ~9 real micro-batches (the sustained multi-batch
      // floor); larger values amortize the per-batch fixed costs toward
      // the batch featurizer's rate — the provisioning curve a
      // deployment tunes with trigger sizing
      val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_FLOOR_FILES", "4")
      val raw = spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(frameDir)
      // 500 ms session timeout so every flow FINALIZES (timeoutMs = 0
      // maps to NoTimeout — no _TIMEOUT row would ever reach the scored
      // sink and the gate would be vacuous). Trigger is ProcessingTime,
      // not AvailableNow: AvailableNow never terminates while
      // processing-time timers are pending (measured: 220+ empty
      // trailing batches) — instead the probe watches the state
      // operator's numRowsTotal and stops the query once the store
      // drains to 0, i.e. once every flow has timed out and been
      // emitted.
      val flows = DetectionPipeline.flowsOf(raw, timeoutMs = 500).toDF()
      val startedBefore = lock.synchronized(started.toSet)
      val t0 = System.nanoTime()
      val trig = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds")
      def sinkless(df: org.apache.spark.sql.DataFrame) =
        df.writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(trig)
          .format("memory").queryName(s"floor_$label").start()
      val (q, outDir) = mode match {
        case "bare" => (sinkless(flows), None)
        case "filter" =>
          import org.apache.spark.sql.functions.{col, instr}
          (sinkless(flows.filter(instr(col("flow_id"), "_TIMEOUT") > 0)), None)
        case "score" =>
          // full compute, no file IO: count() materializes every scored
          // row exactly once per micro-batch
          (flows.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(trig)
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              DetectionPipeline.scored(batch, model).count(); ()
            }.start(), None)
        case "scored" =>
          val od = java.nio.file.Files.createTempDirectory(s"floor_out_$label").toString
          (flows.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(trig)
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
              // one unconditional pass per batch, metadata-only
              // emptiness after the write (DetectionPipeline's shape)
              sink.Sinks.writeNdjsonNonEmpty(
                DetectionPipeline.scored(batch, model), s"$od/batch=$id")
              ()
            }.start(), Some(od))
      }
      // stop once the state store drains to 0 live flows AFTER at least
      // one data batch — every flow has finalized through the sink by
      // then. Bounded by a 180 s deadline so a stuck store can't hang
      // the probe.
      locally {
        val myRun = q.runId.toString
        val deadline = System.nanoTime() + 180000000000L
        lock.synchronized {
          def drained: Boolean = {
            val mine = batches.filter(_.runId == myRun)
            mine.exists(_.rows > 0) && mine.lastOption.exists(_.stateRows == 0L)
          }
          while (!drained && System.nanoTime() < deadline) lock.wait(200)
        }
        q.stop()
        q.awaitTermination()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val deadline = System.nanoTime() + 5000000000L
      val bs = lock.synchronized {
        var mine = started.diff(startedBefore)
        while (!mine.subsetOf(terminated) && System.nanoTime() < deadline) {
          lock.wait(200); mine = started.diff(startedBefore)
        }
        batches.filter(b => mine.contains(b.runId)).toVector
      }
      GraftSession.dropStreamSinks(spark)
      (wall, bs, outDir)
    }

    def report(label: String, wall: Double, bs: Vector[Batch]): Double = {
      val trig = bs.map(_.dur.getOrElse("triggerExecution", 0L)).sum / 1000.0
      val add = bs.map(_.dur.getOrElse("addBatch", 0L)).sum / 1000.0
      val commit = bs.map(_.dur.getOrElse("commitOffsets", 0L)).sum / 1000.0
      val wal = bs.map(_.dur.getOrElse("walCommit", 0L)).sum / 1000.0
      println(f"[floor] detection $label%-12s wall=$wall%6.2f s batches=${bs.size} " +
        f"trigger=$trig%6.2f s addBatch=$add%6.2f s walCommit=$wal%5.2f s " +
        f"commitOffsets=$commit%5.2f s rate=${nPkts / trig / 1e6}%.3f Mpkt/s")
      for (b <- bs.sortBy(_.batchId)) {
        val d = b.dur
        println(s"[floor]   batch=${b.batchId} rows=${b.rows} state=${b.stateRows} " +
          Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
            "walCommit", "commitOffsets", "stateCommit", "triggerExecution")
            .flatMap(k => d.get(k).map(v => s"$k=${v}ms")).mkString(" "))
      }
      trig
    }

    // Each variant runs TWICE and the lower-trigger run is reported
    // (r19: single-shot per-stage deltas were noise-dominated — one
    // probe run priced the trivial `_TIMEOUT` filter at +4.4 s and the
    // RF projection at −2.3 s, both physically impossible; the second
    // attempt collapses one-off state-store/GC stalls exactly like the
    // bench's min-of-two).
    def runBest(label: String, mode: String): (Double, Vector[Batch], Option[String]) = {
      // one untimed warmup PER MODE (r19 ADVICE: only bare/scored had
      // one, so 'score' charged its first-use costs — RF model
      // broadcast, sink codegen — to the timed channel and the
      // (score − filter) delta could over-price the RF projection)
      runOnce(s"${label}_warmup", mode)
      val a = runOnce(s"${label}_a", mode)
      val b = runOnce(s"${label}_b", mode)
      def trig(r: (Double, Vector[Batch], Option[String])) =
        r._2.map(_.dur.getOrElse("triggerExecution", 0L)).sum
      if (trig(a) <= trig(b)) a else b
    }
    val (bw, bb, _) = runBest("bare", "bare")
    val bare = report("bare", bw, bb)
    val (fw, fb, _) = runBest("filter", "filter")
    val filterSec = report("filter", fw, fb)
    val (vw, vb, _) = runBest("score", "score")
    val voteSec = report("score", vw, vb)
    val (sw, sb, sOut) = runBest("scored", "scored")
    val scoredSec = report("scored", sw, sb)
    // per-stage attribution of the scored path's extra trigger time
    println(f"[floor] detection stages: featurize=$bare%.2f s " +
      f"+filter=${filterSec - bare}%+.2f s +rf_vote=${voteSec - filterSec}%+.2f s " +
      f"+ndjson_sink=${scoredSec - voteSec}%+.2f s (full $scoredSec%.2f s)")
    // non-vacuity: the gate means nothing if no finalized flow was ever
    // scored and sunk — count the NDJSON rows the run actually wrote
    val scoredRows = sOut.map { od =>
      val root = java.nio.file.Paths.get(od)
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.filter(p => p.toString.endsWith(".json") ||
          p.toString.endsWith(".txt") || p.getFileName.toString.startsWith("part-"))
        .map(p => java.nio.file.Files.readAllLines(p).size.toLong).sum
      finally walk.close()
    }.getOrElse(0L)
    println(s"[floor] detection scored+sunk rows: $scoredRows (labeled completed flows)")
    require(scoredRows > 0,
      "detection floor is vacuous: no finalized flow reached the scored NDJSON sink")
    println(f"[floor] detection gate: scored/bare trigger ratio = ${scoredSec / bare}%.2f (bound 2.0)")
    require(scoredSec <= 2.0 * bare,
      f"full detection pipeline batch time ${scoredSec}%.2f s exceeds 2x the bare " +
        f"featurizer's ${bare}%.2f s — scoring/sink is dominating the stateful operator")
    println(f"[floor] detection sustained: ${nPkts / scoredSec / 1e6}%.3f Mpkt/s full pipeline, " +
      f"${nPkts / bare / 1e6}%.3f Mpkt/s bare featurizer ($nPkts packets)")
    // Provisioning math (r18 VERDICT task 4): what a cluster deployment
    // buys per sustained Mpkt/s at this floor. local[32] = 32 cores;
    // the per-batch fixed overhead (walCommit + commitOffsets +
    // everything in triggerExecution that is not addBatch) is the
    // state-commit floor that does NOT parallelize — at a fixed 5 s
    // production trigger it amortizes to overhead_ms/5000 of one core.
    locally {
      val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
      val rate = nPkts / scoredSec / 1e6
      val addB = sb.map(_.dur.getOrElse("addBatch", 0L)).sum / 1000.0
      val fixedPerBatch =
        if (sb.isEmpty) 0.0
        else (scoredSec - addB) / sb.size * 1000.0
      println(f"[floor] detection provisioning: ${cores / rate}%.0f cores per Mpkt/s " +
        f"(${rate * 1e6 / cores}%.0f pkt/s/core); per-batch fixed overhead " +
        f"${fixedPerBatch}%.0f ms (walCommit+offsets+plan), " +
        f"${fixedPerBatch / 5000 * 100}%.1f%% of one core at a 5 s production trigger")
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
