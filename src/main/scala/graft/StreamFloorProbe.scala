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
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
}
