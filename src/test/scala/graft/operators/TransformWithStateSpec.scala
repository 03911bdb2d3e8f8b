package graft.operators

import graft.operators.StatefulTotals.{RunningTotalsProcessor, TwsEvent, TwsTotals}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** Pins what the oracle gate cannot see about `transformWithState`:
  * ValueState genuinely carries across micro-batches (the single-file
  * catalog run is one batch), and the result is independent of how rows
  * are split into batches.
  */
class TransformWithStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def runBatches(batches: Seq[Seq[TwsEvent]], sinkName: String): Map[Long, TwsTotals] = {
    import spark.implicits._
    StatefulTotals.withRocksDb(spark) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[TwsEvent]
      val q = input.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new RunningTotalsProcessor,
          TimeMode.None(), OutputMode.Update(), Encoders.product[TwsTotals])
        .writeStream.outputMode("update")
        .format("memory").queryName(sinkName)
        .start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
    }
    spark.table(sinkName).as[TwsTotals].collect()
      .groupBy(_.user_id)
      // last emission per key: the largest running count wins
      .map { case (k, rows) => k -> rows.maxBy(_.n_events) }
  }

  test("ValueState carries across micro-batches; totals are split-invariant") {
    val events = Seq(
      TwsEvent(1L, 100L, 10L), TwsEvent(1L, 200L, 20L), TwsEvent(2L, 50L, 5L),
      TwsEvent(1L, 300L, 30L), TwsEvent(2L, 25L, 7L), TwsEvent(3L, 999L, 1L))
    val twoBatches = runBatches(Seq(events.take(3), events.drop(3)), s"tws2_${System.nanoTime()}")
    val oneBatch = runBatches(Seq(events), s"tws1_${System.nanoTime()}")
    assert(twoBatches == oneBatch)
    assert(twoBatches(1L) == TwsTotals(1L, 3L, 60L, 100L, 300L))
    assert(twoBatches(2L) == TwsTotals(2L, 2L, 12L, 25L, 50L))
    assert(twoBatches(3L) == TwsTotals(3L, 1L, 1L, 999L, 999L))
  }

  test("MapState counters carry across batches; top flips when overtaken") {
    import spark.implicits._
    import graft.operators.StatefulTotals.{TopTypeProcessor, TypedEvent, TopType}
    val sinkName = s"twsm_${System.nanoTime()}"
    StatefulTotals.withRocksDb(spark) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[TypedEvent]
      val q = input.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new TopTypeProcessor,
          TimeMode.None(), OutputMode.Update(), Encoders.product[TopType])
        .writeStream.outputMode("update")
        .format("memory").queryName(sinkName)
        .start()
      try {
        // batch 1: a=2, b=1 → top a; batch 2: +2 b → b=3 overtakes
        input.addData(Seq(TypedEvent(1, "a"), TypedEvent(1, "a"), TypedEvent(1, "b")))
        q.processAllAvailable()
        input.addData(Seq(TypedEvent(1, "b"), TypedEvent(1, "b")))
        q.processAllAvailable()
      } finally q.stop()
    }
    val em = spark.table(sinkName).as[TopType].collect().sortBy(_.n_total)
    assert(em.toSeq == Seq(TopType(1, "a", 2, 3), TopType(1, "b", 3, 5)))
  }

  test("second batch emits cumulative totals, not per-batch deltas") {
    import spark.implicits._
    val sinkName = s"tws_cum_${System.nanoTime()}"
    runBatches(Seq(Seq(TwsEvent(7L, 1L, 100L)), Seq(TwsEvent(7L, 2L, 100L))), sinkName)
    val emissions = spark.table(sinkName).as[TwsTotals].collect()
      .filter(_.user_id == 7L).map(_.n_events).sorted
    assert(emissions.toSeq == Seq(1L, 2L), "each batch must emit the running count")
  }
}
