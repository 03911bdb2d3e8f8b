package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

// throwaway diagnostic — deleted before commit
object TmpProbeTws {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[batch] id=${p.batchId} rows=${p.numInputRows} " +
          s"durMs=${p.batchDuration} trig=${p.durationMs}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val dir = "/root/repo/target/sf1"
    for (qn <- Seq("q_tws_running_totals", "q_tws_debounce_chain")) {
      val q = SparkEntry.catalog.find(_.name == qn).get
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[tws] $qn $sec%.2f s  $n rows")
    }
    spark.stop()
  }
}
