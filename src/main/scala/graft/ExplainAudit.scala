package graft

/** Prints the formatted physical plan of every catalog query — the
  * per-round scale audit (shuffle count, pushed filters, codegen spans).
  * Usage: runMain graft.ExplainAudit [sfDir] [queryName...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSet else Set.empty[String]
    val spark = GraftSession.getOrCreate()
    SparkEntry.catalog
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try {
          val df = q.run(spark, sfDir)
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
