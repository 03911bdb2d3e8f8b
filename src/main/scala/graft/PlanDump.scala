package graft

/** Steady-state physical-plan dump for named catalog queries — the
  * committed EXPLAIN_r{N} artifacts. Runs each query once to build its
  * shared stages, then re-plans it and writes the physical tree plus
  * the tree-collected FileSourceScan/BatchScan and InMemoryTableScan
  * counts (the Round18bOpsSpec zero-file-scan quantities) to
  * `target/explain_<name>.txt`.
  *
  * Usage: runMain graft.PlanDump <sfDir> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query...]")
    val dir = args.head
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    for (name <- args.drop(1)) {
      val q = SparkEntry.queries(name)
      q(spark, dir).count() // build + materialize stages
      val df = q(spark, dir)
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      val fileScans = plan.collect {
        case f: FileSourceScanExec => f.nodeName
        case b: BatchScanExec => b.nodeName
      }
      val memScans = plan.collect { case m: InMemoryTableScanExec => m.nodeName }
      val out = java.nio.file.Paths.get(s"target/explain_$name.txt")
      java.nio.file.Files.writeString(out,
        s"$name steady-state physical plan ($dir, stages hot)\n" +
          s"tree-collected FileSourceScan nodes: ${fileScans.size} (must be 0 for staged finals)\n" +
          s"tree-collected InMemoryTableScan nodes: ${memScans.size}\n\n" +
          plan.toString)
      println(s"[plandump] $name -> $out (fileScans=${fileScans.size}, memScans=${memScans.size})")
      GraftSession.dropStreamSinks(spark)
    }
    operators.StageViews.unpersistAll(spark)
    spark.stop()
  }
}
