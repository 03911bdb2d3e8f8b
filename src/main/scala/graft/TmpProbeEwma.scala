package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

// throwaway diagnostic — deleted before commit
object TmpProbeEwma {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001","/root/testdata/sf0.01","/root/testdata/sf0.1","/root/repo/target/sf1")) {
      val ph = Ewma.prefixHourCounts(graft.flow.BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir))).cache()
      val W = (1L << Ewma.HistHours) - 1
      val base = ph.select($"pfx", $"h", $"cnt", explode(sequence(lit(1), lit(Ewma.HistHours))).as("k"))
        .select($"pfx".as("bpfx"), ($"h"+$"k").as("bh"), expr(s"cnt * shiftleft(CAST(1 AS BIGINT), ${Ewma.HistHours} - k)").as("w"))
        .groupBy($"bpfx",$"bh").agg(sum($"w").cast("bigint").as("baseline_scaled"), count(lit(1)).as("n_hist"))
      val j = ph.join(base, $"pfx"===$"bpfx" && $"h"===$"bh").where($"n_hist" >= Ewma.MinHist).cache()
      for ((num, den) <- Seq((7L,4L),(2L,1L),(9L,5L),(15L,8L))) {
        val n = j.where($"cnt"*lit(W)*lit(den) > lit(num)*$"baseline_scaled").count()
        println(s"[EWMA] $dir theta=$num/$den rows=$n")
      }
      val phd = ph.selectExpr("pfx","h DIV 24 AS d","h % 24 AS h24","cnt")
      val tot = phd.groupBy($"pfx".as("tpfx"), $"h24".as("th24")).agg(sum($"cnt").cast("bigint").as("tot_cnt"), count(lit(1)).as("n_days"))
      val s2 = phd.join(tot, $"pfx"===$"tpfx" && $"h24"===$"th24").where($"n_days"-1 >= Ewma.SeasonMinDays).cache()
      for ((num, den) <- Seq((3L,2L),(8L,5L),(13L,8L),(7L,4L))) {
        val n = s2.where($"cnt"*($"n_days"-1)*lit(den) > lit(num)*($"tot_cnt"-$"cnt")).count()
        println(s"[SEAS] $dir theta=$num/$den rows=$n")
      }
      j.unpersist(); s2.unpersist(); ph.unpersist()
    }
    spark.stop()
  }
}
