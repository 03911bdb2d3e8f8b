package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the custom Aggregator's semantics: partition-count invariance
  * (within fp tolerance — merge order moves only low bits), agreement
  * with the two-pass reference on known data, NaN on empty, and SQL
  * registration.
  */
class WelfordVarianceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("matches two-pass variance and is partition-layout stable") {
    import spark.implicits._
    WelfordVariance.register(spark)
    val xs = (1 to 10000).map(i => (i % 7, (i * 37 % 1000) / 10.0))
    val exact = xs.groupBy(_._1).map { case (k, vs) =>
      val v = vs.map(_._2)
      val mean = v.sum / v.size
      k -> v.map(x => (x - mean) * (x - mean)).sum / v.size
    }
    for (parts <- Seq(1, 4, 13)) {
      val got = xs.toDF("k", "x").repartition(parts)
        .groupBy($"k").agg(expr("welford_var(x)").as("v"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      exact.foreach { case (k, e) =>
        assert(math.abs(got(k) - e) <= 1e-9 * (e + 1), s"k=$k parts=$parts")
      }
    }
  }

  test("empty input yields NaN through the typed API") {
    import spark.implicits._
    val ds = spark.emptyDataset[Double]
    val out = ds.select(WelfordVariance.aggregator.toColumn).collect()
    assert(out.length == 1 && out(0).isNaN)
  }

  test("constant column has zero variance") {
    import spark.implicits._
    WelfordVariance.register(spark)
    val v = Seq.fill(500)(42.42).toDF("x")
      .agg(expr("welford_var(x)")).head().getDouble(0)
    assert(v == 0.0)
  }
}
