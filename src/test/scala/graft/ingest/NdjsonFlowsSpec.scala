package graft.ingest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** K3 → K5 loop: flows written as NDJSON come back bit-identical when
  * read with the explicit schema.
  */
class NdjsonFlowsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("NDJSON write/read roundtrip of flow features") {
    val flows = graft.flow.BatchFlowFeaturizer
      .fromEvents(graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val dir = Files.createTempDirectory("ndjson").toString + "/flows"
    graft.sink.Sinks.writeNdjson(flows, dir)
    val back = NdjsonFlows.load(spark, dir)
    val a = flows.collect().map(r => r.getString(0) -> r.toSeq).toMap
    val b = back.collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(a.keySet == b.keySet)
    for ((k, v) <- a) assert(b(k) == v, s"flow $k differs after roundtrip")
    assert(a.nonEmpty)
  }
}
