package graft.ml

import graft.Tables
import graft.flow.BatchFlowFeaturizer
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** predict_rf.py parity: pretrained-model batch scoring (S5 load, P5-P10
  * clean, RF transform, P2 label map, K3 NDJSON sink) plus the TreeSql
  * compilation proof — the compiled SQL form of the 100-tree forest must
  * reproduce MLlib's raw votes and predictions BIT-FOR-BIT, since it is
  * the DuckDB oracle for q_rf_pretrained_score.
  */
class PretrainedRfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  lazy val flows = BatchFlowFeaturizer.fromEvents(Tables.events(spark, sf)).cache()

  test("compiled tree SQL reproduces MLlib votes and predictions bit-for-bit") {
    import spark.implicits._
    val cols = PretrainedRf.assembler.getInputCols
    flows.createOrReplaceTempView("prf_feats")
    val compiled = spark.sql(s"""
      SELECT flow_id, v0, v1, ${TreeSql.predictionSql()} AS prediction
      FROM (SELECT flow_id,
                   ${TreeSql.votesSql(PretrainedRf.rf, 0, i => cols(i))} AS v0,
                   ${TreeSql.votesSql(PretrainedRf.rf, 1, i => cols(i))} AS v1
            FROM prf_feats)""")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val mllib = PretrainedRf.model.transform(PretrainedRf.cleaned(flows))
      .select($"flow_id",
        vector_to_array($"rawPrediction").getItem(0).as("v0"),
        vector_to_array($"rawPrediction").getItem(1).as("v1"),
        $"prediction")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(compiled.keySet == mllib.keySet)
    assert(compiled.nonEmpty)
    // exact double equality — the oracle depends on bit-identity
    val mismatches = compiled.collect {
      case (id, c) if mllib(id) != c => (id, c, mllib(id))
    }
    assert(mismatches.isEmpty, s"first mismatches: ${mismatches.take(3)}")
  }

  test("scoring emits P2 labels consistent with predictions; NDJSON roundtrip (K3)") {
    val scored = PretrainedRf.score(flows).cache()
    val rows = scored.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (p, l) = (r.getAs[Double]("prediction"), r.getAs[String]("Label"))
      (p == 1.0 && l == "DDoS") || (p == 0.0 && l == "Normal")
    })
    val out = Files.createTempDirectory("prf_ndjson").toString + "/scored"
    graft.sink.Sinks.writeNdjson(scored.toDF(), out)
    val back = spark.read.json(out)
    assert(back.count() == rows.length)
    assert(back.columns.sorted.toSeq == Seq("Label", "ddos_votes", "flow_id", "prediction"))
    scored.unpersist(blocking = false)
    ()
  }

  test("compiled SQL matches MLlib on 2000 synthetic off-corpus vectors") {
    import spark.implicits._
    // deterministic pseudo-random features spanning each split's
    // threshold neighborhood (no Math.random: xxhash64-derived), so
    // boundary behavior (<= vs <) is exercised away from the real
    // corpus' value distribution
    val cols = PretrainedRf.assembler.getInputCols
    // per-feature scale spans 0.1×..10^5× so thresholds at any
    // magnitude (packet counts vs byte rates vs µs IATs) get crossed
    val featExprs = cols.zipWithIndex.map { case (c, k) =>
      s"CAST(pmod(xxhash64(id, $k), 2000) AS DOUBLE) * CAST(pow(10.0, CAST(pmod(xxhash64(id, ${k + 100}), 7) AS DOUBLE) - 1.0) AS DOUBLE) AS `$c`"
    }
    val synth = spark.range(2000).selectExpr("id" +: featExprs: _*).cache()
    synth.createOrReplaceTempView("prf_synth")
    val compiled = spark.sql(s"""
      SELECT id, v1, ${TreeSql.predictionSql()} AS prediction
      FROM (SELECT id,
                   ${TreeSql.votesSql(PretrainedRf.rf, 0, i => s"`${cols(i)}`")} AS v0,
                   ${TreeSql.votesSql(PretrainedRf.rf, 1, i => s"`${cols(i)}`")} AS v1
            FROM prf_synth)""")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val mllib = PretrainedRf.model.transform(synth)
      .select($"id", org.apache.spark.ml.functions.vector_to_array($"rawPrediction").getItem(1), $"prediction")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(compiled.size == 2000)
    assert(compiled == mllib)
    // the sweep must route rows through many distinct leaf combinations
    // (class diversity is covered on the real corpus, where the model
    // flags 10/750 flows DDoS and still bit-matches)
    val distinctVotes = compiled.values.map(_._1).toSet.size
    assert(distinctVotes > 500, s"sweep too uniform: $distinctVotes distinct vote sums")
    synth.unpersist(blocking = false)
    ()
  }

  test("vote margins are far above fp noise (cross-engine determinism headroom)") {
    import spark.implicits._
    val margins = PretrainedRf.score(flows)
      .select(org.apache.spark.sql.functions.abs($"ddos_votes" * 2 - 100.0).as("m"))
      .agg(org.apache.spark.sql.functions.min($"m")).as[Double].head()
    // v0 + v1 == 100 (every tree votes); |v1 - v0| = |2·v1 − 100|.
    // A tie would need votes within ~1e-13 of 50/50; the forest's
    // coarsest leaf probabilities make that structurally implausible —
    // pin a generous floor so any future near-tie is caught loudly.
    assert(margins > 1e-6, s"min |v1-v0| = $margins")
  }
}
