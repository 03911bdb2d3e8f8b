package graft.operators

import graft.{Q, Tables}
import graft.flow.{BatchFlowFeaturizer, FlowFeatureSql}
import org.apache.spark.sql.functions._

/** Downstream of the featurizer: completed-flow filter (P3), dynamic
  * column select (P4), and DDoS/Normal label mapping (P2,
  * spark_app/main.py:1077-1090). The ML scoring path replaces the RF
  * prediction with a deterministic threshold here so the whole chain
  * stays oracle-checkable; RF itself lives in graft.ml.
  */
object Detection {

  private val wanted = Seq("flow_id", "source_ip", "destination_ip",
    "flow_packets_s", "syn_flag_count", "total_fwd_packets",
    "total_backward_packets", "not_a_real_column")

  val qDetect = Q(
    "q_detect_label",
    (spark, dir) => {
      import spark.implicits._
      val flows = BatchFlowFeaturizer.fromEvents(Tables.events(spark, dir))
      // P4: select the intersection of wanted and actual columns
      val cols = wanted.filter(flows.columns.contains)
      flows
        .filter(instr($"flow_id", "_TIMEOUT") > 0) // P3
        .select(cols.map(col): _*)
        .withColumn("prediction",
          when($"flow_packets_s" >= 1 && $"total_fwd_packets" + $"total_backward_packets" >= 8, 1.0)
            .otherwise(0.0))
        .withColumn("Label", when($"prediction" === 1.0, "DDoS").otherwise("Normal")) // P2
        .orderBy("flow_id")
    },
    Some(s"""WITH flows AS (${FlowFeatureSql.oracleBody})
SELECT flow_id, source_ip, destination_ip, flow_packets_s, syn_flag_count,
       total_fwd_packets, total_backward_packets,
       CAST(CASE WHEN flow_packets_s >= 1 AND total_fwd_packets + total_backward_packets >= 8 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS prediction,
       CASE WHEN flow_packets_s >= 1 AND total_fwd_packets + total_backward_packets >= 8 THEN 'DDoS' ELSE 'Normal' END AS Label
FROM flows
WHERE instr(flow_id, '_TIMEOUT') > 0
ORDER BY flow_id""")
  )

  val all: Seq[Q] = Seq(qDetect)
}
