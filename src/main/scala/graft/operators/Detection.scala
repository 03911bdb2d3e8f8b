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
      val flows = BatchFlowFeaturizer.flowsView(spark, dir)
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

  /** Anti-DDoS mitigation rollup: the oriented packet stream
    * aggregated at the /16 source-prefix level — where rate limits and
    * blocks are actually installed (per-IP tables are useless against
    * a spoofed or botnet source that rotates within a prefix). One
    * map-side-combinable groupBy over the narrow packet projection;
    * the two countDistincts expand the aggregate but the key space is
    * bounded by the prefix count, so the final shuffle is tiny. The
    * prefix regex avoids backslash escapes entirely (`[0-9]`/`[.]`
    * classes) so the identical pattern string parses in both engines,
    * and is anchored to a FULL dotted quad (r11 ADVICE: the old
    * two-group pattern matched any leading `d.d`, so `999.1` or
    * `1.2.3` silently produced a prefix). A source that is not a
    * dotted quad extracts the empty string — by design those rows
    * aggregate under one explicit `''` bucket (the "unparseable
    * source" line a mitigation dashboard must show, never silently
    * drop); `Round12OpsSpec` pins both the bucket and the anchoring.
    */
  /** /16 prefix of a full dotted-quad IPv4 source; no-backslash
    * spelling (identical string in Spark's Java regex and DuckDB's
    * RE2), anchored both ends so partial or over-long forms extract
    * `''` instead of a bogus prefix.
    */
  val Prefix16Re: String =
    "^([0-9]{1,3}[.][0-9]{1,3})[.][0-9]{1,3}[.][0-9]{1,3}$"

  val qIpPrefix = Q(
    "q_ip_prefix_agg",
    (spark, dir) => {
      import spark.implicits._
      BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir))
        .groupBy(regexp_extract($"src_ip", Detection.Prefix16Re, 1)
          .as("src_prefix16"))
        .agg(
          count(lit(1)).as("n_packets"),
          countDistinct($"src_ip").as("n_src_ips"),
          countDistinct($"dst_ip").as("n_dst_ips"),
          sum($"length").as("total_bytes"),
          sum($"syn_flag").as("syn_packets"))
        .orderBy("src_prefix16")
    },
    Some(s"""WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0)
SELECT regexp_extract(src_ip, '$Prefix16Re', 1) AS src_prefix16,
       count(*) AS n_packets,
       count(DISTINCT src_ip) AS n_src_ips,
       count(DISTINCT dst_ip) AS n_dst_ips,
       CAST(sum(length) AS BIGINT) AS total_bytes,
       CAST(sum(syn_flag) AS BIGINT) AS syn_packets
FROM packets
GROUP BY 1
ORDER BY src_prefix16""")
  )

  val all: Seq[Q] = Seq(qDetect, qIpPrefix)
}
