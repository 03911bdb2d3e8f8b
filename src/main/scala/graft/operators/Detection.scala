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

  /** Entropy-based flood detection — the second classic volumetric
    * signal next to rate windows: per event-time hour, the Shannon
    * entropy of the source-IP distribution. A DDoS burst from one
    * source (or one spoofed prefix) CONCENTRATES the distribution —
    * entropy collapses toward 0 — while organic traffic stays near the
    * uniform bound log2(n_srcs). Entropy is kept oracle-exact the same
    * way `q_text_surprisal` keeps cross-entropy exact: each source
    * contributes c·floorLog2(N DIV c) whole bits (for positive
    * integers, floor(log2(floor(N/c))) = floor(log2(N/c)) — the floor
    * cannot cross a dyadic boundary), summed to window info_bits and
    * floor-divided to millibits/packet; never a float log2, whose last
    * ulp is libm-specific. The low_entropy flag is a rational compare
    * against [[LowEntropyMbits]] with a [[MinPackets]] support floor —
    * thresholds chosen to fire on a real subset at the oracle scale
    * (31/720 windows at sf0.01), not vacuously (the r11 q_rate_anomaly
    * lesson).
    *
    * Shape at scale: two map-side-combinable aggregates — (window,
    * src) counts, then per-window totals — and one join of the per-src
    * relation back to the |windows|-row totals; the totals side is
    * tiny and broadcasts, and everything is keyed on the window, so
    * the whole query is two exchanges on a pre-reduced relation. No
    * ordered window functions anywhere.
    */
  val EntropyWinUs: Long = 3600L * 1000000
  val LowEntropyMbits: Long = 2500
  val MinPackets: Long = 4

  /** The entropy rollup over any packet relation carrying
    * (ts_us, src_ip) — spec entry for the hand-exact entropy laws; the
    * catalog query binds the event-derived packet stream.
    */
  private[graft] def entropyOn(packets: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = packets.sparkSession
    locally {
      import spark.implicits._
      entropyFromCounts(packets
        .selectExpr(s"ts_us DIV $EntropyWinUs AS win", "src_ip")
        .groupBy($"win", $"src_ip").agg(count(lit(1)).as("c")))
    }
  }

  /** The entropy rollup from an ALREADY-MAINTAINED per-(window, source)
    * count relation — the shape a streaming deployment feeds it from
    * ([[qSrcEntropyStream]]): the stream owns the counts state, the
    * report is a batch pass over it.
    */
  private[graft] def entropyFromCounts(per: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = per.sparkSession
    locally {
      import spark.implicits._
      val tot = per.groupBy($"win".as("tw"))
        .agg(sum($"c").cast("bigint").as("n_packets"),
          count(lit(1)).as("n_srcs"))
      per.join(broadcast(tot), $"win" === $"tw")
        .groupBy($"win", $"n_packets", $"n_srcs")
        .agg(sum($"c" * (length(expr("bin(n_packets DIV c)")) - 1))
          .cast("bigint").as("info_bits"))
        .selectExpr(s"win * $EntropyWinUs AS window_start_us",
          "n_packets", "n_srcs", "info_bits",
          "(1000 * info_bits) DIV n_packets AS mbits_per_packet",
          s"n_packets >= $MinPackets AND (1000 * info_bits) DIV n_packets < $LowEntropyMbits AS low_entropy")
        .orderBy("window_start_us")
    }
  }

  /** The same entropy signal fed by Structured Streaming — the
    * deployment split a real detection service runs: the STREAM
    * maintains the per-(window, source) packet counts (one watermarked
    * event-time aggregation, state bounded to open windows; update
    * mode emits each key's final count under AvailableNow), and the
    * entropy report is the [[entropyFromCounts]] batch rollup over the
    * maintained counts table. Entropy itself cannot be one streaming
    * aggregation — Σ c·floorLog2(N DIV c) needs every c AND the window
    * total N together, which only exists once the window's sources are
    * complete — so splitting state-maintenance from report is the
    * honest streaming shape, not a workaround. Gated by the SAME
    * oracle as the batch query: stream == batch, bit for bit.
    */
  private val entropyOracle: String = s"""WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
per AS (SELECT ts_us // $EntropyWinUs AS win, src_ip, count(*) AS c
        FROM packets GROUP BY 1, 2),
tot AS (SELECT win AS tw, CAST(sum(c) AS BIGINT) AS n_packets, count(*) AS n_srcs
        FROM per GROUP BY 1),
b AS (SELECT win, n_packets, n_srcs,
             CAST(sum(c * (length(format('{:b}', n_packets // c)) - 1)) AS BIGINT) AS info_bits
      FROM per JOIN tot ON per.win = tot.tw
      GROUP BY 1, 2, 3)
SELECT win * $EntropyWinUs AS window_start_us, n_packets, n_srcs, info_bits,
       (1000 * info_bits) // n_packets AS mbits_per_packet,
       n_packets >= $MinPackets AND (1000 * info_bits) // n_packets < $LowEntropyMbits AS low_entropy
FROM b
ORDER BY window_start_us"""

  val qSrcEntropyStream = Q(
    "q_src_entropy_stream",
    (spark, dir) => graft.GraftSession.withStreamingShuffle(spark,
      graft.GraftSession.adaptiveStreamParts(spark, dir), noDataBatch = false) {
      import spark.implicits._
      val sinkName = graft.GraftSession.newSinkName(spark, "entropy_stream")
      val q = BatchFlowFeaturizer.packetsFromEvents(Tables.eventsStream(spark, dir))
        .withColumn("event_time", timestamp_micros($"ts_us"))
        .withWatermark("event_time", "2 minutes")
        .groupBy($"src_ip", window($"event_time", "1 hour"))
        .agg(count(lit(1)).as("c"))
        .selectExpr("src_ip", s"unix_micros(window.start) DIV $EntropyWinUs AS win", "c")
        .writeStream.outputMode("update")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      entropyFromCounts(spark.table(sinkName).select($"win", $"src_ip", $"c"))
    },
    Some(entropyOracle)) // stream == batch: the SAME oracle gates both

  val qSrcEntropy = Q(
    "q_src_entropy",
    (spark, dir) =>
      entropyOn(BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir))),
    Some(entropyOracle)
  )

  /** Port-scan screening — sources that touch an unusually wide set of
    * distinct (dst_ip, dst_port) endpoints within one day. Fan-out,
    * not volume, is the scan signature (a scanner sends FEW packets to
    * MANY endpoints; a heavy legitimate flow is the opposite), so the
    * detector counts exact distinct endpoint pairs per (source, day)
    * and reports the sources at or above [[ScanFanout]].
    *
    * Shape at scale: ONE groupBy (src_ip, day) with a two-phase exact
    * distinct on the endpoint string — fully combinable, key space
    * bounded by sources×days; no joins, no windows. Endpoint identity
    * is the `ip:port` string, spelled identically in both engines.
    */
  val ScanFanout: Long = 4L

  private[graft] def portScanOn(packets: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = packets.sparkSession
    locally {
      import spark.implicits._
      packets
        .selectExpr("src_ip", s"ts_us DIV ${86400L * 1000000} AS day_idx",
          "concat(dst_ip, ':', CAST(dst_port AS STRING)) AS endpoint")
        .groupBy($"src_ip", $"day_idx")
        .agg(countDistinct($"endpoint").as("fanout"),
          count(lit(1)).as("n_packets"))
        .where($"fanout" >= ScanFanout)
        .orderBy("src_ip", "day_idx")
    }
  }

  val qPortScan = Q(
    "q_port_scan",
    (spark, dir) => portScanOn(
      BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir))),
    Some(s"""WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0)
SELECT src_ip, ts_us // ${86400L * 1000000} AS day_idx,
       count(DISTINCT dst_ip || ':' || CAST(dst_port AS VARCHAR)) AS fanout,
       count(*) AS n_packets
FROM packets
GROUP BY 1, 2
HAVING count(DISTINCT dst_ip || ':' || CAST(dst_port AS VARCHAR)) >= $ScanFanout
ORDER BY src_ip, day_idx""")
  )

  val all: Seq[Q] = Seq(qDetect, qIpPrefix, qSrcEntropy, qSrcEntropyStream,
    qPortScan)
}
