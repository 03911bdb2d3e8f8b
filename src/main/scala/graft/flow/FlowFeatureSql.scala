package graft.flow

/** Shared SQL fragments for the flow featurizer.
  *
  * The batch featurizer and its DuckDB oracle must agree bit-for-bit, so
  * every scalar/aggregate expression is defined ONCE here and rendered
  * into both the Spark plan (via `selectExpr`/`expr`) and the oracle CTE
  * SQL. Only two constructs differ by dialect (epoch-micros extraction),
  * handled via `Dialect`.
  *
  * Float determinism: every aggregate is an exact integer (BIGINT) or
  * exact DECIMAL sum; doubles appear only in the final projection as
  * IEEE ops on identical exact inputs, which both engines evaluate to
  * identical bits. Truncation (`int()` in the reference,
  * spark_app/main.py:877-939) is `floor` here — all values non-negative.
  *
  * Feature semantics follow the reference's stateful aggregator
  * (spark_app/main.py:254-990) with two documented deviations:
  *  - exact moments instead of 1000-capped sample arrays
  *    (main.py:288-292): stddev is exact population std over ALL packets;
  *  - IATs are exact integer microsecond diffs (the reference goes
  *    through float seconds ×1e6 then truncates, main.py:712-717, which
  *    can be off by 1µs).
  * Bulk counters use single-batch semantics (the whole batch input is
  * one micro-batch), matching the reference's per-batch bulk detection
  * (main.py:738-742).
  */
object FlowFeatureSql {

  sealed trait Dialect { def epochUs(col: String): String }
  /** Spark reads the events `ts` as epoch-nanos BIGINT (see
    * Tables.events); integer `div` truncates ns→µs exactly as DuckDB's
    * TIMESTAMP_NS→TIMESTAMP read does.
    */
  case object SparkDialect extends Dialect {
    def epochUs(col: String) = s"CAST($col DIV 1000 AS BIGINT)"
  }
  case object DuckDialect extends Dialect {
    def epochUs(col: String) = s"epoch_us($col)"
  }

  /** Stage 0: deterministic events→packets derivation. The driver's
    * `events` table stands in for the reference's Kafka packet stream
    * (producer/reader/simulator.py JSON contract); endpoints, ports,
    * protocol, lengths and TCP flags are derived from event fields so
    * the same rows are reproducible in any engine.
    */
  def packetStage0(d: Dialect): Seq[String] = Seq(
    "event_id",
    s"${d.epochUs("ts")} AS ts_us",
    "'10.' || CAST(user_id % 3 AS STRING) || '.0.' || CAST(user_id % 100 AS STRING) AS ep_a_ip",
    "'10.' || CAST(user_id % 5 AS STRING) || '.1.' || CAST(user_id % 50 AS STRING) AS ep_b_ip",
    "CAST(10000 + user_id % 100 AS BIGINT) AS ep_a_port",
    "CAST(CASE event_type WHEN 'purchase' THEN 443 WHEN 'signup' THEN 80 WHEN 'error' THEN 53 WHEN 'click' THEN 8080 ELSE 8443 END AS BIGINT) AS ep_b_port",
    "CAST(CASE WHEN event_type IN ('purchase','signup') THEN 6 ELSE 17 END AS BIGINT) AS protocol",
    "(event_id % 3 = 0) AS is_rev",
    "CAST(40 + floor(value * 20) AS BIGINT) AS length",
    "CAST(CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT) AS fin_flag",
    "CAST(CASE WHEN event_id % 5  = 0 THEN 1 ELSE 0 END AS BIGINT) AS syn_flag",
    "CAST(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END AS BIGINT) AS rst_flag",
    "CAST(event_id % 2 AS BIGINT) AS psh_flag",
    "CAST(CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END AS BIGINT) AS ack_flag",
    "CAST(CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS BIGINT) AS urg_flag",
    "CAST(CASE WHEN event_id % 19 = 0 THEN 1 ELSE 0 END AS BIGINT) AS cwr_flag",
    "CAST(CASE WHEN event_id % 23 = 0 THEN 1 ELSE 0 END AS BIGINT) AS ece_flag"
  )

  /** Stage 1: orient raw src/dst (a third of packets flow B→A) and
    * compute payload lengths (tcp payload mirrors the reference's
    * ip.len − headers heuristic, kafka_producer/simulator.py:43-58).
    */
  val packetStage1: Seq[String] = Seq(
    "event_id", "ts_us", "protocol", "length",
    "CASE WHEN is_rev THEN ep_b_ip ELSE ep_a_ip END AS src_ip",
    "CASE WHEN is_rev THEN ep_a_ip ELSE ep_b_ip END AS dst_ip",
    "CASE WHEN is_rev THEN ep_b_port ELSE ep_a_port END AS src_port",
    "CASE WHEN is_rev THEN ep_a_port ELSE ep_b_port END AS dst_port",
    "CASE WHEN protocol = 6 AND length > 60 THEN length - 60 ELSE 0 END AS tcp_len",
    "CASE WHEN protocol = 17 AND length > 48 THEN length - 48 ELSE 0 END AS udp_len",
    "fin_flag", "syn_flag", "rst_flag", "psh_flag",
    "ack_flag", "urg_flag", "cwr_flag", "ece_flag"
  )

  /** P1 — canonical flow key: lexicographic (string) IP ordering picks
    * the normalized endpoint pair, exactly as the reference
    * (spark_app/main.py:234-250). Ports follow the IP decision.
    */
  val canonicalKeyExprs: Seq[String] = Seq(
    "CASE WHEN src_ip < dst_ip THEN src_ip ELSE dst_ip END AS n_src_ip",
    "CASE WHEN src_ip < dst_ip THEN dst_ip ELSE src_ip END AS n_dst_ip",
    "CASE WHEN src_ip < dst_ip THEN src_port ELSE dst_port END AS n_src_port",
    "CASE WHEN src_ip < dst_ip THEN dst_port ELSE src_port END AS n_dst_port"
  )

  val keyCols: Seq[String] = Seq("n_src_ip", "n_dst_ip", "n_src_port", "n_dst_port", "protocol")
  private val partKeys = keyCols.mkString(", ")
  private val wOrd = s"PARTITION BY $partKeys ORDER BY ts_us, event_id"

  /** Stage 2: flow orientation = first observed packet's raw 4-tuple
    * (spark_app/main.py:535-546). One window (one shuffle on the flow
    * key, reused by the aggregation below).
    */
  val orientationExprs: Seq[String] = Seq(
    s"first_value(src_ip)   OVER ($wOrd) AS flow_src_ip",
    s"first_value(dst_ip)   OVER ($wOrd) AS flow_dst_ip",
    s"first_value(src_port) OVER ($wOrd) AS flow_src_port",
    s"first_value(dst_port) OVER ($wOrd) AS flow_dst_port"
  )

  /** Direction mask, as main.py:666-674. */
  val isFwdExpr: String =
    "(src_ip = flow_src_ip AND dst_ip = flow_dst_ip AND src_port = flow_src_port AND dst_port = flow_dst_port) AS is_fwd"

  /** Stage 3: previous-timestamp plumbing for the three IAT families
    * (main.py:709-719,766-776,807-819). The per-direction "previous
    * packet" is a running max over the preceding frame — avoids a
    * second window sort on (key, is_fwd).
    */
  val prevTsExprs: Seq[String] = Seq(
    s"lag(ts_us) OVER ($wOrd) AS prev_flow_ts",
    s"max(CASE WHEN is_fwd THEN ts_us END) OVER ($wOrd ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_fwd_ts",
    s"max(CASE WHEN NOT is_fwd THEN ts_us END) OVER ($wOrd ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_bwd_ts"
  )

  val iatExprs: Seq[String] = Seq(
    "ts_us - prev_flow_ts AS flow_iat",
    "CASE WHEN is_fwd AND prev_fwd_ts IS NOT NULL THEN ts_us - prev_fwd_ts END AS fwd_iat",
    "CASE WHEN NOT is_fwd AND prev_bwd_ts IS NOT NULL THEN ts_us - prev_bwd_ts END AS bwd_iat"
  )

  // exact sum of squares: DECIMAL(14,0)×BIGINT stays well inside both
  // engines' 38-digit decimals (max term ~1.6e25)
  private def sq(x: String) = s"CAST($x AS DECIMAL(14,0)) * $x"

  /** Aggregates — all exact (BIGINT / DECIMAL); doubles only appear in
    * the final projection. Names are internal.
    */
  val aggExprs: Seq[String] = Seq(
    "min(flow_src_ip) AS flow_src_ip",
    "min(flow_dst_ip) AS flow_dst_ip",
    "min(flow_src_port) AS flow_src_port",
    "min(flow_dst_port) AS flow_dst_port",
    "CAST(min(ts_us) AS BIGINT) AS first_us",
    "CAST(max(ts_us) AS BIGINT) AS last_us",
    "CAST(count(*) AS BIGINT) AS n_all",
    "CAST(sum(CASE WHEN is_fwd THEN 1 ELSE 0 END) AS BIGINT) AS n_fwd",
    "CAST(sum(CASE WHEN is_fwd THEN 0 ELSE 1 END) AS BIGINT) AS n_bwd",
    "CAST(sum(CASE WHEN is_fwd THEN length ELSE 0 END) AS BIGINT) AS fwd_bytes",
    "CAST(sum(CASE WHEN is_fwd THEN 0 ELSE length END) AS BIGINT) AS bwd_bytes",
    "CAST(max(CASE WHEN is_fwd THEN length END) AS BIGINT) AS fwd_len_max",
    "CAST(min(CASE WHEN is_fwd THEN length END) AS BIGINT) AS fwd_len_min",
    "CAST(max(CASE WHEN NOT is_fwd THEN length END) AS BIGINT) AS bwd_len_max",
    "CAST(min(CASE WHEN NOT is_fwd THEN length END) AS BIGINT) AS bwd_len_min",
    "CAST(min(length) AS BIGINT) AS all_len_min",
    "CAST(max(length) AS BIGINT) AS all_len_max",
    s"CAST(sum(CASE WHEN is_fwd THEN ${sq("length")} END) AS DOUBLE) AS fwd_len_sumsq",
    s"CAST(sum(CASE WHEN NOT is_fwd THEN ${sq("length")} END) AS DOUBLE) AS bwd_len_sumsq",
    s"CAST(sum(${sq("length")}) AS DOUBLE) AS all_len_sumsq",
    "CAST(count(flow_iat) AS BIGINT) AS n_flow_iat",
    "CAST(coalesce(sum(flow_iat), 0) AS BIGINT) AS flow_iat_sum",
    s"CAST(sum(${sq("flow_iat")}) AS DOUBLE) AS flow_iat_sumsq",
    "CAST(max(flow_iat) AS BIGINT) AS flow_iat_max_n",
    "CAST(min(flow_iat) AS BIGINT) AS flow_iat_min_n",
    "CAST(count(fwd_iat) AS BIGINT) AS n_fwd_iat",
    "CAST(coalesce(sum(fwd_iat), 0) AS BIGINT) AS fwd_iat_sum",
    s"CAST(sum(${sq("fwd_iat")}) AS DOUBLE) AS fwd_iat_sumsq",
    "CAST(max(fwd_iat) AS BIGINT) AS fwd_iat_max_n",
    "CAST(min(fwd_iat) AS BIGINT) AS fwd_iat_min_n",
    "CAST(count(bwd_iat) AS BIGINT) AS n_bwd_iat",
    "CAST(coalesce(sum(bwd_iat), 0) AS BIGINT) AS bwd_iat_sum",
    s"CAST(sum(${sq("bwd_iat")}) AS DOUBLE) AS bwd_iat_sumsq",
    "CAST(max(bwd_iat) AS BIGINT) AS bwd_iat_max_n",
    "CAST(min(bwd_iat) AS BIGINT) AS bwd_iat_min_n",
    "CAST(sum(fin_flag) AS BIGINT) AS fin_flags",
    "CAST(sum(syn_flag) AS BIGINT) AS syn_flags",
    "CAST(sum(rst_flag) AS BIGINT) AS rst_flags",
    "CAST(sum(psh_flag) AS BIGINT) AS psh_flags",
    "CAST(sum(ack_flag) AS BIGINT) AS ack_flags",
    "CAST(sum(urg_flag) AS BIGINT) AS urg_flags",
    "CAST(sum(cwr_flag) AS BIGINT) AS cwr_flags",
    "CAST(sum(ece_flag) AS BIGINT) AS ece_flags",
    "CAST(sum(CASE WHEN is_fwd THEN psh_flag ELSE 0 END) AS BIGINT) AS fwd_psh",
    "CAST(sum(CASE WHEN NOT is_fwd THEN psh_flag ELSE 0 END) AS BIGINT) AS bwd_psh",
    "CAST(sum(CASE WHEN is_fwd THEN urg_flag ELSE 0 END) AS BIGINT) AS fwd_urg",
    "CAST(sum(CASE WHEN NOT is_fwd THEN urg_flag ELSE 0 END) AS BIGINT) AS bwd_urg",
    // +20 bytes per TCP packet, +8 per UDP — fixed constants, main.py:722-724
    "CAST(sum(CASE WHEN is_fwd THEN CASE WHEN protocol = 6 THEN 20 ELSE 8 END ELSE 0 END) AS BIGINT) AS fwd_hdr",
    "CAST(sum(CASE WHEN NOT is_fwd THEN CASE WHEN protocol = 6 THEN 20 ELSE 8 END ELSE 0 END) AS BIGINT) AS bwd_hdr",
    "CAST(sum(CASE WHEN is_fwd AND (tcp_len > 0 OR udp_len > 0) THEN 1 ELSE 0 END) AS BIGINT) AS act_data_fwd",
    // bulk: packets > 1000B; single-batch semantics (main.py:738-742)
    "CAST(sum(CASE WHEN is_fwd AND length > 1000 THEN length ELSE 0 END) AS BIGINT) AS fwd_bulk_bytes",
    "CAST(sum(CASE WHEN is_fwd AND length > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS fwd_bulk_pkts",
    "CAST(max(CASE WHEN is_fwd AND length > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS fwd_bulk_count",
    "CAST(sum(CASE WHEN NOT is_fwd AND length > 1000 THEN length ELSE 0 END) AS BIGINT) AS bwd_bulk_bytes",
    "CAST(sum(CASE WHEN NOT is_fwd AND length > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS bwd_bulk_pkts",
    "CAST(max(CASE WHEN NOT is_fwd AND length > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS bwd_bulk_count"
  )

  // ---- final projection macros (doubles over exact inputs) ----

  /** duration floor of 1 ms, main.py:843 */
  private val durS = "greatest(CAST(last_us - first_us AS DOUBLE) / 1000000.0, 0.001)"

  private def fdiv(num: String, den: String) =
    s"CAST(floor(CAST($num AS DOUBLE) / CAST($den AS DOUBLE)) AS BIGINT)"

  private def meanI(sum: String, n: String) =
    s"CASE WHEN $n > 0 THEN ${fdiv(sum, n)} ELSE CAST(0 AS BIGINT) END"

  /** exact population std as a double (np.std ddof=0; 0 when n≤1, matching
    * safe_std main.py:268-273): sqrt((n·Σx² − (Σx)²) / n²) with exact Σ.
    */
  private def stdD(n: String, sum: String, sumsq: String) =
    s"sqrt(greatest(CAST($n AS DOUBLE) * $sumsq - CAST($sum AS DOUBLE) * CAST($sum AS DOUBLE), 0.0) / (CAST($n AS DOUBLE) * CAST($n AS DOUBLE)))"

  private def stdI(n: String, sum: String, sumsq: String) =
    s"CASE WHEN $n > 1 THEN CAST(floor(${stdD(n, sum, sumsq)}) AS BIGINT) ELSE CAST(0 AS BIGINT) END"

  private def z(name: String) = s"CAST(0 AS BIGINT) AS $name"

  /** Final projection: the 82-column flow-feature record
    * (output_schema main.py:54-138; names expected_features.txt).
    * All features BIGINT (the reference truncates every float, we keep
    * uniform BIGINT instead of its int/long mix).
    */
  val finalExprs: Seq[String] = Seq(
    "flow_src_ip || ':' || CAST(flow_src_port AS STRING) || '-' || flow_dst_ip || ':' || CAST(flow_dst_port AS STRING) || '-' || CAST(protocol AS STRING) || '_TIMEOUT' AS flow_id",
    "flow_src_ip AS source_ip",
    "flow_src_port AS source_port",
    "flow_dst_ip AS destination_ip",
    "flow_dst_port AS destination_port",
    "protocol",
    "last_us AS timestamp_us",
    "n_fwd AS total_fwd_packets",
    "n_bwd AS total_backward_packets",
    "fwd_bytes AS total_length_of_fwd_packets",
    "bwd_bytes AS total_length_of_bwd_packets",
    "coalesce(fwd_len_max, 0) AS fwd_packet_length_max",
    "coalesce(fwd_len_min, 0) AS fwd_packet_length_min",
    s"${meanI("fwd_bytes", "n_fwd")} AS fwd_packet_length_mean",
    s"${stdI("n_fwd", "fwd_bytes", "fwd_len_sumsq")} AS fwd_packet_length_std",
    "coalesce(bwd_len_max, 0) AS bwd_packet_length_max",
    "coalesce(bwd_len_min, 0) AS bwd_packet_length_min",
    s"${meanI("bwd_bytes", "n_bwd")} AS bwd_packet_length_mean",
    s"${stdI("n_bwd", "bwd_bytes", "bwd_len_sumsq")} AS bwd_packet_length_std",
    s"${fdiv("fwd_bytes + bwd_bytes", durS)} AS flow_bytes_s",
    s"${fdiv("n_all", durS)} AS flow_packets_s",
    s"${meanI("flow_iat_sum", "n_flow_iat")} AS flow_iat_mean",
    s"${stdI("n_flow_iat", "flow_iat_sum", "flow_iat_sumsq")} AS flow_iat_std",
    "coalesce(flow_iat_max_n, 0) AS flow_iat_max",
    "coalesce(flow_iat_min_n, 0) AS flow_iat_min",
    "fwd_iat_sum AS fwd_iat_total",
    s"${meanI("fwd_iat_sum", "n_fwd_iat")} AS fwd_iat_mean",
    s"${stdI("n_fwd_iat", "fwd_iat_sum", "fwd_iat_sumsq")} AS fwd_iat_std",
    "coalesce(fwd_iat_max_n, 0) AS fwd_iat_max",
    "coalesce(fwd_iat_min_n, 0) AS fwd_iat_min",
    "bwd_iat_sum AS bwd_iat_total",
    s"${meanI("bwd_iat_sum", "n_bwd_iat")} AS bwd_iat_mean",
    s"${stdI("n_bwd_iat", "bwd_iat_sum", "bwd_iat_sumsq")} AS bwd_iat_std",
    "coalesce(bwd_iat_max_n, 0) AS bwd_iat_max",
    "coalesce(bwd_iat_min_n, 0) AS bwd_iat_min",
    "fwd_psh AS fwd_psh_flags",
    "bwd_psh AS bwd_psh_flags",
    "fwd_urg AS fwd_urg_flags",
    "bwd_urg AS bwd_urg_flags",
    "fwd_hdr AS fwd_header_length",
    "bwd_hdr AS bwd_header_length",
    s"${fdiv("n_fwd", durS)} AS fwd_packets_s",
    s"${fdiv("n_bwd", durS)} AS bwd_packets_s",
    "all_len_min AS min_packet_length",
    "all_len_max AS max_packet_length",
    s"${meanI("fwd_bytes + bwd_bytes", "n_all")} AS packet_length_mean",
    s"${stdI("n_all", "fwd_bytes + bwd_bytes", "all_len_sumsq")} AS packet_length_std",
    // int(std²) of the float std, not the variance directly (main.py:911)
    s"CASE WHEN n_all > 1 THEN CAST(floor(${stdD("n_all", "fwd_bytes + bwd_bytes", "all_len_sumsq")} * ${stdD("n_all", "fwd_bytes + bwd_bytes", "all_len_sumsq")}) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS packet_length_variance",
    "fin_flags AS fin_flag_count",
    "syn_flags AS syn_flag_count",
    "rst_flags AS rst_flag_count",
    "psh_flags AS psh_flag_count",
    "ack_flags AS ack_flag_count",
    "urg_flags AS urg_flag_count",
    "cwr_flags AS cwe_flag_count",
    "ece_flags AS ece_flag_count",
    // byte ratio despite the CIC name (main.py:920)
    s"CASE WHEN fwd_bytes > 0 THEN ${fdiv("bwd_bytes", "fwd_bytes")} ELSE CAST(0 AS BIGINT) END AS down_up_ratio",
    s"${meanI("fwd_bytes + bwd_bytes", "n_all")} AS average_packet_size",
    s"${meanI("fwd_bytes", "n_fwd")} AS avg_fwd_segment_size",
    s"${meanI("bwd_bytes", "n_bwd")} AS avg_bwd_segment_size",
    s"CASE WHEN fwd_bulk_count > 0 THEN ${fdiv("fwd_bulk_bytes", "fwd_bulk_count")} ELSE CAST(0 AS BIGINT) END AS fwd_avg_bytes_bulk",
    s"CASE WHEN fwd_bulk_count > 0 THEN ${fdiv("fwd_bulk_pkts", "fwd_bulk_count")} ELSE CAST(0 AS BIGINT) END AS fwd_avg_packets_bulk",
    s"${fdiv("fwd_bulk_bytes", durS)} AS fwd_avg_bulk_rate",
    s"CASE WHEN bwd_bulk_count > 0 THEN ${fdiv("bwd_bulk_bytes", "bwd_bulk_count")} ELSE CAST(0 AS BIGINT) END AS bwd_avg_bytes_bulk",
    s"CASE WHEN bwd_bulk_count > 0 THEN ${fdiv("bwd_bulk_pkts", "bwd_bulk_count")} ELSE CAST(0 AS BIGINT) END AS bwd_avg_packets_bulk",
    s"${fdiv("bwd_bulk_bytes", durS)} AS bwd_avg_bulk_rate",
    "n_fwd AS subflow_fwd_packets",
    "fwd_bytes AS subflow_fwd_bytes",
    "n_bwd AS subflow_bwd_packets",
    "bwd_bytes AS subflow_bwd_bytes",
    // degenerate parity targets: never updated in the reference
    // (main.py:563-564, 938-939)
    z("init_win_bytes_forward"),
    z("init_win_bytes_backward"),
    "act_data_fwd AS act_data_pkt_fwd",
    z("min_seg_size_forward"),
    z("active_mean"), z("active_std"), z("active_max"), z("active_min"),
    z("idle_mean"), z("idle_std"), z("idle_max"), z("idle_min")
  )

  /** Complete oracle SQL (DuckDB dialect) for the batch featurizer. */
  def oracleSql: String = s"$oracleBody ORDER BY flow_id"

  /** Oracle body without the final sort — reusable as a CTE by
    * downstream queries (detection, ML feature source).
    */
  def oracleBody: String = {
    s"""WITH p0 AS (SELECT ${packetStage0(DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${packetStage1.mkString(", ")} FROM p0),
keyed AS (SELECT *, ${canonicalKeyExprs.mkString(", ")} FROM packets),
oriented AS (SELECT *, ${orientationExprs.mkString(", ")} FROM keyed),
directed AS (SELECT *, $isFwdExpr FROM oriented),
prev AS (SELECT *, ${prevTsExprs.mkString(", ")} FROM directed),
iat AS (SELECT *, ${iatExprs.mkString(", ")} FROM prev),
agg AS (SELECT ${keyCols.mkString(", ")}, ${aggExprs.mkString(", ")} FROM iat GROUP BY ${keyCols.mkString(", ")})
SELECT ${finalExprs.mkString(", ")} FROM agg"""
  }
}
