package graft.operators

import graft.{Q, Tables}
import graft.flow.{BatchFlowFeaturizer, FlowFeatureSql}
import graft.functions.{IpToLong => IpFn}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CIDR blocklist matching with longest-prefix-match semantics — the
  * mitigation primitive the reference's per-IP verdicts stop short of
  * (spark_app/main.py keys on exact endpoint strings): real block
  * tables hold CIDR ranges at mixed prefix lengths, and a packet's
  * verdict is the MOST SPECIFIC covering rule, exactly as a router's
  * FIB resolves it.
  *
  * Shape at scale: the rules relation is dashboard-scale (thousands of
  * rows) and the verdict is a pure function of the source ADDRESS, not
  * the packet — so the ONLY packet-sized work is one map-side-
  * combinable groupBy reducing the stream to the per-src_ip traffic
  * rollup. Everything downstream operates on IP-space-sized relations:
  * the LPM range join runs on the per-IP keys against a `broadcast` of
  * the rules (the ONLY forced broadcast here: rules are config, never
  * input-derived), and the verdict joins the per-IP AGGREGATES — never
  * the raw packets — before the |rules|-bounded final rollup
  * (n_src_ips is a count of per-IP rows, bytes/syn are sums of sums).
  * Nothing input-derived is hint-broadcast: under the adversarial
  * threat model this engine exists for — spoofed randomized sources —
  * distinct src_ip cardinality is bounded only by the 2^32 address
  * space, and a forced broadcast of tens of millions of verdict rows
  * is a driver/executor OOM (the r12 watch item). Both sides of the
  * verdict join are distinct-IP-sized, so AQE broadcasts when small
  * and shuffles scale-safely when adversarial; MitigationSpec pins
  * that every hint in the plan covers only config data. At a rule
  * count where even the per-ip nested-loop stings, the standard
  * refinement is bucketing both sides by a fixed leading prefix
  * (e.g. /8) to make the candidate join an equi-join — noted here,
  * not needed at any plausible rule-table size.
  *
  * Determinism: LPM picks max `plen` with `rule_id` as the total
  * tie-break (two same-length rules covering one ip is a config smell,
  * but the verdict must still be deterministic); sources matching NO
  * rule — including unparseable ones, where [[graft.functions.IpToLong]]
  * yields NULL — land in one explicit `('', -1, 'allow')` bucket, the
  * same never-silently-drop convention as `q_ip_prefix_agg`'s `''`
  * prefix row. All outputs BIGINT/VARCHAR.
  */
object Mitigation {

  /** The catalog's block table: mixed /8–/27 lengths nested three deep
    * over the lab's 10/8 space, plus one never-matching range so the
    * zero-traffic case stays exercised.
    */
  private[graft] val Rules: Seq[(Long, String, String)] = Seq(
    (1L, "10.0.0.0/8", "monitor"),
    (2L, "10.1.0.0/16", "rate_limit"),
    (3L, "10.2.0.0/16", "rate_limit"),
    (4L, "10.0.1.0/24", "block"),
    (5L, "10.1.1.0/24", "block"),
    (6L, "10.2.1.32/27", "block"),
    (7L, "172.16.0.0/12", "block"))

  /** (lo, hi, prefixLen) of an aligned `a.b.c.d/len` CIDR literal. */
  private[graft] def cidrBounds(cidr: String): (Long, Long, Long) = {
    val Array(base, lenS) = cidr.split('/')
    val len = lenS.toLong
    val lo = IpFn.parse(base)
    require(lo >= 0L && len >= 0L && len <= 32L, s"bad cidr: $cidr")
    val size = 1L << (32 - len)
    require(lo % size == 0L, s"cidr base not aligned: $cidr")
    (lo, lo + size - 1L, len)
  }

  /** Per-rule traffic rollup after LPM assignment, over any relation
    * carrying (src_ip, length, syn_flag) — spec entry for the
    * longest-prefix-wins and explicit-allow-bucket laws; the catalog
    * query binds the driver packet stream and [[Rules]].
    */
  private[graft] def cidrMatchOn(
      packets: DataFrame, rules: Seq[(Long, String, String)]): DataFrame = {
    val spark = packets.sparkSession
    import spark.implicits._
    val ruleRows = rules.map { case (id, cidr, action) =>
      val (lo, hi, plen) = cidrBounds(cidr)
      (id, cidr, action, lo, hi, plen)
    }
    val r = ruleRows.toDF("rule_id", "cidr", "action", "lo", "hi", "plen")
    // the one packet-sized pass: reduce the stream to per-source
    // traffic (map-side combinable; output is distinct-IP-sized)
    val perIp = packets.groupBy($"src_ip")
      .agg(
        count(lit(1)).as("ip_packets"),
        sum($"length").cast("bigint").as("ip_bytes"),
        sum($"syn_flag").cast("bigint").as("ip_syn"))
    val ips = perIp.select($"src_ip").withColumn("ip", IpFn($"src_ip"))
    // candidate ranges per DISTINCT ip; LPM = rank-1 by (plen desc, id)
    val m = ips.join(broadcast(r), $"ip" >= $"lo" && $"ip" <= $"hi", "left")
    val v = m.withColumn("rn", row_number().over(
        Window.partitionBy($"src_ip")
          .orderBy($"plen".desc_nulls_last, $"rule_id".asc_nulls_last)))
      .where($"rn" === 1)
      .select($"src_ip",
        coalesce($"rule_id", lit(-1L)).as("rule_id"),
        coalesce($"cidr", lit("")).as("cidr"),
        coalesce($"action", lit("allow")).as("action"))
    perIp.join(v, "src_ip")
      .groupBy($"rule_id", $"cidr", $"action")
      .agg(
        sum($"ip_packets").cast("bigint").as("n_packets"),
        count(lit(1)).as("n_src_ips"),
        sum($"ip_bytes").cast("bigint").as("total_bytes"),
        sum($"ip_syn").cast("bigint").as("syn_packets"))
      .orderBy("rule_id")
  }

  /** DuckDB spelling of the strict dotted-quad parse: anchor to four
    * no-leading-zero decimal groups (backslash-free regex, same string
    * in both engines' dialects), range-check each octet, then the
    * base-256 positional sum. Mirrors [[graft.functions.IpToLong]].
    */
  private def duckIpExpr(col: String): String = {
    def oct(i: Int) = s"CAST(split_part($col, '.', $i) AS BIGINT)"
    s"""CASE WHEN regexp_matches($col, '^(0|[1-9][0-9]{0,2})([.](0|[1-9][0-9]{0,2})){3}$$')
          AND ${oct(1)} <= 255 AND ${oct(2)} <= 255
          AND ${oct(3)} <= 255 AND ${oct(4)} <= 255
     THEN ${oct(1)} * 16777216 + ${oct(2)} * 65536 + ${oct(3)} * 256 + ${oct(4)}
     ELSE NULL END"""
  }

  private def rulesValues: String =
    Rules.map { case (id, cidr, action) =>
      val (lo, hi, plen) = cidrBounds(cidr)
      s"($id, '$cidr', '$action', $lo, $hi, $plen)"
    }.mkString(",\n         ")

  val qCidrMatch = Q(
    "q_cidr_block_match",
    (spark, dir) => cidrMatchOn(
      BatchFlowFeaturizer.packetsFromEvents(Tables.events(spark, dir)), Rules),
    Some(s"""
WITH p0 AS (SELECT ${FlowFeatureSql.packetStage0(FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
ipn AS (SELECT src_ip, ${duckIpExpr("src_ip")} AS ip
        FROM (SELECT DISTINCT src_ip FROM packets)),
rules(rule_id, cidr, action, lo, hi, plen) AS
  (VALUES $rulesValues),
m AS (SELECT src_ip, rule_id, cidr, action,
             row_number() OVER (PARTITION BY src_ip
                                ORDER BY plen DESC, rule_id) AS rn
      FROM ipn JOIN rules ON ip BETWEEN lo AND hi),
v AS (SELECT i.src_ip,
             CAST(coalesce(m1.rule_id, -1) AS BIGINT) AS rule_id,
             coalesce(m1.cidr, '') AS cidr,
             coalesce(m1.action, 'allow') AS action
      FROM ipn i LEFT JOIN (SELECT * FROM m WHERE rn = 1) m1
        ON i.src_ip = m1.src_ip)
SELECT v.rule_id, v.cidr, v.action,
       count(*) AS n_packets,
       count(DISTINCT p.src_ip) AS n_src_ips,
       CAST(sum(p.length) AS BIGINT) AS total_bytes,
       CAST(sum(p.syn_flag) AS BIGINT) AS syn_packets
FROM packets p JOIN v ON p.src_ip = v.src_ip
GROUP BY 1, 2, 3
ORDER BY rule_id""")
  )

  val all: Seq[Q] = Seq(qCidrMatch)
}
