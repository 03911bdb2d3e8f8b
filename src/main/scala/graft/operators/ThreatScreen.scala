package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Per-window DDoS threat screen — the composition that makes the
  * in-stream sketch triad actionable. [[MgStream]] names the top
  * talkers, [[QdStream]] tracks the packet-length distribution,
  * [[HllStream]] counts distinct sources; this operator states the
  * DETECTION LOGIC over those three signals as one per-window verdict
  * relation, in batch over the same packets (each triad member's
  * stream==batch agreement is pinned by its own catalog query, so the
  * batch spelling here is the semantics of the live screen):
  *
  *  - `src_surge`    — distinct sources > 3× the trailing-24-window
  *                     mean: reflection / carpet-bombing (many
  *                     reflectors, each quiet — the signal volume and
  *                     talker thresholds miss by design);
  *  - `vol_surge`    — packets > 3× the trailing mean: volumetric
  *                     flood;
  *  - `len_collapse` — p99 == p50 packet length: a degenerate
  *                     (fixed-size) length distribution, the classic
  *                     generated-flood fingerprint;
  *  - `talker_dom`   — the top source carries ≥ 25% of the window's
  *                     packets (basis-point integer share);
  *  - `threat`       — src_surge OR (vol_surge AND (len_collapse OR
  *                     talker_dom)): cardinality explosions alert
  *                     alone; volume alerts only with a corroborating
  *                     shape or concentration signal, which is what
  *                     keeps organic traffic spikes out.
  *
  * Every number is exact integer arithmetic (counts, discrete-rank
  * quantiles, basis-point shares by integer division, trailing sums
  * with explicit frame counts — verdicts compare cross-products, never
  * divide), so the relation is bit-stable and fully oracle-checkable.
  * The trailing baseline is row-framed over OBSERVED windows (24
  * preceding rows), not wall-clock framed: both engines state the same
  * frame over the same window relation, and on a live deployment
  * absent windows mean absent traffic — a baseline over the last 24
  * active windows is the operational intent.
  *
  * Plan shape: TWO data-sized, map-side-combinable shuffles — packets
  * → (window, src) counts and packets → (window, length) counts —
  * then everything downstream (top-talker rank, quantile rank rule,
  * trailing frames, the verdict join) runs on window-sized relations
  * (≤ windows × 350 and windows × ~1.2k rows). At 100 TB the two
  * aggregations are the only passes over the data; the screen itself
  * costs windows × small.
  */
object ThreatScreen {

  val WinUs: Long = 3600L * 1000000
  /** Trailing-baseline depth (observed windows). */
  val TrailW = 24
  /** Surge multiplier for src/vol vs the trailing mean. */
  val Surge = 3
  /** Top-talker dominance threshold, basis points. */
  val DomBp = 2500L

  /** The screen over an arbitrary `(win, src_ip, length)` packet
    * relation — the Q binds it to the events-derived packets; the spec
    * drives hand-built windows through every verdict in both truth
    * directions (the catalog corpus is steady traffic, so its surge
    * verdicts are legitimately all-false there — non-vacuity lives in
    * `ThreatScreenSpec`).
    */
  private[graft] def screenOn(pk: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = pk.sparkSession
    import spark.implicits._
    screenFromCounts(
      // shuffle 1: per-(window, source) counts — feeds exact distinct
      // sources, packet totals, and the dominance rank
      pk.groupBy($"win", $"src_ip").agg(count(lit(1)).as("cnt")),
      // shuffle 2: per-(window, length) histogram — the QdStream
      // discrete rank rule at 50% / 99%
      pk.groupBy($"win", $"length").agg(count(lit(1)).as("cnt")))
  }

  /** The verdict logic over pre-aggregated per-(window, source) counts
    * and a per-(window, length) histogram — shared VERBATIM by the
    * batch screen (which folds raw packets into them) and
    * [[ThreatScreenStream]] (whose timer-emitted sketch summaries ARE
    * those counts in the exact regime), so the two deployments cannot
    * drift.
    */
  private[graft] def screenFromCounts(perSrc: org.apache.spark.sql.DataFrame,
      hist: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = perSrc.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
      val winStats = perSrc.groupBy($"win").agg(
        count(lit(1)).as("n_src"),
        sum($"cnt").cast("bigint").as("n_pkts"))
      val top = perSrc
        .withColumn("rk", row_number().over(
          Window.partitionBy($"win").orderBy($"cnt".desc, $"src_ip")))
        .where($"rk" === 1)
        .select($"win", $"src_ip".as("top_src"), $"cnt".as("top_cnt"))
      val cum = hist
        .withColumn("cum", sum($"cnt").over(
          Window.partitionBy($"win").orderBy($"length")))
        .withColumn("n_w", sum($"cnt").over(Window.partitionBy($"win")))
      val quant = cum.groupBy($"win").agg(
        min(when($"cum" >= expr("(5000 * n_w + 9999) DIV 10000"), $"length"))
          .as("p50_len"),
        min(when($"cum" >= expr("(9900 * n_w + 9999) DIV 10000"), $"length"))
          .as("p99_len"))
      // window-sized from here down: trailing baseline + verdicts
      val trail = Window.orderBy($"win")
        .rowsBetween(-TrailW, -1)
      winStats.join(top, Seq("win")).join(quant, Seq("win"))
        .withColumn("trail_w", count(lit(1)).over(trail))
        .withColumn("trail_src_sum",
          coalesce(sum($"n_src").over(trail), lit(0L)).cast("bigint"))
        .withColumn("trail_pkt_sum",
          coalesce(sum($"n_pkts").over(trail), lit(0L)).cast("bigint"))
        .select(
          ($"win" * lit(WinUs)).as("window_start_us"),
          $"n_pkts", $"n_src", $"p50_len", $"p99_len",
          $"top_src",
          expr("top_cnt * 10000 DIV n_pkts").as("top_share_bp"),
          $"trail_w", $"trail_src_sum", $"trail_pkt_sum",
          ($"trail_w" > 0 && $"n_src" * $"trail_w" > lit(Surge) * $"trail_src_sum")
            .as("src_surge"),
          ($"trail_w" > 0 && $"n_pkts" * $"trail_w" > lit(Surge) * $"trail_pkt_sum")
            .as("vol_surge"))
        .withColumn("len_collapse", $"p99_len" === $"p50_len")
        .withColumn("talker_dom", $"top_share_bp" >= lit(DomBp))
        .withColumn("threat",
          $"src_surge" || ($"vol_surge" && ($"len_collapse" || $"talker_dom")))
        .orderBy("window_start_us")
  }

  /** The oracle's verdict CTE chain + final SELECT, continuing a WITH
    * clause that has already defined `pk(win, src_ip, length)` — the
    * SQL-side counterpart of sharing [[screenFromCounts]] verbatim:
    * the live screen's oracle ([[ThreatScreenStream]]) appends only
    * its horizon predicate and extra columns, so an edit to the
    * Surge/DomBp framing or the quantile rank rule cannot silently
    * diverge the two oracles.
    *
    * @param extraCols appended after the `threat` column (lead with a
    *   comma); @param where optional final WHERE clause text.
    */
  private[operators] def verdictSql(extraCols: String = "",
      where: String = ""): String = s"""
per_src AS (SELECT win, src_ip, CAST(count(*) AS BIGINT) AS cnt
            FROM pk GROUP BY win, src_ip),
win_stats AS (SELECT win, CAST(count(*) AS BIGINT) AS n_src,
                     CAST(sum(cnt) AS BIGINT) AS n_pkts
              FROM per_src GROUP BY win),
top AS (SELECT win, src_ip AS top_src, cnt AS top_cnt
        FROM (SELECT win, src_ip, cnt,
                     row_number() OVER (PARTITION BY win
                       ORDER BY cnt DESC, src_ip) AS rk
              FROM per_src) WHERE rk = 1),
hist AS (SELECT win, length, CAST(count(*) AS BIGINT) AS cnt
         FROM pk GROUP BY win, length),
cum AS (SELECT win, length,
               CAST(sum(cnt) OVER (PARTITION BY win ORDER BY length) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY win) AS BIGINT) AS n_w
        FROM hist),
quant AS (SELECT win,
                 min(CASE WHEN cum >= (5000 * n_w + 9999) // 10000 THEN length END) AS p50_len,
                 min(CASE WHEN cum >= (9900 * n_w + 9999) // 10000 THEN length END) AS p99_len
          FROM cum GROUP BY win),
scr AS (SELECT s.win, s.n_pkts, s.n_src, q.p50_len, q.p99_len,
               t.top_src, t.top_cnt * 10000 // s.n_pkts AS top_share_bp,
               CAST(count(*) OVER w AS BIGINT) AS trail_w,
               CAST(coalesce(sum(s.n_src) OVER w, 0) AS BIGINT) AS trail_src_sum,
               CAST(coalesce(sum(s.n_pkts) OVER w, 0) AS BIGINT) AS trail_pkt_sum
        FROM win_stats s
        JOIN top t ON t.win = s.win
        JOIN quant q ON q.win = s.win
        WINDOW w AS (ORDER BY s.win ROWS BETWEEN $TrailW PRECEDING AND 1 PRECEDING))
SELECT win * $WinUs AS window_start_us, n_pkts, n_src, p50_len, p99_len,
       top_src, top_share_bp, trail_w, trail_src_sum, trail_pkt_sum,
       (trail_w > 0 AND n_src * trail_w > $Surge * trail_src_sum) AS src_surge,
       (trail_w > 0 AND n_pkts * trail_w > $Surge * trail_pkt_sum) AS vol_surge,
       (p99_len = p50_len) AS len_collapse,
       (top_share_bp >= $DomBp) AS talker_dom,
       ((trail_w > 0 AND n_src * trail_w > $Surge * trail_src_sum) OR
        ((trail_w > 0 AND n_pkts * trail_w > $Surge * trail_pkt_sum) AND
         (p99_len = p50_len OR top_share_bp >= $DomBp))) AS threat$extraCols
FROM scr
$where
ORDER BY window_start_us"""

  val qWindowThreatScreen = Q(
    "q_window_threat_screen",
    (spark, dir) => screenOn(
      graft.flow.BatchFlowFeaturizer
        .packetsFromEvents(Tables.events(spark, dir))
        .selectExpr(s"ts_us DIV $WinUs AS win", "src_ip", "length")),
    Some(s"""
WITH p0 AS (SELECT ${graft.flow.FlowFeatureSql.packetStage0(graft.flow.FlowFeatureSql.DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${graft.flow.FlowFeatureSql.packetStage1.mkString(", ")} FROM p0),
pk AS (SELECT ts_us // $WinUs AS win, src_ip, length FROM packets),${verdictSql()}"""))

  val all: Seq[Q] = Seq(qWindowThreatScreen)
}
