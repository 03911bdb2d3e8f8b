package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-curation operators a web-scale training-data pipeline runs
  * between raw crawl and training batches: exact substring-level
  * duplication measurement and per-source token quotas.
  *
  * `q_substring_dup` is the *substring* counterpart of the document
  * dedup family (reference behavior: the whole-row dedup of
  * spark_app/train_rf.py dropDuplicates — here generalized to the
  * within/across-document repetition LLM pipelines measure before
  * training): every positional token-8-gram window of every document
  * is hashed, a window is "duplicated" when its text occurs in ≥ 2
  * distinct documents, and the per-document output is the duplicated
  * fraction in basis points. Unlike the pair-producing near-dup
  * queries there is NO self-join anywhere — both stages are linear
  * groupBy/join passes over the window relation — so no DF cap is
  * needed: a window shared by k documents costs k rows, never k².
  * The md5 of the window (not the ~50-char window text) is the
  * shuffle key, which narrows the two exchanges to a 32-char column;
  * md5 is computed identically by both engines, so classification
  * agrees bit-for-bit.
  *
  * `q_domain_token_cap` is per-source quota sampling: each source
  * (domain) keeps documents in priority order (longest first,
  * doc_id tiebreak) while its running token total stays within
  * [[WebCorpus.CapTok]] — the greedy per-domain budget that keeps a
  * handful of mega-domains from dominating a crawl mix. One window
  * partitioned BY SOURCE (parallel across domains, never a global
  * sort), one groupBy, one broadcast-size join of the |sources|-row
  * aggregates. Scale assumption, stated plainly (r11 watch item 2
  * corrected an over-claim here): a window partition is ONE task —
  * AQE can split skewed *shuffle* partitions between stages but never
  * the partition of a running window — so a mega-domain sorts and
  * prefix-sums on a single task, spilling if it outgrows memory. That
  * is acceptable exactly when per-domain doc counts are bounded (true
  * of crawl domains after the usual per-host crawl budget); a corpus
  * with an unbounded hot domain should instead restate the running
  * total as the two-phase distributed prefix sum `Packing.scala` uses
  * for `q_sequence_pack` (per-partition partials + broadcast offsets),
  * which trades the single-task sort for two linear passes. All
  * outputs are exact BIGINTs / floor divisions, so the oracle
  * hash-matches.
  */
object WebCorpus {

  /** Tokens per substring window (the dedup granularity). */
  val WinTok = 8

  /** Per-source token budget for the quota cap. */
  val CapTok = 2000L

  // ================= substring-level duplication =================

  /** Positional window relation (doc_id, wh=md5(window text)); one row
    * per window POSITION — within-doc repeats count every occurrence,
    * which is what the duplicated-fraction metric wants.
    */
  private def winCore(d: SqlDialect): String = d match {
    case SparkSql => s"""
win AS (SELECT doc_id,
               explode(transform(sequence(1, size(w) - ${WinTok - 1}),
                 i -> md5(concat_ws(' ', slice(w, i, $WinTok))))) AS wh
        FROM (SELECT doc_id, split(text, ' ') AS w FROM documents
              WHERE size(split(text, ' ')) >= $WinTok))"""
    case DuckSql => s"""
dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents),
dwf AS (SELECT doc_id, w, ${d.len("w")} AS nw FROM dw WHERE ${d.len("w")} >= $WinTok),
idx AS (${d.series("doc_id, w", s"nw - ${WinTok - 1}", "i", "dwf")}),
win AS (SELECT doc_id, md5(concat_ws(' ', ${(0 until WinTok).map(k => d.el("w", s"i + $k")).mkString(", ")})) AS wh
        FROM idx)"""
  }

  private def substringDupSql(d: SqlDialect): String = s"""
WITH ${winCore(d)},
wd AS (SELECT wh FROM (SELECT wh, count(DISTINCT doc_id) AS nd
                       FROM win GROUP BY wh) g WHERE nd >= 2),
per AS (SELECT w.doc_id, count(*) AS n_windows,
               CAST(sum(CASE WHEN wd.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
        FROM win w LEFT JOIN wd ON w.wh = wd.wh
        GROUP BY w.doc_id)
SELECT doc_id, n_windows, n_dup_windows,
       ${d.idiv("10000 * n_dup_windows", "n_windows")} AS dup_bp
FROM per
ORDER BY doc_id"""

  /** Spark side over a cached window stage: the window relation feeds
    * both the distinct-doc count and the flag join (two mentions — the
    * StageViews reason), and the duplicated-window set `wd` is grouped
    * to one row per hash, so the LEFT JOIN cannot fan out.
    */
  private[graft] def substringDupOn(spark: SparkSession, key: String,
      docs: => DataFrame): DataFrame = {
    StageViews.ensure(spark, "documents", key)(StageViews.widen(spark, docs, "doc_id"))
    StageViews.ensureCached(spark, "win_v", key)(spark.sql(
      s"WITH ${winCore(SparkSql)} SELECT doc_id, wh FROM win"))
    spark.sql(s"""
SELECT doc_id, n_windows, n_dup_windows,
       (10000 * n_dup_windows) DIV n_windows AS dup_bp
FROM (SELECT w.doc_id, count(*) AS n_windows,
             CAST(sum(CASE WHEN wd.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
      FROM win_v w
      LEFT JOIN (SELECT wh FROM (SELECT wh, count(DISTINCT doc_id) AS nd
                                 FROM win_v GROUP BY wh) g WHERE nd >= 2) wd
        ON w.wh = wd.wh
      GROUP BY w.doc_id)
ORDER BY doc_id""")
  }

  val qSubstringDup = Q(
    "q_substring_dup",
    (spark, dir) => substringDupOn(spark, dir, Tables.documents(spark, dir)),
    Some(substringDupSql(DuckSql)))

  // ================= per-source token quota =================

  private def domainCapSql(d: SqlDialect, rel: String = "documents"): String = s"""
WITH tok AS (SELECT doc_id, source,
                    CAST(${d.len(d.split("text"))} AS BIGINT) AS n_tok
             FROM $rel),
ord AS (SELECT doc_id, source, n_tok,
               CAST(sum(n_tok) OVER (PARTITION BY source
                                     ORDER BY n_tok DESC, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        FROM tok),
kept AS (SELECT source, count(*) AS n_kept,
                CAST(sum(n_tok) AS BIGINT) AS kept_tok
         FROM ord WHERE cum_tok <= $CapTok GROUP BY source),
tot AS (SELECT source, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tok
        FROM tok GROUP BY source)
SELECT t.source, t.n_docs, t.total_tok,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.kept_tok, 0) AS BIGINT) AS kept_tok,
       ${d.idiv("10000 * CAST(coalesce(k.kept_tok, 0) AS BIGINT)", "t.total_tok")} AS kept_bp
FROM tot t LEFT JOIN kept k ON t.source = k.source
ORDER BY t.source"""

  /** Spark side: the narrow (doc_id, source, n_tok) relation is cached
    * once (two consumers: the quota window and the per-source totals),
    * so the wide text column is scanned exactly once. `budget`
    * parameterized for the monotonicity law test (the catalog query
    * pins [[CapTok]]).
    */
  private[graft] def domainCapOn(spark: SparkSession, key: String,
      docs: => DataFrame, budget: Long = CapTok): DataFrame = {
    StageViews.ensure(spark, "documents", key)(StageViews.widen(spark, docs, "doc_id"))
    StageViews.ensureCached(spark, "dct_v", key)(spark.sql(
      "SELECT doc_id, source, CAST(size(split(text, ' ')) AS BIGINT) AS n_tok FROM documents"))
    spark.sql(s"""
SELECT t.source, t.n_docs, t.total_tok,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.kept_tok, 0) AS BIGINT) AS kept_tok,
       (10000 * CAST(coalesce(k.kept_tok, 0) AS BIGINT)) DIV t.total_tok AS kept_bp
FROM (SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tok
      FROM dct_v GROUP BY source) t
LEFT JOIN (SELECT source, count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS kept_tok
           FROM (SELECT source, n_tok,
                        sum(n_tok) OVER (PARTITION BY source
                                         ORDER BY n_tok DESC, doc_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
                 FROM dct_v)
           WHERE cum_tok <= $budget GROUP BY source) k
  ON t.source = k.source
ORDER BY t.source""")
  }

  val qDomainCap = Q(
    "q_domain_token_cap",
    (spark, dir) => domainCapOn(spark, dir, Tables.documents(spark, dir)),
    Some(domainCapSql(DuckSql)))

  val all: Seq[Q] = Seq(qSubstringDup, qDomainCap)
}
