package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Composed corpus-cleaning decisions — the "run your whole cleaning
  * pipeline as one query" surface an LLM-data user actually executes:
  * per document, the quality gate (length + stopword evidence), the
  * repetition gate (duplicate-5-gram ratio), exact-duplicate
  * canonicalization (keep the lowest doc_id per identical text), and
  * the conjunction as the final keep decision, with every reason
  * emitted so drops are auditable.
  *
  * Also: PII detection/redaction counts (emails, URLs) over a corpus
  * with deterministically injected PII — the driver corpus is clean, so
  * the query plants synthetic addresses first (same trick as the
  * cleaning chain's injected infs) and the oracle must find exactly
  * those.
  *
  * Scale: the quality and PII stages are shuffle-free scans; repetition
  * reuses the dedup family's cached shingle aggregate; canonicalization
  * is one window over the text hash (at 100 TB: hash-partition by
  * md5(text), which also co-locates the exact-dedup groupBy).
  */
object CorpusFilter {

  private def filterSql(d: SqlDialect): String = {
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    val (nWords, nStop) = d match {
      case SparkSql => (
        "size(split(text, ' '))",
        s"size(filter(split(text, ' '), x -> x IN $stop))")
      case DuckSql => (
        s"${d.len(d.split("text"))}",
        s"${d.len(s"list_filter(${d.split("text")}, x -> x IN $stop)")}")
    }
    s"""
WITH ${Dedup.shingleCore(d)},
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
q AS (SELECT doc_id, text, $nWords AS n_words, $nStop AS n_stop FROM documents),
r AS (SELECT q.doc_id,
             greatest(q.n_words - 4, 0) AS total_grams,
             coalesce(sz.nsh, 0) AS distinct_grams
      FROM q LEFT JOIN sz ON q.doc_id = sz.doc_id),
c AS (SELECT doc_id, (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS is_canonical
      FROM documents)
SELECT q.doc_id,
       (q.n_words >= 40 AND q.n_stop > 0) AS pass_quality,
       (r.total_grams > 0 AND
        CAST(r.total_grams - r.distinct_grams AS DOUBLE) / CAST(r.total_grams AS DOUBLE) <= CAST(0.2 AS DOUBLE)) AS pass_repetition,
       c.is_canonical,
       ((q.n_words >= 40 AND q.n_stop > 0)
        AND (r.total_grams > 0 AND
             CAST(r.total_grams - r.distinct_grams AS DOUBLE) / CAST(r.total_grams AS DOUBLE) <= CAST(0.2 AS DOUBLE))
        AND c.is_canonical) AS keep
FROM q JOIN r ON q.doc_id = r.doc_id JOIN c ON q.doc_id = c.doc_id
ORDER BY q.doc_id"""
  }

  val qFilter = Q(
    "q_corpus_filter",
    (spark, dir) => {
      Dedup.ensureShingles(spark, dir, graft.Tables.documents(spark, dir))
      // same decision SQL, but the repetition input reads the session's
      // cached shingle aggregate instead of re-deriving it
      val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
      spark.sql(s"""
SELECT q.doc_id,
       (q.n_words >= 40 AND q.n_stop > 0) AS pass_quality,
       (r.total_grams > 0 AND
        CAST(r.total_grams - r.distinct_grams AS DOUBLE) / CAST(r.total_grams AS DOUBLE) <= CAST(0.2 AS DOUBLE)) AS pass_repetition,
       c.is_canonical,
       ((q.n_words >= 40 AND q.n_stop > 0)
        AND (r.total_grams > 0 AND
             CAST(r.total_grams - r.distinct_grams AS DOUBLE) / CAST(r.total_grams AS DOUBLE) <= CAST(0.2 AS DOUBLE))
        AND c.is_canonical) AS keep
FROM (SELECT doc_id, size(split(text, ' ')) AS n_words,
             size(filter(split(text, ' '), x -> x IN $stop)) AS n_stop
      FROM documents) q
JOIN (SELECT d.doc_id, greatest(size(split(d.text, ' ')) - 4, 0) AS total_grams,
             coalesce(sz.nsh, 0) AS distinct_grams
      FROM documents d LEFT JOIN sz_v sz ON d.doc_id = sz.doc_id) r
  ON q.doc_id = r.doc_id
JOIN (SELECT doc_id, (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS is_canonical
      FROM documents) c
  ON q.doc_id = c.doc_id
ORDER BY q.doc_id""")
    },
    Some(filterSql(DuckSql)))

  /** Email/URL detection + redaction over deterministically planted
    * PII. Patterns stay in the regex subset Java regex and RE2 agree
    * on (char classes, +, literal dot); DuckDB's regexp_replace needs
    * the explicit 'g' flag for global behavior (Spark is global by
    * default).
    */
  private def piiSql(d: SqlDialect): String = {
    val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    val url = "https?://[a-z0-9./]+"
    val (nEmail, nUrl, redact) = d match {
      case SparkSql => (
        s"size(regexp_extract_all(body, '$email', 0))",
        s"size(regexp_extract_all(body, '$url', 0))",
        s"regexp_replace(regexp_replace(body, '$email', '<EMAIL>'), '$url', '<URL>')")
      case DuckSql => (
        s"len(regexp_extract_all(body, '$email'))",
        s"len(regexp_extract_all(body, '$url'))",
        s"regexp_replace(regexp_replace(body, '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g')")
    }
    s"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS STRING) || '@example.com now'
              WHEN doc_id % 11 = 0
              THEN text || ' see https://example.com/d/' || CAST(doc_id AS STRING) || ' too'
              ELSE text END AS body
  FROM documents)
SELECT doc_id,
       CAST($nEmail AS BIGINT) AS n_emails,
       CAST($nUrl AS BIGINT) AS n_urls,
       length($redact) AS redacted_len,
       md5($redact) AS redacted_md5
FROM planted
ORDER BY doc_id"""
  }

  val qPii = Q(
    "q_pii_scrub",
    (spark, dir) => {
      StageViews.documents(spark, dir)
      spark.sql(piiSql(SparkSql))
    },
    Some(piiSql(DuckSql)))

  /** Benchmark decontamination: for every training document, the
    * fraction of its word-5-grams that appear ANYWHERE in the
    * benchmark set (docs with doc_id % 10 = 0 stand in for the eval
    * suite), and the drop decision at the standard ≥ 0.5 overlap
    * threshold. Unlike the dedup family's self-join, this is the
    * asymmetric shape real pipelines run: the benchmark n-gram set is
    * small and broadcast — the training corpus never shuffles, at any
    * scale. Reuses the session's cached shingle relation for both
    * sides.
    */
  private def decontaminateSql(d: SqlDialect): String = s"""
WITH ${Dedup.shingleCore(d)},
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
hits AS (SELECT s.doc_id, count(*) AS n_hit
         FROM sh s JOIN bench b ON s.shingle = b.shingle
         WHERE s.doc_id % 10 <> 0
         GROUP BY s.doc_id)
SELECT z.doc_id,
       coalesce(h.n_hit, 0) AS contaminated_grams,
       z.nsh AS total_grams,
       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(z.nsh AS DOUBLE) AS overlap_ratio,
       (CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(z.nsh AS DOUBLE) >= CAST(0.5 AS DOUBLE)) AS drop_contaminated
FROM sz z LEFT JOIN hits h ON z.doc_id = h.doc_id
WHERE z.doc_id % 10 <> 0
ORDER BY z.doc_id"""

  val qDecontaminate = Q(
    "q_decontaminate",
    (spark, dir) => {
      Dedup.ensureShingles(spark, dir, graft.Tables.documents(spark, dir))
      spark.sql("""
SELECT z.doc_id,
       coalesce(h.n_hit, 0) AS contaminated_grams,
       z.nsh AS total_grams,
       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(z.nsh AS DOUBLE) AS overlap_ratio,
       (CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(z.nsh AS DOUBLE) >= CAST(0.5 AS DOUBLE)) AS drop_contaminated
FROM sz_v z
LEFT JOIN (SELECT /*+ BROADCAST(b) */ s.doc_id, count(*) AS n_hit
           FROM sh_v s
           JOIN (SELECT DISTINCT shingle FROM sh_v WHERE doc_id % 10 = 0) b
             ON s.shingle = b.shingle
           WHERE s.doc_id % 10 <> 0
           GROUP BY s.doc_id) h
  ON z.doc_id = h.doc_id
WHERE z.doc_id % 10 <> 0
ORDER BY z.doc_id""")
    },
    Some(decontaminateSql(DuckSql)))

  /** Capture-group extraction (`regexp_extract(str, pat, 1)`): pull
    * the DOMAIN out of deterministically planted emails and aggregate
    * per domain — the structured-field-from-text step (log mining,
    * URL/host attribution) the `regexp_extract_all` counter above
    * doesn't gate. Spark and DuckDB share the 3-arg signature; the
    * planted filter keeps no-match semantics (engine-specific
    * empty-vs-null) out of the compare. Shuffle profile: scan +
    * 5-value hash agg.
    */
  private def regexExtractSql(d: SqlDialect): String = {
    val pat = "[a-z0-9]+@([a-z0-9]+)\\.com"
    s"""
WITH planted AS (
  SELECT doc_id,
         text || ' from user' || CAST(doc_id AS STRING)
              || '@host' || CAST(doc_id % 5 AS STRING) || '.com' AS body
  FROM documents WHERE doc_id % 7 = 0)
SELECT regexp_extract(body, '$pat', 1) AS domain,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM planted
GROUP BY regexp_extract(body, '$pat', 1)
ORDER BY domain"""
  }

  val qRegexExtract = Q(
    "q_regex_extract",
    (spark, dir) => {
      StageViews.documents(spark, dir)
      spark.sql(regexExtractSql(SparkSql))
    },
    Some(regexExtractSql(DuckSql)))

  /** The whole LLM corpus build as ONE oracle-gated query: LSH
    * near-dup clusters → keep each cluster's canonical doc → quality
    * gate (≥30 tokens) → overlapping token chunks → per-source corpus
    * stats. The Spark side composes the engine operators (banded
    * minhash, distributed/local connected components, the chunk
    * fan-out); DuckDB re-derives the identical corpus from scratch via
    * the recursive-CTE fixpoint — so the END-TO-END pipeline, not just
    * its stages, hash-matches.
    *
    * Scale shape: the dedup family's one-shuffle-per-stage candidate
    * joins, then CC over verified pairs only, then a narrow chunk
    * fan-out over the surviving docs — the exact production sequence,
    * with every intermediate reused from the shared stage cache.
    */
  private val MinTokens = 30

  private def corpusBuildOracle: String = {
    val d: SqlDialect = DuckSql
    val (nTokens, _) = TextAnalysis.chunkExprs(d)
    s"""
WITH RECURSIVE ${Dedup.clusterCtes(d)},
kept_docs AS (
  SELECT doc.doc_id, doc.text, doc.source
  FROM documents doc JOIN comp ON doc.doc_id = comp.doc_id
  WHERE comp.cluster_rep = doc.doc_id
    AND ${d.len(d.split("doc.text"))} >= $MinTokens),
${TextAnalysis.chunkCtes(d, "kept_docs")}
SELECT s.source, count(DISTINCT ch_ck.doc_id) AS n_docs, count(*) AS n_chunks,
       CAST(sum($nTokens) AS BIGINT) AS total_tokens
FROM ch_ck JOIN kept_docs s ON ch_ck.doc_id = s.doc_id
GROUP BY s.source ORDER BY s.source"""
  }

  val qCorpusBuild = Q(
    "q_corpus_build",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      val comp = Dedup.clusterAssignments(spark, dir, graft.Tables.documents(spark, dir))
      val kept = spark.table("documents")
        .join(comp, "doc_id")
        .where(col("cluster_rep") === col("doc_id") &&
          size(split(col("text"), " ")) >= MinTokens)
        .select(col("doc_id"), col("text"), col("source"))
      kept.createOrReplaceTempView("kept_docs")
      val (nTokens, _) = TextAnalysis.chunkExprs(SparkSql)
      spark.sql(s"""
WITH ${TextAnalysis.chunkCtes(SparkSql, "kept_docs")}
SELECT s.source, count(DISTINCT ch_ck.doc_id) AS n_docs, count(*) AS n_chunks,
       CAST(sum($nTokens) AS BIGINT) AS total_tokens
FROM ch_ck JOIN kept_docs s ON ch_ck.doc_id = s.doc_id
GROUP BY s.source ORDER BY s.source""")
    },
    Some(corpusBuildOracle))

  // ---- DSIR data selection (hashed-ngram importance weights) ----

  /** Hashed-feature bucket count (the paper's 10k scaled to this
    * corpus's vocabulary; any power works — collisions just coarsen
    * the estimate identically in both engines).
    */
  val DsirBuckets = 256
  /** The target-distribution stand-in: documents in this language. */
  val DsirTargetLang = "en"

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by the log-likelihood ratio of its hashed unigram features under
    * the TARGET distribution (here the '$DsirTargetLang' sub-corpus)
    * vs the RAW distribution (the whole corpus) — the standard recipe
    * for selecting web text that "looks like" a curated target set.
    *
    *   w(doc) = Σ_tokens [ log p̂_t(b(tok)) − log p̂_r(b(tok)) ]
    *
    * with Laplace-smoothed bucket probabilities p̂(b) = (n_b+1)/(N+B).
    * The log is [[SqlLog.log2x16]] — 1/16-bit fixed-point base-2,
    * exact BIGINT arithmetic — so both engines agree bit-for-bit where
    * a libm log would not, and the REDUCTION LAW holds exactly: if the
    * target equals the raw corpus, every bucket's ratio term cancels
    * and every document scores 0 (the spec pins it).
    *
    * Scale shape: ONE corpus-sized explode+groupBy builds the
    * per-(doc, bucket) count relation (staged on the Spark side, like
    * the BM25 postings); bucket stats aggregate it to [[DsirBuckets]]
    * rows, the per-bucket scores broadcast back, and the final per-doc
    * sum is a map-side-combinable groupBy. Nothing downstream of the
    * staged relation is corpus×corpus.
    */
  private def dsirOccurrences(d: SqlDialect): String = d match {
    case SparkSql =>
      "SELECT doc_id, lang, explode(split(text, ' ')) AS term FROM documents"
    case DuckSql => s"""
SELECT doc_id, lang, ${d.el("w", "i")} AS term
FROM (${d.series("doc_id, lang, w", d.len("w"), "i",
      s"(SELECT doc_id, lang, ${d.split("text")} AS w FROM documents) dw")})"""
  }

  private[operators] def dsirDtbSql(d: SqlDialect): String = s"""
SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS cnt FROM
  (SELECT doc_id, lang,
          (${SqlHash.hex32(d, "md5(term)", 1)}) % $DsirBuckets AS b
   FROM (${dsirOccurrences(d)}) occ) ob
GROUP BY doc_id, lang, b"""

  private def dsirBody(d: SqlDialect, dtb: String): String = {
    def L(x: String) = SqlLog.log2x16(d, x)
    s"""
bs AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS r_b,
              CAST(sum(CASE WHEN lang = '$DsirTargetLang' THEN cnt ELSE 0 END) AS BIGINT) AS t_b
       FROM $dtb GROUP BY b),
tot AS (SELECT CAST(sum(r_b) + $DsirBuckets AS BIGINT) AS rn,
               CAST(sum(t_b) + $DsirBuckets AS BIGINT) AS tn
        FROM bs),
sb AS (SELECT b,
              CAST((${L("bs.t_b + 1")}) - (${L("bs.r_b + 1")})
                   + (${L("tot.rn")}) - (${L("tot.tn")}) AS BIGINT) AS s16
       FROM bs CROSS JOIN tot)
SELECT t.doc_id, t.lang, CAST(sum(t.cnt) AS BIGINT) AS n_tok,
       CAST(sum(t.cnt * sb.s16) AS BIGINT) AS dsir_w16
FROM $dtb t JOIN sb ON t.b = sb.b
GROUP BY t.doc_id, t.lang
ORDER BY t.doc_id"""
  }

  /** Self-contained spelling — the DuckDB oracle and the spec twin. */
  private def dsirSql(d: SqlDialect): String = s"""
WITH dtb AS (${dsirDtbSql(d)}),
${dsirBody(d, "dtb")}"""

  private[graft] def dsirSparkSqlForTest: String = dsirSql(SparkSql)

  private def runDsir(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    StageViews.documents(spark, dir)
    // the one corpus-sized relation, read by the stats build AND the
    // scoring join
    StageViews.ensureCached(spark, "dsir_dtb_v", dir)(
      spark.sql(dsirDtbSql(SparkSql)))
    // nested spelling (no WITH): cache substitution does not reach CTE
    // bodies, so the WITH spelling re-ran the corpus explode per
    // mention of the staged relation
    val d = SparkSql
    def L(x: String) = SqlLog.log2x16(d, x)
    spark.sql(s"""
SELECT t.doc_id, t.lang, CAST(sum(t.cnt) AS BIGINT) AS n_tok,
       CAST(sum(t.cnt * sb.s16) AS BIGINT) AS dsir_w16
FROM dsir_dtb_v t
JOIN (SELECT bs.b,
             CAST((${L("bs.t_b + 1")}) - (${L("bs.r_b + 1")})
                  + (${L("tot.rn")}) - (${L("tot.tn")}) AS BIGINT) AS s16
      FROM (SELECT b, CAST(sum(cnt) AS BIGINT) AS r_b,
                   CAST(sum(CASE WHEN lang = '$DsirTargetLang' THEN cnt ELSE 0 END) AS BIGINT) AS t_b
            FROM dsir_dtb_v GROUP BY b) bs
      CROSS JOIN (SELECT CAST(sum(cnt) + $DsirBuckets AS BIGINT) AS rn,
                         CAST(sum(CASE WHEN lang = '$DsirTargetLang' THEN cnt ELSE 0 END) + $DsirBuckets AS BIGINT) AS tn
                  FROM dsir_dtb_v) tot) sb
  ON t.b = sb.b
GROUP BY t.doc_id, t.lang
ORDER BY t.doc_id""")
  }

  val qDsir = Q("q_dsir_weights", runDsir _, Some(dsirSql(DuckSql)))

  val all: Seq[Q] = Seq(qFilter, qPii, qDecontaminate, qRegexExtract,
    qCorpusBuild, qDsir)
}
