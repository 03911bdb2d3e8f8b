package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators for the training-data pipeline: n-gram
  * language ID, quality scoring, token counting, and document
  * fingerprinting — each over the `documents` table with a DuckDB
  * oracle from the same SQL template.
  *
  * Scale: langid builds per-language char-bigram profiles with one
  * aggregation over the corpus (a broadcastable ~langs×20 table) and
  * scores documents with a semi-join against it; quality/token/
  * fingerprint are narrow per-row projections or single groupBys.
  */
object TextAnalysis {

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql(sql)
  }

  // ---- language ID (Cavnar-Trenkle-style char-bigram profiles) ----

  private def dbCore(d: SqlDialect): String = s"""
docs AS (SELECT doc_id, lang, text, length(text) AS nc FROM documents),
bg AS (${d.series("doc_id, lang, text", "nc - 1", "i", "docs")}),
bigr AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 2) AS bigram FROM bg),
db AS (SELECT DISTINCT doc_id, lang, bigram FROM bigr)"""

  private def langidSql(d: SqlDialect): String = {
    // db feeds both the profiles and the scoring join; Spark reads the
    // cached materialization (CTEs are inlined per reference)
    val head = d match {
      case SparkSql => "docs AS (SELECT doc_id, lang FROM documents),\ndb AS (SELECT doc_id, lang, bigram FROM db_v),"
      case DuckSql  => s"${dbCore(d)},"
    }
    s"""
WITH $head
-- per-language profile: top-20 bigrams by document frequency
prof0 AS (SELECT lang, bigram, count(*) AS n FROM db GROUP BY lang, bigram),
prof AS (SELECT lang, bigram,
                ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS r
         FROM prof0),
top AS (SELECT lang AS plang, bigram FROM prof WHERE r <= 20),
score AS (SELECT db.doc_id, top.plang, count(*) AS hits
          FROM db JOIN top ON db.bigram = top.bigram
          GROUP BY db.doc_id, top.plang),
best AS (SELECT doc_id, plang, hits,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, plang) AS r
         FROM score)
SELECT d.doc_id, d.lang AS actual_lang, b.plang AS predicted_lang, b.hits
FROM docs d JOIN best b ON d.doc_id = b.doc_id AND b.r = 1
ORDER BY d.doc_id"""
  }

  private def runWithBigrams(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val db = spark.sql(s"WITH ${dbCore(SparkSql)} SELECT doc_id, lang, bigram FROM db")
    db.cache().createOrReplaceTempView("db_v")
    spark.sql(sql)
  }

  val qLangId = Q("q_text_langid", runWithBigrams(langidSql(SparkSql)), Some(langidSql(DuckSql)))

  // ---- quality scoring ----

  private def qualitySql(d: SqlDialect): String = {
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    // DuckDB regexp_replace is first-match-only without the 'g' flag;
    // Spark's is global by default
    val stripNonAlpha = d match {
      case SparkSql => "regexp_replace(text, '[^a-z]', '')"
      case DuckSql  => "regexp_replace(text, '[^a-z]', '', 'g')"
    }
    s"""
WITH dw AS (SELECT doc_id, lang, n_chars, ${d.split("text")} AS w, text FROM documents),
m AS (SELECT doc_id, lang, n_chars, ${d.len("w")} AS n_words,
             length($stripNonAlpha) AS n_alpha,
             length(text) AS n_all
      FROM dw),
sw AS (${d.series("doc_id, w", s"${d.len("w")}", "i", "dw")}),
swc AS (SELECT doc_id, sum(CASE WHEN ${d.el("w", "i")} IN $stop THEN 1 ELSE 0 END) AS n_stop
        FROM sw GROUP BY doc_id)
SELECT m.doc_id, m.lang, m.n_words,
       CAST(m.n_alpha AS DOUBLE) / CAST(m.n_all AS DOUBLE) AS alpha_ratio,
       CAST(swc.n_stop AS DOUBLE) / CAST(m.n_words AS DOUBLE) AS stopword_ratio,
       CAST(m.n_chars AS DOUBLE) / CAST(m.n_words AS DOUBLE) AS chars_per_word,
       CASE WHEN m.n_words >= 40 AND swc.n_stop > 0 THEN 'keep'
            WHEN m.n_words >= 20 THEN 'review'
            ELSE 'drop' END AS quality_band
FROM m JOIN swc ON m.doc_id = swc.doc_id
ORDER BY m.doc_id"""
  }

  val qQuality = Q("q_text_quality", run(qualitySql(SparkSql)), Some(qualitySql(DuckSql)))

  // ---- token counting (whitespace + regex + bytes-per-token estimate) ----

  private def tokensSql(d: SqlDialect): String = {
    val reTok = d match {
      case SparkSql => "size(regexp_extract_all(text, '[a-z0-9]+', 0))"
      case DuckSql  => "len(regexp_extract_all(text, '[a-z0-9]+'))"
    }
    s"""
SELECT doc_id,
       ${d.len(d.split("text"))} AS ws_tokens,
       CAST($reTok AS BIGINT) AS re_tokens,
       CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe_tokens,
       CAST(n_chars AS DOUBLE) / CAST(${d.len(d.split("text"))} AS DOUBLE) AS chars_per_token
FROM documents
ORDER BY doc_id"""
  }

  val qTokens = Q("q_text_tokens", run(tokensSql(SparkSql)), Some(tokensSql(DuckSql)))

  // ---- document fingerprint (min-hash of word 5-grams, 2 seeds) ----

  private def fingerprintSql(d: SqlDialect): String = s"""
WITH dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents),
dwf AS (SELECT doc_id, w, ${d.len("w")} AS nw FROM dw WHERE ${d.len("w")} >= 5),
idx AS (${d.series("doc_id, w", "nw - 4", "i", "dwf")}),
sh AS (SELECT DISTINCT doc_id, concat_ws(' ', ${(0 to 4).map(k => d.el("w", s"i + $k")).mkString(", ")}) AS shingle FROM idx)
SELECT doc_id,
       min(md5('1:' || shingle)) AS fp1,
       min(md5('2:' || shingle)) AS fp2,
       count(*) AS n_shingles
FROM sh GROUP BY doc_id
ORDER BY doc_id"""

  val qFingerprint = Q("q_text_fingerprint", run(fingerprintSql(SparkSql)), Some(fingerprintSql(DuckSql)))

  val all: Seq[Q] = Seq(qLangId, qQuality, qTokens, qFingerprint)
}
