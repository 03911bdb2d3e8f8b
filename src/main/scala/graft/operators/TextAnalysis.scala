package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators for the training-data pipeline: n-gram
  * language ID, quality scoring, token counting, and document
  * fingerprinting — each over the `documents` table with a DuckDB
  * oracle stating the same computation.
  *
  * Scale: langid builds per-language char-bigram profiles with one
  * aggregation over the corpus (a broadcast ~langs×20 table) and scores
  * documents with a broadcast join against it; quality/token are narrow
  * per-row projections or single groupBys; fingerprint reuses the
  * cached shingle relation shared with the dedup family. The bigram
  * relation is cached once per corpus (see [[StageViews]] for why the
  * Spark side avoids WITH-CTE spellings on hot paths).
  */
object TextAnalysis {

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    spark.sql(sql)
  }

  // ---- language ID (Cavnar-Trenkle-style char-bigram profiles) ----

  /** Per-doc-distinct char bigrams. Spark dedupes map-side
    * (array_distinct over transform — no DISTINCT shuffle of the
    * ~chars-per-doc × corpus bigram relation); DuckDB keeps the
    * explode+DISTINCT spelling. Same set: dedup is per-document.
    */
  private def dbCore(d: SqlDialect): String = d match {
    case SparkSql => """
db AS (SELECT doc_id, lang,
              explode(array_distinct(transform(sequence(1, length(text) - 1),
                i -> substring(text, i, 2)))) AS bigram
       FROM documents WHERE length(text) >= 2)"""
    case DuckSql => s"""
docs AS (SELECT doc_id, lang, text, length(text) AS nc FROM documents),
bg AS (${d.series("doc_id, lang, text", "nc - 1", "i", "docs")}),
bigr AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 2) AS bigram FROM bg),
db AS (SELECT DISTINCT doc_id, lang, bigram FROM bigr)"""
  }

  /** Oracle rendering (DuckDB CTEs). */
  private def langidSql(d: SqlDialect): String = s"""
WITH ${dbCore(d)},
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
FROM (SELECT doc_id, lang FROM documents) d
JOIN best b ON d.doc_id = b.doc_id AND b.r = 1
ORDER BY d.doc_id"""

  /** Spark side: the cached bigram relation feeds both the profile
    * aggregation and the scoring join (two mentions — the reason it is
    * cached); the ~langs×20 profile table is broadcast so scoring needs
    * no shuffle of the bigram relation.
    */
  private def runLangid(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    StageViews.ensureCached(spark, "db_v", dir)(spark.sql(
      s"WITH ${dbCore(SparkSql)} SELECT doc_id, lang, bigram FROM db"))
    spark.sql("""
SELECT d.doc_id, d.lang AS actual_lang, b.plang AS predicted_lang, b.hits
FROM (SELECT doc_id, lang FROM documents) d
JOIN (SELECT doc_id, plang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, plang) AS r
      FROM (SELECT /*+ BROADCAST(top) */ db.doc_id, top.plang, count(*) AS hits
            FROM db_v db
            JOIN (SELECT lang AS plang, bigram
                  FROM (SELECT lang, bigram,
                               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS r
                        FROM (SELECT lang, bigram, count(*) AS n FROM db_v GROUP BY lang, bigram))
                  WHERE r <= 20) top
              ON db.bigram = top.bigram
            GROUP BY db.doc_id, top.plang)) b
  ON d.doc_id = b.doc_id AND b.r = 1
ORDER BY d.doc_id""")
  }

  val qLangId = Q("q_text_langid", runLangid _, Some(langidSql(DuckSql)))

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

  /** Spark side: one narrow projection per document — the stopword
    * count folds map-side with a size(filter(...)) HOF instead of an
    * explode + groupBy + join back, so the whole query is a single
    * shuffle-free scan plus the final sort.
    */
  private def qualitySparkSql: String = {
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    s"""
SELECT doc_id, lang, size(w) AS n_words,
       CAST(length(regexp_replace(text, '[^a-z]', '')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS alpha_ratio,
       CAST(size(filter(w, x -> x IN $stop)) AS DOUBLE) / CAST(size(w) AS DOUBLE) AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / CAST(size(w) AS DOUBLE) AS chars_per_word,
       CASE WHEN size(w) >= 40 AND size(filter(w, x -> x IN $stop)) > 0 THEN 'keep'
            WHEN size(w) >= 20 THEN 'review'
            ELSE 'drop' END AS quality_band
FROM (SELECT doc_id, lang, n_chars, text, split(text, ' ') AS w FROM documents)
ORDER BY doc_id"""
  }

  val qQuality = Q("q_text_quality", run(qualitySparkSql), Some(qualitySql(DuckSql)))

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

  // ---- BPE-ish subword tokenization (pretokenizer regex + greedy merges) ----

  /** Subword token accounting one level closer to a production BPE
    * tokenizer than [[qTokens]]'s chars/4 estimate: a GPT-2-style
    * PRETOKENIZER regex first cuts text into word / number / punctuation
    * runs (each with its leading space, exactly like the GPT-2 pattern —
    * spelled WITHOUT lookahead so Java regex and RE2 agree), then each
    * pretoken contributes ⌈len/4⌉ subword pieces — a greedy fixed-width
    * stand-in for learned BPE merges that keeps the count deterministic
    * and engine-portable (a real merge table is model data, not an
    * operator). The corpus is lowercase-word-only, so digits and
    * punctuation are planted deterministically per doc_id (the
    * q_pii_scrub trick) and the class counts must find exactly those.
    *
    * The pretokenization is LOSSLESS (concatenating the pretokens
    * rebuilds the body — verified in Round9OpsSpec), which is the
    * property that makes per-class counts add up to the whole document.
    *
    * Scale: one narrow codegen'd projection per row — no explode, no
    * shuffle beyond the final sort; the regex runs once per document and
    * the piece fold is a map-side HOF over the extracted array.
    */
  /** The pretokenizer regex and the planted-body expression, shared by
    * the query template and Round9OpsSpec's losslessness law (the spec
    * must test the exact pattern the query runs, not a copy).
    */
  private[operators] val BpePretokenPattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
  private[operators] val BpePlantedBody: String =
    """text || CASE WHEN doc_id % 3 = 0 THEN ' v' || CAST(doc_id AS STRING) || '.2 (beta)!'
                    WHEN doc_id % 3 = 1 THEN ' costs $' || CAST(doc_id % 100 AS STRING) || '.99'
                    ELSE ' -- see notes #' || CAST(doc_id % 50 AS STRING) END"""

  private def bpeSql(d: SqlDialect): String = {
    val pat = BpePretokenPattern
    val toks = d match {
      case SparkSql => s"regexp_extract_all(body, '$pat', 0)"
      case DuckSql  => s"regexp_extract_all(body, '$pat')"
    }
    // first char of the trimmed pretoken decides its class; integer
    // ceil-division for the greedy piece count (never float ceil)
    val (nSub, nWord, nNum) = d match {
      case SparkSql => (
        s"aggregate(toks, CAST(0 AS BIGINT), (acc, t) -> acc + CAST(${SparkSql.idiv("length(trim(t)) + 3", "4")} AS BIGINT))",
        "size(filter(toks, t -> substring(trim(t), 1, 1) BETWEEN 'a' AND 'z'))",
        "size(filter(toks, t -> substring(trim(t), 1, 1) BETWEEN '0' AND '9'))")
      case DuckSql => (
        s"list_sum(list_transform(toks, t -> ${DuckSql.idiv("length(trim(t)) + 3", "4")}))",
        "len(list_filter(toks, t -> substr(trim(t), 1, 1) BETWEEN 'a' AND 'z'))",
        "len(list_filter(toks, t -> substr(trim(t), 1, 1) BETWEEN '0' AND '9'))")
    }
    s"""
WITH planted AS (
  SELECT doc_id, $BpePlantedBody AS body
  FROM documents),
tk AS (SELECT doc_id, length(body) AS n_chars_body, $toks AS toks FROM planted)
SELECT doc_id,
       CAST(${d.len("toks")} AS BIGINT) AS n_pretokens,
       CAST($nSub AS BIGINT) AS n_subpieces,
       CAST($nWord AS BIGINT) AS n_word_toks,
       CAST($nNum AS BIGINT) AS n_num_toks,
       CAST(${d.len("toks")} - ($nWord) - ($nNum) AS BIGINT) AS n_other_toks,
       CAST(n_chars_body AS DOUBLE) / CAST($nSub AS DOUBLE) AS chars_per_piece
FROM tk
ORDER BY doc_id"""
  }

  val qTokensBpe = Q("q_text_tokens_bpe", run(bpeSql(SparkSql)), Some(bpeSql(DuckSql)))

  // ---- winnowing fingerprint (rolling char-k-gram hashes + window minima) ----

  /** MOSS-style winnowing (Schleimer et al., SIGMOD '03) — the rolling-
    * hash fingerprinting scheme real plagiarism/near-dup scanners run:
    * hash every CHAR 8-gram at every position (the "rolling" hash — here
    * md5-derived per position, the one hash both engines share
    * bit-for-bit, see [[SqlHash.hex32]]), then slide a window of
    * [[WinnowWindow]] consecutive positions and keep each window's
    * MINIMUM hash. The guarantee: any shared substring of length ≥
    * 8 + [[WinnowWindow]] − 1 between two documents yields at least one
    * shared fingerprint. Output per doc: the selected-fingerprint count
    * and two exact integer digests of the fingerprint SET (min and sum —
    * order-free, BIGINT-exact), which is what a containment scanner
    * would index.
    *
    * Positions are capped at [[WinnowPosCap]] per document — the bound
    * that keeps the fan-out per row constant at any document length
    * (fingerprint-the-head; production scanners shard long docs into
    * bounded segments the same way). Scale shape: one bounded explode
    * (≤ cap rows/doc) clustered on doc_id, one PARTITIONED window (never
    * global), one distinct + aggregate — all on the doc_id key, so the
    * whole pipeline rides a single hash partitioning.
    */
  private val WinnowWindow = 4
  private val WinnowPosCap = 240

  /** CTE chain ending in `wsel` — the selected (doc_id, fingerprint)
    * set, also exposed to Round9OpsSpec via [[winnowFingerprintsOn]]
    * (the shared-substring guarantee is a law about this SET, which the
    * digest columns deliberately compress away).
    */
  private def winnowCore(d: SqlDialect): String = s"""wd AS (SELECT doc_id, text, least(length(text) - 7, $WinnowPosCap) AS np
            FROM documents WHERE length(text) >= 8),
wpos AS (${d.series("doc_id, text, np", "np", "i", "wd")}),
wkg AS (SELECT doc_id, np, i,
               ${SqlHash.hex32(d, "md5(substr(text, CAST(i AS INT), 8))", 1)} AS h
        FROM wpos),
wwin AS (SELECT doc_id, np, i,
                min(h) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN CURRENT ROW AND ${WinnowWindow - 1} FOLLOWING) AS wmin
         FROM wkg),
wsel AS (SELECT DISTINCT doc_id, wmin FROM wwin WHERE i <= np - ${WinnowWindow - 1})"""

  private def winnowSql(d: SqlDialect): String = s"""
WITH ${winnowCore(d)}
SELECT doc_id, count(*) AS n_fingerprints,
       min(wmin) AS fp_min, CAST(sum(wmin) AS BIGINT) AS fp_sum
FROM wsel GROUP BY doc_id
ORDER BY doc_id"""

  /** The raw selected-fingerprint set over an arbitrary documents frame
    * (spec seam for the winnowing guarantee).
    */
  private[graft] def winnowFingerprintsOn(spark: SparkSession, key: String,
      docs: => DataFrame): DataFrame = {
    StageViews.ensure(spark, "documents", key)(docs)
    spark.sql(s"WITH ${winnowCore(SparkSql)} SELECT doc_id, wmin FROM wsel")
  }

  val qWinnow = Q("q_text_winnow_fingerprint", run(winnowSql(SparkSql)), Some(winnowSql(DuckSql)))

  // ---- document fingerprint (min-hash of word 5-grams, 2 seeds) ----

  private def fingerprintSql(d: SqlDialect): String = s"""
WITH ${Dedup.shingleCore(d)}
SELECT doc_id,
       min(md5('1:' || shingle)) AS fp1,
       min(md5('2:' || shingle)) AS fp2,
       count(*) AS n_shingles
FROM sh GROUP BY doc_id
ORDER BY doc_id"""

  val qFingerprint = Q(
    "q_text_fingerprint",
    (spark, dir) => {
      // reuses the dedup family's cached shingle relation
      Dedup.ensureShingles(spark, dir, graft.Tables.documents(spark, dir))
      spark.sql("""
SELECT doc_id,
       min(md5('1:' || shingle)) AS fp1,
       min(md5('2:' || shingle)) AS fp2,
       count(*) AS n_shingles
FROM sh_v GROUP BY doc_id
ORDER BY doc_id""")
    },
    Some(fingerprintSql(DuckSql)))

  // ---- repetition scoring (duplicate-n-gram ratio, Gopher-style) ----

  /** Within-document repetition: 1 − distinct/total word-5-grams — the
    * classic repeated-n-gram quality filter for LLM corpora. The
    * distinct side is the SAME cached shingle aggregate the dedup
    * family builds (sz_v), so on a warm session this costs one narrow
    * projection and a tiny join; the total side is a length expression,
    * no explode. Ratio is a division of exact BIGINTs — bit-identical
    * across engines.
    */
  private def repetitionSql(d: SqlDialect): String = s"""
WITH ${Dedup.shingleCore(d)},
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
w AS (SELECT doc_id, greatest(${d.len(d.split("text"))} - 4, 0) AS total_grams FROM documents)
SELECT w.doc_id, w.total_grams, coalesce(sz.nsh, 0) AS distinct_grams,
       CASE WHEN w.total_grams > 0
            THEN CAST(w.total_grams - coalesce(sz.nsh, 0) AS DOUBLE) / CAST(w.total_grams AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END AS dup_gram_ratio,
       CASE WHEN w.total_grams = 0 THEN 'short'
            WHEN CAST(w.total_grams - coalesce(sz.nsh, 0) AS DOUBLE) / CAST(w.total_grams AS DOUBLE) > CAST(0.2 AS DOUBLE) THEN 'repetitive'
            ELSE 'ok' END AS repetition_band
FROM w LEFT JOIN sz ON w.doc_id = sz.doc_id
ORDER BY w.doc_id"""

  val qRepetition = Q(
    "q_text_repetition",
    (spark, dir) => {
      Dedup.ensureShingles(spark, dir, graft.Tables.documents(spark, dir))
      spark.sql(s"""
SELECT w.doc_id, w.total_grams, coalesce(sz.nsh, 0) AS distinct_grams,
       CASE WHEN w.total_grams > 0
            THEN CAST(w.total_grams - coalesce(sz.nsh, 0) AS DOUBLE) / CAST(w.total_grams AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END AS dup_gram_ratio,
       CASE WHEN w.total_grams = 0 THEN 'short'
            WHEN CAST(w.total_grams - coalesce(sz.nsh, 0) AS DOUBLE) / CAST(w.total_grams AS DOUBLE) > CAST(0.2 AS DOUBLE) THEN 'repetitive'
            ELSE 'ok' END AS repetition_band
FROM (SELECT doc_id, greatest(size(split(text, ' ')) - 4, 0) AS total_grams FROM documents) w
LEFT JOIN sz_v sz ON w.doc_id = sz.doc_id
ORDER BY w.doc_id""")
    },
    Some(repetitionSql(DuckSql)))

  // ---- corpus vocabulary coverage (top-k terms + cumulative mass) ----

  /** Vocabulary-design statistic: the top-200 terms by corpus frequency
    * (non-distinct token counts) with each rank's CUMULATIVE share of
    * all token mass in exact basis points — the curve that tells you
    * what vocab size buys what coverage. The cumulative window runs
    * over the top-200 relation only (cum mass at rank r needs exactly
    * the ranks above r), so the one unpartitioned window touches 200
    * rows regardless of corpus size; the global rank itself is a
    * WindowGroupLimit-able top-k over the term-count aggregate. Ties
    * break lexically for total determinism.
    */
  private val VocabTopK = 200

  private def vocabSql(d: SqlDialect): String = {
    val tkCte = d match {
      case SparkSql => "tk AS (SELECT explode(split(text, ' ')) AS t FROM documents)"
      case DuckSql => s"""dwv AS (SELECT ${d.split("text")} AS w, ${d.len(d.split("text"))} AS nw FROM documents),
tv AS (${d.series("w", "nw", "j", "dwv")}),
tk AS (SELECT ${d.el("w", "j")} AS t FROM tv)"""
    }
    s"""
WITH $tkCte,
tc AS (SELECT t, count(*) AS n FROM tk GROUP BY t),
tt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM tc),
rk AS (SELECT t, n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rnk FROM tc),
topk AS (SELECT * FROM rk WHERE rnk <= $VocabTopK),
cum AS (SELECT t, n, rnk,
               CAST(sum(n) OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        FROM topk)
SELECT CAST(rnk AS BIGINT) AS rnk, t AS term, CAST(n AS BIGINT) AS term_count,
       ${d.idiv("10000 * cum_n", "total")} AS coverage_bp
FROM cum, tt
ORDER BY rnk"""
  }

  val qVocab = Q("q_vocab_coverage", run(vocabSql(SparkSql)), Some(vocabSql(DuckSql)))

  // ---- per-source boilerplate shingles (CCNet-style) ----

  /** Within-source boilerplate detection: a 5-gram shingle present in
    * ≥30% of a source's documents (sources with ≥5 docs) is boilerplate
    * — the header/footer/navigation mass a per-SOURCE frequency test
    * catches but corpus-global stats miss (a template that is 30% of
    * one site is noise at corpus level). Emits each doc's shingle count
    * and boilerplate fraction in exact basis points; the integer
    * threshold `10·df ≥ 3·n_docs` avoids float ratios entirely. Docs
    * too short to shingle (<5 words) have no fraction and drop, as in
    * the other shingle-stage queries. Reuses the cached shingle stage;
    * the per-source DF aggregation shuffles the shingle relation once
    * on (source, shingle) and the boilerplate set is tiny (bounded by
    * template mass, not corpus size), so the rejoin broadcasts at
    * scale.
    */
  private def boilerTail(shRel: String, cap: String => String): String = s"""
${cap("meta")} AS (SELECT doc_id, source FROM documents),
${cap("ssh")} AS (SELECT m.source, s.doc_id, s.shingle
       FROM $shRel s JOIN ${cap("meta")} m ON s.doc_id = m.doc_id),
${cap("srcn")} AS (SELECT source, count(*) AS n_docs FROM ${cap("meta")} GROUP BY source),
${cap("bdf")} AS (SELECT source, shingle, count(*) AS df
      FROM ${cap("ssh")} GROUP BY source, shingle),
${cap("boiler")} AS (SELECT b.source, b.shingle
         FROM ${cap("bdf")} b JOIN ${cap("srcn")} n ON b.source = n.source
         WHERE 10 * b.df >= 3 * n.n_docs AND n.n_docs >= 5),
${cap("per_doc")} AS (SELECT s.doc_id, count(*) AS n_shingles,
                   CAST(sum(CASE WHEN bo.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
            FROM ${cap("ssh")} s
            LEFT JOIN ${cap("boiler")} bo
              ON s.source = bo.source AND s.shingle = bo.shingle
            GROUP BY s.doc_id)"""

  private def boilerSelect(d: SqlDialect, perDoc: String): String = s"""
SELECT doc_id, n_shingles, n_boiler,
       ${d.idiv("10000 * n_boiler", "n_shingles")} AS boiler_bp
FROM $perDoc
ORDER BY doc_id"""

  private def boilerplateSql(d: SqlDialect): String = s"""
WITH ${Dedup.shingleCore(d)},
${boilerTail("sh", identity)}
${boilerSelect(d, "per_doc")}"""

  private[graft] def boilerplateOn(spark: SparkSession, key: String,
      docs: => DataFrame): DataFrame = {
      // DataFrame spelling over the cached stage views — a WITH-CTE
      // reference to sh_v would replan past the cache (StageViews note)
      import org.apache.spark.sql.functions._
      import spark.implicits._
      Dedup.ensureShingles(spark, key, docs)
      val meta = spark.table("documents").select($"doc_id", $"source")
      val ssh = spark.table("sh_v").join(meta, "doc_id")
        .select($"source", $"doc_id", $"shingle")
      val srcn = meta.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      val boiler = ssh.groupBy($"source", $"shingle").agg(count(lit(1)).as("df"))
        .join(broadcast(srcn), "source")
        .where(lit(10) * $"df" >= lit(3) * $"n_docs" && $"n_docs" >= 5)
        .select($"source", $"shingle", lit(1).as("is_b"))
      ssh.join(broadcast(boiler), Seq("source", "shingle"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce($"is_b", lit(0))).cast("long").as("n_boiler"))
        .select($"doc_id", $"n_shingles", $"n_boiler",
          expr("(10000 * n_boiler) DIV n_shingles").as("boiler_bp"))
        .orderBy("doc_id")
  }

  val qBoilerplate = Q(
    "q_source_boilerplate",
    (spark, dir) => boilerplateOn(spark, dir, graft.Tables.documents(spark, dir)),
    Some(boilerplateSql(DuckSql)))

  // ---- keyword extraction (top-3 terms per document by frequency) ----

  /** Integer-exact keyword extraction: per document, the 3 most
    * frequent non-stopword terms (ties broken lexically). Counts and
    * ranks are exact ints, so no tf-idf-style log (whose last-ulp
    * differs between libm implementations) enters the compare. Term
    * COUNTS need the non-distinct token relation (tok_v is per-doc
    * distinct), so this derives frequencies directly from the split
    * array — one explode + one count + one rank, all clustered on
    * doc_id: a single shuffle.
    */
  private def topTermsSql(d: SqlDialect): String = {
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    val termCte = d match {
      case SparkSql => s"""
tf AS (SELECT doc_id, term, count(*) AS tf FROM
         (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents)
       WHERE NOT term IN $stop GROUP BY doc_id, term)"""
      case DuckSql => s"""
dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents),
ti AS (${d.series("doc_id, w", d.len("w"), "i", "dw")}),
tf AS (SELECT doc_id, ${d.el("w", "i")} AS term, count(*) AS tf
       FROM ti WHERE NOT ${d.el("w", "i")} IN $stop GROUP BY doc_id, ${d.el("w", "i")})"""
    }
    s"""
WITH $termCte,
ranked AS (SELECT doc_id, term, tf,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS r
           FROM tf)
SELECT doc_id, CAST(r AS BIGINT) AS rank, term, tf
FROM ranked WHERE r <= 3
ORDER BY doc_id, rank"""
  }

  val qTopTerms = Q("q_text_top_terms", run(topTermsSql(SparkSql)), Some(topTermsSql(DuckSql)))

  // ---- TF-IDF term weighting (rational, log-free) ----

  /** Corpus-weighted term relevance: per-doc top-3 terms by
    * tf · N / df — the idf is kept as the exact rational N/df instead
    * of the textbook log(N/df) because ln() is libm-implementation-
    * specific across engines while (tf·N)/df is ONE int-int IEEE
    * division (tf·N stays exact in BIGINT and far below 2^53), giving
    * bit-identical scores. Monotonicity in df is the same, so ranking
    * behavior matches log-idf for fixed tf.
    *
    * Shape at scale: tf is one (doc, term) aggregate off the exploded
    * token relation; df is a second aggregate OVER tf (already reduced
    * — never over raw tokens); the scalar N broadcasts; the final
    * per-doc rank windows on doc_id, which is the natural high-
    * cardinality partition key.
    */
  private def tfidfSql(d: SqlDialect): String = {
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    val termCte = d match {
      case SparkSql => s"""
tf AS (SELECT doc_id, term, count(*) AS tf FROM
         (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents)
       WHERE NOT term IN $stop GROUP BY doc_id, term)"""
      case DuckSql => s"""
dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents),
ti AS (${d.series("doc_id, w", d.len("w"), "i", "dw")}),
tf AS (SELECT doc_id, ${d.el("w", "i")} AS term, count(*) AS tf
       FROM ti WHERE NOT ${d.el("w", "i")} IN $stop GROUP BY doc_id, ${d.el("w", "i")})"""
    }
    s"""
WITH $termCte,
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents),
scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  CAST(tf.tf * nn.n AS DOUBLE) / df.df AS score
           FROM tf JOIN df ON tf.term = df.term CROSS JOIN nn),
ranked AS (SELECT doc_id, term, tf, df, score,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS r
           FROM scored)
SELECT doc_id, CAST(r AS BIGINT) AS rank, term, tf, df, score
FROM ranked WHERE r <= 3
ORDER BY doc_id, rank"""
  }

  val qTfIdf = Q("q_tfidf_top_terms", run(tfidfSql(SparkSql)), Some(tfidfSql(DuckSql)))

  // ---- unigram-surprisal quality score (integer-bit LM proxy) ----

  /** Per-document unigram cross-entropy proxy — the LM-perplexity-style
    * quality signal (CCNet-lineage) a corpus filter ranks documents by:
    * rare-token-heavy documents (gibberish, mojibake, boilerplate IDs)
    * score HIGH information content, natural prose scores low. Each
    * token's surprisal is −log2 P(t) = log2(N / c_t), kept EXACT by
    * flooring to whole bits via binary-digit count ([[SqlDialect
    * .floorLog2]]) — a float log2 could not be oracle-gated: libm last
    * ulps differ across engines (the same reason `q_tfidf_top_terms`
    * keeps its idf rational). Output is bits summed over token
    * occurrences plus floor-division millibits per token.
    *
    * Shape at scale: tf is one (doc, term) aggregate off the exploded
    * token relation; the vocabulary and its 1-row total reduce OFF tf
    * (never over raw occurrences); the surprisal join runs on the
    * already-reduced (doc, term) relation, so cost is O(distinct doc
    * terms), map-side-combinable throughout, one natural doc_id
    * partition for the final fold.
    */
  private def surprisalSql(d: SqlDialect): String = {
    val termCte = d match {
      case SparkSql => """
tf AS (SELECT doc_id, term, count(*) AS tf FROM
         (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents)
       GROUP BY doc_id, term)"""
      case DuckSql => s"""
dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents),
ti AS (${d.series("doc_id, w", d.len("w"), "i", "dw")}),
tf AS (SELECT doc_id, ${d.el("w", "i")} AS term, count(*) AS tf
       FROM ti GROUP BY doc_id, ${d.el("w", "i")})"""
    }
    s"""
WITH $termCte,
vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY term),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab),
bits AS (SELECT term, CAST(${d.floorLog2(d.idiv("nn.total", "vocab.c"))} AS BIGINT) AS sbits
         FROM vocab CROSS JOIN nn),
per AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tok,
               CAST(sum(tf.tf * b.sbits) AS BIGINT) AS info_bits
        FROM tf JOIN bits b ON tf.term = b.term
        GROUP BY tf.doc_id)
SELECT doc_id, n_tok, info_bits,
       ${d.idiv("1000 * info_bits", "n_tok")} AS mbits_per_tok
FROM per
ORDER BY doc_id"""
  }

  /** Spec entry: the surprisal query over an arbitrary documents
    * relation (hand-computable corpora in `Round12OpsSpec`).
    */
  private[graft] def surprisalOn(spark: SparkSession, key: String,
      docs: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    StageViews.ensure(spark, "documents", key)(StageViews.widen(spark, docs, "doc_id"))
    spark.sql(surprisalSql(SparkSql))
  }

  val qSurprisal =
    Q("q_text_surprisal", run(surprisalSql(SparkSql)), Some(surprisalSql(DuckSql)))

  // ---- document chunking (overlapping token windows) ----

  /** Overlapping fixed-size token chunks — the tokenize-and-chunk step
    * in front of LLM training/embedding: windows of [[ChunkTokens]]
    * tokens at stride [[ChunkStride]] (10-token overlap), last window
    * truncated at the document end. All arithmetic is integer (window
    * count via integer ceil-division, never float ceil, whose boundary
    * rounding can differ between engines); chunk text is identified by
    * its md5 so the compare is exact. One explode clustered on doc_id —
    * a narrow per-row fan-out of ~nw/stride rows, no shuffle beyond the
    * source repartition, and at 100 TB the fan-out is bounded per task
    * by [[StageViews.widen]]'s length rebalancing.
    */
  private val ChunkTokens = 40
  private val ChunkStride = 30

  /** CTE chain (dw/dn/nc/ck) fanning `rel` (a relation with doc_id +
    * text) out to one row per chunk, plus the per-chunk select
    * expressions — shared by the chunk query and the corpus-build
    * composition.
    */
  private[operators] def chunkCtes(d: SqlDialect, rel: String): String = {
    val (w, s) = (ChunkTokens, ChunkStride)
    // nchunks = 1 + ceil((nw - w) / s) for nw > w, else 1
    val nchunks =
      s"CASE WHEN nw <= $w THEN 1 ELSE 1 + ${d.idiv(s"nw - $w + $s - 1", s.toString)} END"
    s"""ch_dw AS (SELECT doc_id, ${d.split("text")} AS toks FROM $rel),
ch_dn AS (SELECT doc_id, toks, ${d.len("toks")} AS nw FROM ch_dw),
ch_nc AS (SELECT doc_id, toks, nw, $nchunks AS nchunks FROM ch_dn),
ch_ck AS (${d.series("doc_id, toks, nw", "nchunks", "k", "ch_nc")})"""
  }

  /** (n_tokens expr, chunk_hash expr) over a `ck` row. */
  private[operators] def chunkExprs(d: SqlDialect): (String, String) = {
    val (w, s) = (ChunkTokens, ChunkStride)
    val start = s"(k - 1) * $s + 1"
    (s"CAST(CASE WHEN nw - ($start) + 1 < $w THEN nw - ($start) + 1 ELSE $w END AS BIGINT)",
      s"md5(${d.joinArr(d.slice("toks", start, w.toString))})")
  }

  private def chunksSql(d: SqlDialect): String = {
    val (nTokens, chunkHash) = chunkExprs(d)
    s"""
WITH ${chunkCtes(d, "documents")}
SELECT doc_id, CAST(k - 1 AS BIGINT) AS chunk_idx,
       $nTokens AS n_tokens,
       $chunkHash AS chunk_hash
FROM ch_ck
ORDER BY doc_id, chunk_idx"""
  }

  val qChunks = Q("q_doc_chunks", run(chunksSql(SparkSql)), Some(chunksSql(DuckSql)))

  // ---- canonical text normalization (native codegen'd expression) ----

  /** Corpus canonicalization via [[graft.functions.NormalizeText]]
    * (NFC + ASCII-control scrub + whitespace collapse — see its
    * scaladoc for the exact contract and the engine-portable regex
    * spelling). Emits the canonical hash — the key every downstream
    * dedup would group on — plus lengths and a changed flag. Narrow
    * one-pass projection, fully codegen'd, no shuffle.
    */
  private def normalizeSql(d: SqlDialect): String = {
    val norm = d match {
      case SparkSql => "normalize_text(text)"
      case DuckSql =>
        "trim(regexp_replace(regexp_replace(nfc_normalize(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g'))"
    }
    s"""
WITH n AS (SELECT doc_id, text, $norm AS norm_text FROM documents)
SELECT doc_id,
       md5(norm_text) AS norm_md5,
       CAST(length(norm_text) AS BIGINT) AS norm_len,
       CAST(length(text) AS BIGINT) AS raw_len,
       (norm_text <> text) AS changed
FROM n
ORDER BY doc_id"""
  }

  val qNormalize = Q(
    "q_text_normalize",
    (spark, dir) => {
      // direct table read, not the widened StageViews view: this is a
      // pure narrow projection (no explode), so the shared view's
      // repartition would be a wasted full shuffle of the text column
      import org.apache.spark.sql.functions._
      graft.Tables.documents(spark, dir)
        .select(col("doc_id"),
          graft.functions.NormalizeText(col("text")).as("norm_text"),
          col("text"))
        .select(col("doc_id"),
          md5(col("norm_text")).as("norm_md5"),
          length(col("norm_text")).cast("long").as("norm_len"),
          length(col("text")).cast("long").as("raw_len"),
          (col("norm_text") =!= col("text")).as("changed"))
        .orderBy("doc_id")
    },
    Some(normalizeSql(DuckSql)))

  // ---- corpus novelty curve ----

  /** Per-document NOVELTY: the fraction of a doc's (distinct) word-5-gram
    * shingles whose FIRST corpus occurrence (min doc_id) is this doc —
    * i.e. how much genuinely new n-gram content each document adds when
    * the corpus is consumed in doc_id order. The curve this query feeds
    * (novelty over doc_id) is how a data pipeline decides when another
    * crawl shard stops paying for itself. Reuses the dedup family's
    * cached shingle stage; the added work is one min-groupBy over the
    * shingle relation and one equality join back — both linear,
    * map-side-combinable, no self-join anywhere.
    */
  private def noveltySql(d: SqlDialect): String = s"""
WITH ${Dedup.shingleCore(d)},
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
fst AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle),
nov AS (SELECT s.doc_id, count(*) AS n_novel
        FROM sh s JOIN fst f
          ON s.shingle = f.shingle AND s.doc_id = f.first_doc
        GROUP BY s.doc_id)
SELECT z.doc_id, z.nsh AS n_shingles,
       CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
       ${d.idiv("10000 * CAST(coalesce(n.n_novel, 0) AS BIGINT)", "z.nsh")} AS novelty_bp
FROM sz z LEFT JOIN nov n ON z.doc_id = n.doc_id
ORDER BY z.doc_id"""

  private[graft] def noveltyOn(spark: SparkSession, key: String,
      docs: => org.apache.spark.sql.DataFrame): DataFrame = {
    Dedup.ensureShingles(spark, key, docs)
    spark.sql(s"""
SELECT z.doc_id, z.nsh AS n_shingles,
       CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
       (10000 * CAST(coalesce(n.n_novel, 0) AS BIGINT)) DIV z.nsh AS novelty_bp
FROM sz_v z
LEFT JOIN (SELECT s.doc_id, count(*) AS n_novel
           FROM sh_v s
           JOIN (SELECT shingle, min(doc_id) AS first_doc
                 FROM sh_v GROUP BY shingle) f
             ON s.shingle = f.shingle AND s.doc_id = f.first_doc
           GROUP BY s.doc_id) n
  ON z.doc_id = n.doc_id
ORDER BY z.doc_id""")
  }

  val qNovelty = Q(
    "q_ngram_novelty",
    (spark, dir) => noveltyOn(spark, dir, graft.Tables.documents(spark, dir)),
    Some(noveltySql(DuckSql)))

  // ---- PMI collocation mining (integer association, no logs) ----

  /** Adjacent-bigram collocations ranked by pointwise mutual
    * information — the corpus statistic tokenizer designers read to
    * decide merge-worthy units and dataset auditors read to spot
    * boilerplate n-grams. PMI = log₂(P(ab) / (P(a)·P(b))) is a
    * MONOTONE transform of the association ratio
    * c_ab·W² / (B·c_a·c_b) (W = non-stopword token count, B = bigram
    * count), so the ranking needs no log at all: the ratio is emitted
    * directly in basis points, all BIGINT (the float log is
    * unhashable across engines — the q_text_surprisal rationale).
    * Overflow discipline: the two multiplications are split by a DIV
    * ((10⁴·c_ab·W DIV B)·W DIV (c_a·c_b)), identical in both engines,
    * keeping every intermediate under 2⁶³ to W ≈ 10⁹ tokens; past
    * that, pre-scale W. Single-word documents are filtered BEFORE the
    * position series (Spark's `sequence(1, 0)` descends instead of
    * emitting empty). Min support 3 keeps hapax noise out while
    * staying non-vacuous at sf0.001.
    *
    * Scale shape: one explode+groupBy builds the bigram counts (the
    * only corpus-sized shuffle; unigram counts reuse the cached BM25
    * postings on the Spark side), scalar totals broadcast, and the
    * final rank runs over the bigram-TYPE relation (vocabulary², in
    * practice adjacency-bounded), never the corpus.
    */
  private def collocationsSql(d: SqlDialect, uniRel: Option[String]): String = {
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    val uni = uniRel match {
      case Some(r) => s"SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM $r GROUP BY term"
      case None => s"""
SELECT ${d.el("w", "i")} AS term, CAST(count(*) AS BIGINT) AS c
FROM (${d.series("doc_id, w", d.len("w"), "i",
        s"(SELECT doc_id, ${d.split("text")} AS w FROM documents) uw")})
WHERE NOT ${d.el("w", "i")} IN $stop GROUP BY ${d.el("w", "i")}"""
    }
    s"""
WITH dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents
            WHERE ${d.len(d.split("text"))} >= 2),
bi AS (${d.series("doc_id, w", d.len("w") + " - 1", "i", "dw")}),
bg AS (SELECT ${d.el("w", "i")} AS ta, ${d.el("w", "i + 1")} AS tb FROM bi
       WHERE NOT ${d.el("w", "i")} IN $stop
         AND NOT ${d.el("w", "i + 1")} IN $stop),
pc AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_ab FROM bg GROUP BY ta, tb),
uni AS ($uni),
tot AS (SELECT CAST((SELECT sum(c) FROM uni) AS BIGINT) AS wt,
               CAST((SELECT sum(n_ab) FROM pc) AS BIGINT) AS b),
scored AS (SELECT pc.ta, pc.tb, pc.n_ab, ua.c AS n_a, ub.c AS n_b,
                  ${d.idiv(s"(${d.idiv("10000 * pc.n_ab * tot.wt", "tot.b")}) * tot.wt", "ua.c * ub.c")} AS assoc_bp
           FROM pc JOIN uni ua ON pc.ta = ua.term
                   JOIN uni ub ON pc.tb = ub.term CROSS JOIN tot
           WHERE pc.n_ab >= 3),
ranked AS (SELECT ta, tb, n_ab, n_a, n_b, assoc_bp,
                  CAST(ROW_NUMBER() OVER (ORDER BY assoc_bp DESC, n_ab DESC, ta, tb) AS BIGINT) AS rank
           FROM scored)
SELECT rank, ta AS term_a, tb AS term_b, n_ab, n_a, n_b, assoc_bp
FROM ranked WHERE rank <= 20
ORDER BY rank"""
  }

  private[graft] def collocationsSparkSqlForTest: String =
    collocationsSql(SparkSql, None)
  private[graft] def collocationsDuckSqlForTest: String =
    collocationsSql(DuckSql, None)

  private def runCollocations(spark: SparkSession, dir: String): DataFrame = {
    val d = SparkSql
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    StageViews.documents(spark, dir)
    // unigram counts reuse the BM25 postings cache (same stopword set,
    // same tokenization) — the corpus is exploded once for bigrams and
    // zero additional times for unigrams
    StageViews.ensureCached(spark, "bm25_tf_v", dir)(
      spark.sql(Retrieval.tfSql(SparkSql)))
    // staged + NESTED final (no WITH — cache substitution does not
    // reach CTE bodies; the WITH spelling re-ran the unigram explode
    // 3× and the bigram explode 2× from parquet): the vocab-sized
    // unigram totals and the pair counts are cached once each
    StageViews.ensureCached(spark, "colloc_uni_v", dir)(spark.sql(
      "SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM bm25_tf_v GROUP BY term"))
    StageViews.ensureCached(spark, "colloc_pc_v", dir)(spark.sql(s"""
SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_ab FROM (
  SELECT ${d.el("w", "i")} AS ta, ${d.el("w", "i + 1")} AS tb
  FROM (${d.series("doc_id, w", d.len("w") + " - 1", "i",
      s"(SELECT doc_id, ${d.split("text")} AS w FROM documents WHERE ${d.len(d.split("text"))} >= 2) dw")})
  WHERE NOT ${d.el("w", "i")} IN $stop
    AND NOT ${d.el("w", "i + 1")} IN $stop) bg
GROUP BY ta, tb"""))
    spark.sql(s"""
SELECT rank, ta AS term_a, tb AS term_b, n_ab, n_a, n_b, assoc_bp
FROM (SELECT ta, tb, n_ab, n_a, n_b, assoc_bp,
             CAST(ROW_NUMBER() OVER (ORDER BY assoc_bp DESC, n_ab DESC, ta, tb) AS BIGINT) AS rank
      FROM (SELECT pc.ta, pc.tb, pc.n_ab, ua.c AS n_a, ub.c AS n_b,
                   ${d.idiv(s"(${d.idiv("10000 * pc.n_ab * tot.wt", "tot.b")}) * tot.wt", "ua.c * ub.c")} AS assoc_bp
            FROM colloc_pc_v pc
            JOIN colloc_uni_v ua ON pc.ta = ua.term
            JOIN colloc_uni_v ub ON pc.tb = ub.term
            CROSS JOIN (SELECT CAST((SELECT sum(c) FROM colloc_uni_v) AS BIGINT) AS wt,
                               CAST((SELECT sum(n_ab) FROM colloc_pc_v) AS BIGINT) AS b) tot
            WHERE pc.n_ab >= 3) scored) ranked
WHERE rank <= 20
ORDER BY rank""")
  }

  val qCollocations = Q(
    "q_text_collocations",
    runCollocations _,
    Some(collocationsSql(DuckSql, None)))

  // ---- RAKE keyphrase extraction ----

  /** Keyphrase extraction via RAKE (Rose et al. 2010) — the corpus
    * statistic a dataset auditor reads for WHAT documents are about
    * (collocations rank associated PAIRS; RAKE ranks contiguous
    * multi-word candidate phrases). Candidates are maximal stopword-free
    * token runs: a per-document running count of stopwords segments the
    * position series into phrases with no joins (the window partitions
    * by doc — bounded). Word scores are the classic degree/frequency
    * ratio in basis points — deg(w) = Σ over w's occurrences of the
    * containing phrase's length, freq(w) = occurrence count, both
    * BIGINT, score = 10⁴·deg DIV freq (the float division is the only
    * non-integer in Rose's formulation and the ratio's ORDER is all
    * RAKE uses). A phrase scores the sum of its members' word scores;
    * identical phrase texts collapse with an occurrence count (their
    * scores are identical by construction — word scores are global).
    *
    * Determinism: phrase text is the order-pinned concat
    * ([[SqlDialect.orderedConcat]]); ties rank by occurrences DESC then
    * phrase ascending — a total order.
    *
    * Scale shape: one explode builds the positional tokens (the only
    * corpus-sized relation; cached once as `rake_cand_v` on the Spark
    * side — the WITH spelling would recompute it 3×), word scores are
    * vocabulary-sized, the distinct-phrase relation is phrase-type-
    * sized, and the final top-20 window runs over that, never the
    * corpus.
    */
  private def rakeSql(d: SqlDialect, candRel: Option[String]): String = {
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    val candDef = s"""
SELECT doc_id, i, term, pid FROM (
  SELECT doc_id, i, term, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS pid
  FROM (SELECT doc_id, i, ${d.el("w", "i")} AS term,
               CASE WHEN ${d.el("w", "i")} IN $stop THEN 1 ELSE 0 END AS is_stop
        FROM (${d.series("doc_id, w", d.len("w"), "i",
          s"(SELECT doc_id, ${d.split("text")} AS w FROM documents WHERE ${d.len(d.split("text"))} >= 1) dw")}) ts) tok) seg
WHERE is_stop = 0"""
    val cand = candRel.getOrElse(s"($candDef)")
    s"""
WITH plen AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS len
              FROM $cand c0 GROUP BY doc_id, pid),
wsc AS (SELECT c.term,
               CAST(${d.idiv("10000 * sum(p.len)", "count(*)")} AS BIGINT) AS wscore_bp
        FROM $cand c JOIN plen p ON c.doc_id = p.doc_id AND c.pid = p.pid
        GROUP BY c.term),
ph AS (SELECT c.doc_id, c.pid,
              ${d.orderedConcat("c.term", "c.i")} AS phrase,
              CAST(count(*) AS BIGINT) AS n_words,
              CAST(sum(w.wscore_bp) AS BIGINT) AS score_bp
       FROM $cand c JOIN wsc w ON c.term = w.term
       GROUP BY c.doc_id, c.pid),
pg AS (SELECT phrase, CAST(min(n_words) AS BIGINT) AS n_words,
              CAST(count(*) AS BIGINT) AS n_occurrences,
              CAST(min(score_bp) AS BIGINT) AS score_bp
       FROM ph GROUP BY phrase)
SELECT rank, phrase, n_words, n_occurrences, score_bp FROM (
  SELECT phrase, n_words, n_occurrences, score_bp,
         CAST(ROW_NUMBER() OVER (ORDER BY score_bp DESC, n_occurrences DESC, phrase) AS BIGINT) AS rank
  FROM pg) r
WHERE rank <= 20
ORDER BY rank"""
  }

  private[graft] def rakeSparkSqlForTest: String = rakeSql(SparkSql, None)
  private[graft] def rakeDuckSqlForTest: String = rakeSql(DuckSql, None)

  /** ScaleSmoke probe: the RAKE top-20 over an arbitrary corpus.
    * Replication laws: word scores are ratios of two ×m quantities
    * (deg, freq), so the phrase ranking, scores, and word counts are
    * replication-INVARIANT while each phrase's occurrence count is
    * exactly ×m — the gate that the scorer never leaked corpus-sized
    * state into the vocabulary-sized relations.
    */
  private[graft] def rakeOn(spark: SparkSession, key: String,
      docs: => DataFrame): DataFrame = {
    StageViews.ensure(spark, "documents", key)(StageViews.widen(spark, docs, "doc_id"))
    spark.sql(rakeSql(SparkSql, None))
  }

  private def runRake(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    // the positional candidate tokens — the one corpus-sized relation,
    // read 3× downstream (phrase lengths, word scores, phrase build);
    // nested definition, no WITH (cache-substitution discipline)
    val d = SparkSql
    val stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    StageViews.ensureCached(spark, "rake_cand_v", dir)(spark.sql(s"""
SELECT doc_id, i, term, pid FROM (
  SELECT doc_id, i, term, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS pid
  FROM (SELECT doc_id, i, ${d.el("w", "i")} AS term,
               CASE WHEN ${d.el("w", "i")} IN $stop THEN 1 ELSE 0 END AS is_stop
        FROM (${d.series("doc_id, w", d.len("w"), "i",
          s"(SELECT doc_id, ${d.split("text")} AS w FROM documents WHERE ${d.len(d.split("text"))} >= 1) dw")}) ts) tok) seg
WHERE is_stop = 0"""))
    // fully nested staged final — a WITH body would re-plan the cached
    // view as a fresh FileScan chain (Round18bOpsSpec gates this)
    spark.sql(s"""
SELECT rank, phrase, n_words, n_occurrences, score_bp FROM (
  SELECT phrase, n_words, n_occurrences, score_bp,
         CAST(ROW_NUMBER() OVER (ORDER BY score_bp DESC, n_occurrences DESC, phrase) AS BIGINT) AS rank
  FROM (SELECT phrase, CAST(min(n_words) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(min(score_bp) AS BIGINT) AS score_bp
        FROM (SELECT c.doc_id, c.pid,
                     ${d.orderedConcat("c.term", "c.i")} AS phrase,
                     CAST(count(*) AS BIGINT) AS n_words,
                     CAST(sum(w.wscore_bp) AS BIGINT) AS score_bp
              FROM rake_cand_v c
              JOIN (SELECT c2.term,
                           CAST(${d.idiv("10000 * sum(p.len)", "count(*)")} AS BIGINT) AS wscore_bp
                    FROM rake_cand_v c2
                    JOIN (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS len
                          FROM rake_cand_v GROUP BY doc_id, pid) p
                      ON c2.doc_id = p.doc_id AND c2.pid = p.pid
                    GROUP BY c2.term) w ON c.term = w.term
              GROUP BY c.doc_id, c.pid) ph
        GROUP BY phrase) pg) r
WHERE rank <= 20
ORDER BY rank""")
  }

  val qRake = Q(
    "q_rake_keyphrases",
    runRake _,
    Some(rakeSql(DuckSql, None)))

  val all: Seq[Q] =
    Seq(qLangId, qQuality, qTokens, qTokensBpe, qWinnow, qFingerprint,
      qRepetition, qTopTerms, qTfIdf, qSurprisal, qChunks, qNormalize,
      qBoilerplate, qVocab, qNovelty, qCollocations, qRake)
}
