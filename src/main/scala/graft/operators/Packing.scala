package graft.operators

import graft.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators: sequence packing and corpus
  * mixture weights.
  *
  * `q_sequence_pack` assigns every document its place in the
  * concatenate-and-slice packing LLM pretraining uses: documents are
  * laid end-to-end in doc_id order and cut into fixed `SeqLen`-token
  * training sequences, so each doc needs its global token offset — a
  * prefix sum. The Spark spelling is the SCALABLE two-phase scan, not
  * a single-partition window: (1) bucket docs by `doc_id DIV
  * BucketDocs` and cumsum WITHIN each bucket (shuffle on bucket,
  * parallel); (2) total each bucket and prefix-sum the bucket totals —
  * a relation of n/BucketDocs rows, the only single-partition window,
  * bounded and broadcast back. At 100 TB phase 2 is a few thousand
  * rows while phase 1 stays fully parallel; the naive
  * `Window.orderBy(doc_id)` with no partition key would serialize the
  * whole corpus through one task. The DuckDB oracle states the same
  * math as the plain global window it can afford.
  *
  * `q_corpus_mix` computes per-language token shares and the
  * upsampling weight that would rebalance the corpus to uniform
  * per-language token mass — the mixture arithmetic every pretraining
  * data recipe starts from. Exact integer basis points (BIGINT floor
  * division), so both engines agree bit-for-bit; one
  * map-side-combinable groupBy, output bounded by |langs|.
  */
object Packing {

  /** Tokens per packed training sequence. */
  val SeqLen = 2048L

  /** Docs per prefix-sum bucket (phase-2 relation is n/this rows). */
  val BucketDocs = 1024L

  private def nTok(d: SqlDialect): String = d.len(d.split("text"))

  private def packSql(d: SqlDialect): String = s"""
WITH tok AS (SELECT doc_id, CAST(${nTok(d)} AS BIGINT) AS n_tok FROM documents),
cum AS (SELECT doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        FROM tok)
SELECT doc_id, n_tok,
       CAST(cum_tok - n_tok AS BIGINT) AS start_tok,
       ${d.idiv("CAST(cum_tok - n_tok AS BIGINT)", SeqLen.toString)} AS first_seq,
       ${d.idiv("CAST(cum_tok - 1 AS BIGINT)", SeqLen.toString)} AS last_seq,
       ${d.idiv("CAST(cum_tok - 1 AS BIGINT)", SeqLen.toString)} -
         ${d.idiv("CAST(cum_tok - n_tok AS BIGINT)", SeqLen.toString)} + 1 AS n_seqs
FROM cum
ORDER BY doc_id"""

  val qSequencePack = Q(
    "q_sequence_pack",
    (spark, dir) => {
      import spark.implicits._
      // narrow (doc_id, n_tok, bucket) relation cached once — both scan
      // phases read it, so the wide text column is scanned exactly once
      val tok = StageViews.ensureCached(spark, "pack_tok", dir) {
        StageViews.documents(spark, dir)
          .select($"doc_id",
            size(split($"text", " ")).cast("long").as("n_tok"),
            expr(s"doc_id DIV $BucketDocs").as("bucket"))
      }
      // phase 1: parallel within-bucket running sum (shuffle on bucket)
      val withinW = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = tok.withColumn("within_cum", sum($"n_tok").over(withinW))
      // phase 2: bucket totals → exclusive prefix over the TINY bucket
      // relation (n/BucketDocs rows — the only single-partition window)
      val offsetW = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = tok.groupBy("bucket").agg(sum($"n_tok").as("bucket_tok"))
        .withColumn("offset", coalesce(sum($"bucket_tok").over(offsetW), lit(0L)))
        .select("bucket", "offset")
      within.join(broadcast(offsets), "bucket")
        .withColumn("cum_tok", $"offset" + $"within_cum")
        .select($"doc_id", $"n_tok",
          ($"cum_tok" - $"n_tok").as("start_tok"),
          expr(s"(cum_tok - n_tok) DIV $SeqLen").as("first_seq"),
          expr(s"(cum_tok - 1) DIV $SeqLen").as("last_seq"),
          expr(s"(cum_tok - 1) DIV $SeqLen - (cum_tok - n_tok) DIV $SeqLen + 1")
            .as("n_seqs"))
        .orderBy("doc_id")
    },
    Some(packSql(DuckSql)))

  private def mixSql(d: SqlDialect, rel: String = "documents"): String = s"""
WITH tok AS (SELECT lang, CAST(${nTok(d)} AS BIGINT) AS n_tok FROM $rel),
agg AS (SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS lang_tokens
        FROM tok GROUP BY lang),
w AS (SELECT lang, n_docs, lang_tokens,
             CAST(sum(lang_tokens) OVER () AS BIGINT) AS all_tokens,
             count(*) OVER () AS n_langs
      FROM agg)
SELECT lang, n_docs, lang_tokens,
       ${d.idiv("10000 * lang_tokens", "all_tokens")} AS actual_share_bp,
       ${d.idiv("10000 * all_tokens", "n_langs * lang_tokens")} AS uniform_weight_bp
FROM w
ORDER BY lang"""

  /** UniMax budget allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): given a total token budget
    * B = total · [[UmxBudgetNum]]/[[UmxBudgetDen]] and a per-source
    * epoch cap [[UmxEpochCap]], give every source an equal share of
    * the budget except where the cap binds — a source too small to
    * absorb its share trains at exactly the cap and its slack
    * redistributes to the rest. This kills both failure modes of
    * exponent-smoothed sampling: low-resource sources never over-epoch
    * past the cap, high-resource sources absorb the slack instead of
    * being starved.
    *
    * Closed form (no iteration): with sources sorted by ASCENDING cap,
    * capped-ness is a prefix — if source i can't absorb the equal
    * share of what's left, neither could any smaller source — so the
    * crossover k is the FIRST i whose cap covers the remaining equal
    * share, a first-crossing window scan (the CUSUM alarm shape).
    * i < k: alloc = cap; i ≥ k: the remaining budget splits as BIGINT
    * quotient + one extra token to the first `remainder` sources, so
    * Σ alloc == B exactly whenever any source is uncapped. Every
    * number is integer arithmetic — bit-exact across engines — and
    * the plan is one map-side-combinable groupBy followed by windows
    * over the |sources|-row aggregate.
    */
  val UmxEpochCap = 2L
  val UmxBudgetNum = 3L
  val UmxBudgetDen = 2L

  // n_tok > 0 guard: a language whose documents all tokenize to zero
  // tokens can absorb no budget (cap = 0) but would divide by zero in
  // epochs_bp — NULL under Spark's DIV, a hard error under DuckDB's //.
  // Dropping it in the tok CTE keeps both engines agreeing on the
  // degenerate input (r16 ADVICE).
  private[graft] def unimaxSql(d: SqlDialect, rel: String = "documents"): String = s"""
WITH tok AS (SELECT lang, CAST(sum(CAST(${nTok(d)} AS BIGINT)) AS BIGINT) AS n_tok
             FROM $rel GROUP BY lang
             HAVING sum(CAST(${nTok(d)} AS BIGINT)) > 0),
o AS (SELECT lang, n_tok, $UmxEpochCap * n_tok AS cap,
             CAST(ROW_NUMBER() OVER (ORDER BY $UmxEpochCap * n_tok, lang) AS BIGINT) AS i,
             CAST(sum($UmxEpochCap * n_tok) OVER (ORDER BY $UmxEpochCap * n_tok, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(count(*) OVER () AS BIGINT) AS l,
             ${d.idiv(s"CAST(sum(n_tok) OVER () AS BIGINT) * $UmxBudgetNum", UmxBudgetDen.toString)} AS budget
      FROM tok),
kk AS (SELECT coalesce(min(CASE WHEN cap * (l - i + 1) >= budget - (cum - cap) THEN i END),
                       max(l) + 1) AS k
       FROM o),
rr AS (SELECT kk.k, coalesce((SELECT cum FROM o WHERE i = kk.k - 1), 0) AS cum_before
       FROM kk),
a AS (SELECT o.lang, o.n_tok, o.cap, o.i, o.budget, rr.k,
             o.budget - rr.cum_before AS rem, o.l - rr.k + 1 AS m
      FROM o CROSS JOIN rr),
alloc AS (SELECT lang, n_tok, cap,
                 CAST(CASE WHEN i < k THEN cap
                      ELSE ${d.idiv("rem", "m")} +
                           (CASE WHEN i - k < rem % m THEN 1 ELSE 0 END)
                      END AS BIGINT) AS alloc_tokens
          FROM a)
SELECT lang, n_tok AS n_tokens, cap AS cap_tokens, alloc_tokens,
       ${d.idiv("10000 * alloc_tokens", "n_tokens")} AS epochs_bp
FROM alloc
ORDER BY lang"""

  /** Fixture entry point: the production SQL over any registered
    * documents-shaped relation (lang, text).
    */
  private[graft] def unimaxOn(spark: org.apache.spark.sql.SparkSession,
      rel: String): org.apache.spark.sql.DataFrame =
    spark.sql(unimaxSql(SparkSql, rel))

  val qCorpusUnimax = Q(
    "q_corpus_unimax",
    (spark, dir) => {
      graft.Tables.documents(spark, dir).createOrReplaceTempView("documents_umx")
      unimaxOn(spark, "documents_umx")
    },
    Some(unimaxSql(DuckSql)))

  /** Temperature-scaled language sampling (the mT5/XLM-R recipe:
    * p_l ∝ (tokens_l)^α with α = 1/2 here — "temperature 2") — the
    * third point on the mixing spectrum between q_corpus_mix's
    * proportional shares (α = 1) and q_corpus_unimax's capped-uniform
    * allocation: low-resource languages are upsampled, but smoothly
    * rather than to a hard uniform share.
    *
    * Arithmetic contract: w_l = ⌊√tokens_l⌋ via the DOUBLE sqrt —
    * IEEE-754 sqrt is CORRECTLY ROUNDED, so Spark (Math.sqrt) and
    * DuckDB land on the identical double for the identical BIGINT
    * input and the floor agrees bit-for-bit (the same argument the
    * IVF list-count derivation relies on; log/exp would NOT be safe —
    * libm last-ulps differ). Everything downstream is BIGINT: the
    * budget B = Σ tokens reallocates as alloc_l = ⌊B·w_l / W⌋ plus
    * Hamilton largest-remainder apportionment (+1 token to the
    * `deficit` languages with the largest remainders, ties by lang
    * ascending), so **Σ alloc_tokens == B exactly** — the law the spec
    * pins. Headroom: B·w_l needs w_l·B < 2⁶³; with w ≈ √B that holds
    * to B ≈ 4·10¹² tokens — past that, pre-scale w.
    *
    * Scale shape: one map-side-combinable groupBy over the corpus;
    * every window runs over the |langs|-row aggregate. Zero-token
    * languages are dropped by the same HAVING guard as UniMax (they
    * can absorb no budget but would divide by zero in the rate).
    */
  private[graft] def temperatureSql(d: SqlDialect, rel: String = "documents"): String = s"""
WITH tok AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(CAST(${nTok(d)} AS BIGINT)) AS BIGINT) AS lang_tokens
             FROM $rel GROUP BY lang
             HAVING sum(CAST(${nTok(d)} AS BIGINT)) > 0),
w AS (SELECT lang, n_docs, lang_tokens,
             CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt
      FROM tok),
t AS (SELECT lang, n_docs, lang_tokens, w_sqrt,
             CAST(sum(lang_tokens) OVER () AS BIGINT) AS b,
             CAST(sum(w_sqrt) OVER () AS BIGINT) AS ws
      FROM w),
base AS (SELECT lang, n_docs, lang_tokens, w_sqrt, b,
                ${d.idiv("b * w_sqrt", "ws")} AS alloc0,
                (b * w_sqrt) % ws AS remn
         FROM t),
fin AS (SELECT lang, n_docs, lang_tokens, w_sqrt, b, alloc0,
               CAST(b - sum(alloc0) OVER () AS BIGINT) AS deficit,
               ROW_NUMBER() OVER (ORDER BY remn DESC, lang) AS rr
        FROM base)
SELECT lang, n_docs, lang_tokens, w_sqrt,
       CAST(alloc0 + CASE WHEN rr <= deficit THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens,
       ${d.idiv("10000 * (alloc0 + CASE WHEN rr <= deficit THEN 1 ELSE 0 END)",
      "lang_tokens")} AS sample_rate_bp
FROM fin
ORDER BY lang"""

  /** Fixture entry: the production SQL over any registered
    * documents-shaped relation (lang, text).
    */
  private[graft] def temperatureOn(spark: org.apache.spark.sql.SparkSession,
      rel: String): org.apache.spark.sql.DataFrame =
    spark.sql(temperatureSql(SparkSql, rel))

  val qCorpusTemperature = Q(
    "q_corpus_temperature",
    (spark, dir) => {
      graft.Tables.documents(spark, dir).createOrReplaceTempView("documents_tmp8")
      temperatureOn(spark, "documents_tmp8")
    },
    Some(temperatureSql(DuckSql)))

  val qCorpusMix = Q(
    "q_corpus_mix",
    (spark, dir) => {
      // direct read: a straight groupBy needs no pre-repartition, and
      // the totals come from a window over the |langs|-row aggregate —
      // one scan, no self-join
      graft.Tables.documents(spark, dir).createOrReplaceTempView("documents_mix")
      spark.sql(mixSql(SparkSql, "documents_mix"))
    },
    Some(mixSql(DuckSql)))

  val all: Seq[Q] = Seq(qSequencePack, qCorpusMix, qCorpusUnimax,
    qCorpusTemperature)
}
