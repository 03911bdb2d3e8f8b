package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyword retrieval over the corpus — BM25 top-k, the operator a
  * training-data pipeline runs for decontamination lookups, dedup
  * triage, and eval-set leakage scans (and the lexical half of every
  * hybrid RAG stack). New family: the text queries score documents
  * INTERNALLY (tf-idf top terms, surprisal); this RANKS the corpus
  * against a query workload.
  *
  * Integer-exact BM25 (the [[Q]] determinism contract): the standard
  * k1 = 1.2, b = 0.75 scoring
  *
  *   idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
  *
  * is evaluated in basis points with the rationals cleared — with
  * avgdl = TL/N (TL total tokens, N docs), the tf ratio becomes
  * 44·tf·TL / (20·tf·TL + 6·TL + 18·|d|·N), and idf uses the
  * rational surrogate (N − df + 1)/(df + 1) rather than the float
  * log (libm last-ulps differ across engines — the q_text_surprisal
  * precedent): idf_bp = 10000·(N − df + 1) DIV (df + 1), and the tf
  * ratio is itself bp-scaled BEFORE the integer divide
  * (440000·tf·TL DIV denom — an unscaled divide floors the ~[0, 2.2]
  * ratio to {0, 1, 2}, collapsing most rankings into ties). Every
  * value is BIGINT; both engines run the identical arithmetic. The
  * rational idf preserves the log-idf ORDERING (both decrease
  * monotonically in df), which is what a ranking needs. Headroom:
  * 44·10⁴·tf·TL must stay under 2⁶³ — holds to TL ≈ 10¹² tokens at
  * tf ≤ 10³; past that, rescale the constant or pre-divide TL.
  *
  * Query workload: 20 two-term queries built deterministically from
  * the corpus itself — the 40 highest-df non-stopword terms (ties by
  * term ascending), paired in rank order. Self-contained: both engines
  * derive the same workload with no out-of-band fixture.
  *
  * Scale shape: one explode+groupBy builds the (doc, term, tf)
  * posting relation (the only corpus-sized shuffle); the 40-term
  * query table broadcasts; candidates are qterms ⋈ postings ON term —
  * only matching postings survive. Top-k is TWO-PHASE: phase 1 ranks
  * within (query_id, doc_id % 32) and keeps 5 per salt — 32-way
  * parallel, each partition sees ~1/32 of the candidates — phase 2
  * ranks the ≤160 survivors per query globally. Same total order
  * (score DESC, doc_id), so the result is identical to the
  * single-phase spelling (Round17OpsSpec pins the law); at 100 TB the
  * single-phase window would funnel every candidate for a query
  * through one reducer.
  */
object Retrieval {

  private val Stop = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
  val QueryTerms = 40
  val TopK = 5
  val Salts = 32

  /** The postings build (doc_id, term, tf) — per dialect. The Spark
    * spelling is shared with [[TextAnalysis.qCollocations]], which
    * reuses the SAME `bm25_tf_v` cache for unigram counts (the
    * StageViews registry dedups by name+key, so whichever query runs
    * first builds it once).
    */
  private[operators] def tfSql(d: SqlDialect): String = d match {
    case SparkSql => s"""
SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM
  (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents)
WHERE NOT term IN $Stop GROUP BY doc_id, term"""
    case DuckSql => s"""
SELECT doc_id, ${d.el("w", "i")} AS term, CAST(count(*) AS BIGINT) AS tf
FROM (${d.series("doc_id, w", d.len("w"), "i",
      s"(SELECT doc_id, ${d.split("text")} AS w FROM documents) dw")})
WHERE NOT ${d.el("w", "i")} IN $Stop GROUP BY doc_id, ${d.el("w", "i")}"""
  }

  private def dlen(d: SqlDialect): String = d match {
    case SparkSql => "size(split(text, ' '))"
    case DuckSql  => s"${d.len(d.split("text"))}"
  }

  /** Everything downstream of the postings (`tf`) and doc-length (`dl`)
    * relations, shared by both dialects. The Spark catalog entry feeds
    * it CACHED STAGE VIEWS (`bm25_tf_v`, `bm25_dl_v`) — Spark inlines
    * WITH-CTEs at every mention, and the self-contained spelling
    * re-scanned the documents parquet 10× (the Similarity-family
    * lesson); with the staged views the corpus is scanned ONCE for
    * postings and once for lengths, everything else reads the caches.
    * The oracle and the specs keep the self-contained CTE spelling.
    */
  private def bm25Body(d: SqlDialect, tfRel: String, dlRel: String): String =
    s"""
${bm25Ctes(d, tfRel, dlRel)}
SELECT r2.query_id, r2.rank, r2.doc_id, r2.score_bp, qlab.term_a, qlab.term_b
FROM r2 JOIN qlab ON r2.query_id = qlab.query_id
WHERE r2.rank <= $TopK
ORDER BY r2.query_id, r2.rank"""

  /** One term's BM25 contribution in basis points — the one formula
    * every spelling (oracle CTEs, PRF round 2, the staged scores view)
    * must share verbatim so the arithmetic cannot drift.
    */
  private def cBpExpr(d: SqlDialect, df: String, tf: String, len: String): String =
    d.idiv(
      s"(${d.idiv(s"10000 * (nn.n - $df + 1)", s"$df + 1")}) * " +
        s"(${d.idiv(s"440000 * $tf * nn.tl", s"20 * $tf * nn.tl + 6 * nn.tl + 18 * $len * nn.n")})",
      "10000")

  /** The CTE chain only (ends at `qlab`) — reused by the hybrid fusion,
    * which needs the ranked relation `r2` rather than a finished query.
    */
  private def bm25Ctes(d: SqlDialect, tfRel: String, dlRel: String): String = s"""
nn AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len) AS BIGINT) AS tl
       FROM $dlRel),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM $tfRel GROUP BY term),
qt AS (SELECT term, df,
              CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) AS BIGINT) AS qrank
       FROM df),
qterms AS (SELECT ${d.idiv("qrank - 1", "2")} AS query_id, term, df
           FROM qt WHERE qrank <= $QueryTerms),
contrib AS (SELECT q.query_id, t.doc_id,
                   ${cBpExpr(d, "q.df", "t.tf", "dl.len")} AS c_bp
            FROM qterms q JOIN $tfRel t ON q.term = t.term
            JOIN $dlRel dl ON t.doc_id = dl.doc_id CROSS JOIN nn),
scores AS (SELECT query_id, doc_id, CAST(sum(c_bp) AS BIGINT) AS score_bp
           FROM contrib GROUP BY query_id, doc_id),
r1 AS (SELECT query_id, doc_id, score_bp,
              ROW_NUMBER() OVER (PARTITION BY query_id, doc_id % $Salts
                                 ORDER BY score_bp DESC, doc_id) AS sr
       FROM scores),
r2 AS (SELECT query_id, doc_id, score_bp,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
       FROM r1 WHERE sr <= $TopK),
qlab AS (SELECT query_id, min(term) AS term_a, max(term) AS term_b
         FROM qterms GROUP BY query_id)"""

  /** Self-contained spelling (tf/dl as CTEs over `documents`) — the
    * DuckDB oracle and the specs.
    */
  private def bm25Sql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Body(d, "tf", "dl")}"""

  /** Staged spelling: the cached rank view joined to the workload
    * labels — nested subqueries only (no WITH; cache substitution does
    * not reach CTE bodies).
    */
  private def bm25StagedSparkSql: String = s"""
SELECT r2.query_id, r2.rank, r2.doc_id, r2.score_bp, qlab.term_a, qlab.term_b
FROM bm25_rank_v r2
JOIN (SELECT query_id, min(term) AS term_a, max(term) AS term_b
      FROM bm25_qt_v GROUP BY query_id) qlab
  ON r2.query_id = qlab.query_id
WHERE r2.rank <= $TopK
ORDER BY r2.query_id, r2.rank"""

  /** Spec/fixture entry: the production SQL over any documents-shaped
    * relation registered as `documents` in the session.
    */
  private[graft] def bm25SparkSqlForTest: String = bm25Sql(SparkSql)
  private[graft] def bm25DuckSqlForTest: String = bm25Sql(DuckSql)

  /** Single-phase spelling (no salt pre-rank) — spec-only, the law
    * "two-phase == single-phase" runs both over the same corpus.
    */
  private[graft] def bm25SinglePhaseSparkSql: String = {
    val two = bm25Sql(SparkSql)
    two.replace(s"PARTITION BY query_id, doc_id % $Salts", "PARTITION BY query_id")
  }

  /** The cached doc-length relation alone — shared with operators that
    * need per-doc token counts without the rest of the BM25 stages
    * (Dedup's span coverage).
    */
  private[operators] def ensureDlStage(spark: SparkSession, key: String): Unit = {
    StageViews.ensureCached(spark, "bm25_dl_v", key)(spark.sql(
      s"SELECT doc_id, CAST(${dlen(SparkSql)} AS BIGINT) AS len FROM documents"))
    ()
  }

  private def ensureStages(spark: SparkSession, key: String): Unit = {
    StageViews.ensureCached(spark, "bm25_tf_v", key)(spark.sql(tfSql(SparkSql)))
    ensureDlStage(spark, key)
    // the 20-query workload (40 rows) — built once from the postings df
    StageViews.ensureCached(spark, "bm25_qt_v", key)(spark.sql(s"""
SELECT ${SparkSql.idiv("qrank - 1", "2")} AS query_id, term, df FROM (
  SELECT term, df,
         CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) AS BIGINT) AS qrank
  FROM (SELECT term, CAST(count(*) AS BIGINT) AS df FROM bm25_tf_v GROUP BY term))
WHERE qrank <= $QueryTerms"""))
    // round-1 scores: the ONE contribution join, shared by the bm25
    // top-k, the hybrid fusion, and PRF's round 1
    StageViews.ensureCached(spark, "bm25_scores_v", key)(spark.sql(s"""
SELECT query_id, doc_id, CAST(sum(c_bp) AS BIGINT) AS score_bp FROM (
  SELECT q.query_id, t.doc_id, ${cBpExpr(SparkSql, "q.df", "t.tf", "dl.len")} AS c_bp
  FROM bm25_qt_v q JOIN bm25_tf_v t ON q.term = t.term
  JOIN bm25_dl_v dl ON t.doc_id = dl.doc_id
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len) AS BIGINT) AS tl
              FROM bm25_dl_v) nn)
GROUP BY query_id, doc_id"""))
    // the round-1 top-k itself (two-phase salted rank, ≤ queries×TopK
    // narrow rows) — every consumer below reads THIS instead of
    // re-ranking the scores. NO WITH in any cached definition and no
    // cached view referenced from a WITH body: cache substitution does
    // not reach inside CTE bodies (verified empirically this round —
    // a `SELECT ... FROM sh_v` inside WITH plans a fresh FileScan
    // pipeline), so every staged final below is spelled as nested
    // subqueries.
    StageViews.ensureCached(spark, "bm25_rank_v", key)(spark.sql(s"""
SELECT query_id, doc_id, score_bp, rank FROM (
  SELECT query_id, doc_id, score_bp,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
  FROM (SELECT query_id, doc_id, score_bp,
               ROW_NUMBER() OVER (PARTITION BY query_id, doc_id % $Salts
                                  ORDER BY score_bp DESC, doc_id) AS sr
        FROM bm25_scores_v) r1
  WHERE sr <= $TopK) r2
WHERE rank <= $TopK"""))
    ()
  }

  /** The full query over an arbitrary documents-shaped corpus keyed by
    * `key` — ScaleSmoke's replication probe entry.
    */
  private[graft] def bm25On(spark: SparkSession, key: String,
      docs: => DataFrame): DataFrame = {
    StageViews.ensure(spark, "documents", key)(
      StageViews.widen(spark, docs, "doc_id"))
    ensureStages(spark, key)
    spark.sql(bm25StagedSparkSql)
  }

  /** Candidate (postings ⋈ query-terms) row count — the quantity that
    * must grow EXACTLY linearly with corpus size: the workload (top-40
    * df terms) is replication-invariant by construction, so candidates
    * are Σ df over the workload, ×m under ×m replication. ScaleSmoke
    * asserts the exact ratio.
    */
  private[graft] def bm25CandidatesOn(spark: SparkSession, key: String,
      docs: => DataFrame): Long = {
    StageViews.ensure(spark, "documents", key)(
      StageViews.widen(spark, docs, "doc_id"))
    ensureStages(spark, key)
    spark.sql(s"""
WITH df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM bm25_tf_v GROUP BY term),
qt AS (SELECT term, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS qrank FROM df),
qterms AS (SELECT term FROM qt WHERE qrank <= $QueryTerms)
SELECT count(*) FROM qterms q JOIN bm25_tf_v t ON q.term = t.term""")
      .head().getLong(0)
  }

  private def runBm25(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    spark.sql(bm25StagedSparkSql)
  }

  val qBm25 = Q("q_bm25_topk", runBm25 _, Some(bm25Sql(DuckSql)))

  // ---- hybrid retrieval: BM25 ⊕ dense cosine via reciprocal-rank fusion ----

  /** RRF smoothing constant — the standard k = 60 (Cormack, Clarke,
    * Büttcher 2009), kept at the published value so the fused ordering
    * matches what any RAG stack computes.
    */
  val RrfK = 60

  /** Depth of the dense ranked list consumed by the fusion (the brute
    * ground-truth stage keeps top-10 per probe query).
    */
  val AnnTopK = 10

  /** Hybrid retrieval — the composition every RAG-shaped pipeline runs
    * over a corpus with both a lexical index and an embedding index:
    * reciprocal-rank fusion of the BM25 top-k (this file) and the dense
    * cosine top-k (Similarity's brute ground-truth ranks), with
    * embeddings.vec_id identified with documents.doc_id (the aligned
    * corpus assumption — one embedding row per embedded document).
    *
    * Integer-exact like BM25 itself: each list contributes
    * 10000 DIV (60 + rank) basis points — ranks are BIGINT, so the
    * fused score involves no floats at all, and ties break by doc_id
    * ascending (a total, deterministic order both engines share).
    *
    * Two structural laws (Round18OpsSpec pins both):
    *  - list-membership dominance: with list depths ≤ 5 and ≤ 10, the
    *    WORST doc present in both lists scores
    *    10000 DIV 65 + 10000 DIV 70 = 295 bp, strictly above the BEST
    *    single-list doc's 10000 DIV 61 = 163 bp — so every both-lists
    *    doc outranks every single-list doc, per query, always;
    *  - in particular a doc top-ranked by both rankers outranks any
    *    single-ranker doc (the r17 VERDICT's done-condition).
    *
    * Scale shape: the fusion itself touches only the two ranked lists —
    * ≤ (5 + 10) rows per query — so its cost is workload-sized, not
    * corpus-sized; all corpus-sized work lives upstream in the two
    * rankers, which keep their own scale stories (salted two-phase
    * top-k for BM25; per-shard rank + merge for the dense side). The
    * per-query window here sees ≤ 15 rows, so no salting is needed at
    * any corpus size.
    */
  private def fusionSql(d: SqlDialect, bmRel: String, anRel: String): String = s"""
fused AS (SELECT query_id, doc_id,
                 CAST(sum(${d.idiv("10000", s"$RrfK + rank")}) AS BIGINT) AS rrf_bp,
                 CAST(count(*) AS BIGINT) AS n_lists
          FROM (SELECT query_id, doc_id, rank FROM $bmRel
                UNION ALL
                SELECT query_id, doc_id, rank FROM $anRel) lists
          GROUP BY query_id, doc_id),
hranked AS (SELECT query_id, doc_id, rrf_bp, n_lists,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY rrf_bp DESC, doc_id) AS BIGINT) AS rank
            FROM fused)
SELECT query_id, rank, doc_id, rrf_bp, n_lists
FROM hranked WHERE rank <= $TopK
ORDER BY query_id, rank"""

  /** BM25's ranked relation projected to the fusion's contract. */
  private def bmTopCte: String = s"""
bmtop AS (SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(rank AS BIGINT) AS rank
          FROM r2 WHERE rank <= $TopK)"""

  private def anTopCte(denseRel: String, depth: Int = AnnTopK): String = s"""
antop AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                 CAST(neighbor_id AS BIGINT) AS doc_id,
                 CAST(rank AS BIGINT) AS rank
          FROM $denseRel WHERE rank <= $depth)"""

  /** Self-contained spelling over `documents` + `embeddings` — the
    * DuckDB oracle (and the spec's Spark twin, which needs
    * CosineSimilarity registered).
    */
  private def hybridSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${Similarity.bruteCtes(d)},
$bmTopCte,
${anTopCte("ranked")},
${fusionSql(d, "bmtop", "antop")}"""

  /** The two staged top lists as nested-subquery fragments. */
  private def bmTopSub: String =
    s"""(SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id,
        CAST(rank AS BIGINT) AS rank
 FROM bm25_rank_v WHERE rank <= $TopK)"""

  private def anTopSub: String =
    s"""(SELECT CAST(query_id AS BIGINT) AS query_id,
        CAST(neighbor_id AS BIGINT) AS doc_id, CAST(rank AS BIGINT) AS rank
 FROM ann_brute_v WHERE rank <= $AnnTopK)"""

  /** Dense top list from the cached IVF rerank stage (the SERVING-shaped
    * dense ranker — `ann_ivfr_v` keeps rank ≤ 5, so the IVF fusion's
    * dense depth is [[IvfAnnTopK]]).
    */
  val IvfAnnTopK = 5

  private def anIvfTopSub: String =
    s"""(SELECT CAST(query_id AS BIGINT) AS query_id,
        CAST(neighbor_id AS BIGINT) AS doc_id, CAST(rank AS BIGINT) AS rank
 FROM ann_ivfr_v WHERE rank <= $IvfAnnTopK)"""

  /** Staged spelling: lexical ranks from the cached rank view, dense
    * ranks from a cached dense-ranker stage — nested, no WITH.
    */
  private def hybridStagedSql(denseSub: String): String = s"""
SELECT query_id, rank, doc_id, rrf_bp, n_lists FROM (
  SELECT query_id, doc_id, rrf_bp, n_lists,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rrf_bp DESC, doc_id) AS BIGINT) AS rank
  FROM (SELECT query_id, doc_id,
               CAST(sum(${SparkSql.idiv("10000", s"$RrfK + rank")}) AS BIGINT) AS rrf_bp,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM (SELECT query_id, doc_id, rank FROM $bmTopSub bm
              UNION ALL
              SELECT query_id, doc_id, rank FROM $denseSub an) lists
        GROUP BY query_id, doc_id) fused) hranked
WHERE rank <= $TopK
ORDER BY query_id, rank"""

  private def hybridStagedSparkSql: String = hybridStagedSql(anTopSub)

  private[graft] def hybridSparkSqlForTest: String = hybridSql(SparkSql)
  private[graft] def hybridDuckSqlForTest: String = hybridSql(DuckSql)

  /** Fusion-only spelling over two pre-ranked test relations
    * (query_id, doc_id, rank) — Round18OpsSpec hand-derives rrf_bp and
    * the dominance law on it without involving either ranker.
    */
  private[graft] def rrfFuseSparkSqlForTest(bmRel: String, anRel: String): String = s"""
WITH bmtop AS (SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id,
                      CAST(rank AS BIGINT) AS rank FROM $bmRel),
antop AS (SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(rank AS BIGINT) AS rank FROM $anRel),
${fusionSql(SparkSql, "bmtop", "antop")}"""

  // ---- pseudo-relevance feedback (RM3-lite query expansion) ----

  /** How many round-1 documents feed the expansion, and how many
    * expansion terms each query gains.
    */
  val PrfDocs = 3
  val PrfTerms = 2

  /** BM25 with pseudo-relevance feedback — the classic two-round
    * retrieval composition (Rocchio 1971; RM3): run the original query,
    * take the top-[[PrfDocs]] documents, harvest the [[PrfTerms]]
    * strongest non-stopword terms they contain that the query lacks
    * (by summed tf, ties by term ascending — a total order), append
    * them, and rescore the corpus with the expanded query. Everything
    * stays in the BM25 chain's integer basis points: the expansion
    * choice is a tf argmax (BIGINT), the second round reuses the exact
    * contribution formula with df joined from the corpus df relation,
    * and the two-phase salted top-k bounds the final rank like round 1.
    *
    * Scale shape: round 1 is the existing staged BM25; the harvest
    * joins the ≤ queries×[[PrfDocs]] top-doc keys against the postings
    * (a broadcast-sized probe side); round 2 is another
    * workload ⋈ postings candidate join — the same linear shape as
    * round 1 with ≤ 2× the terms. Nothing quadratic appears at any
    * corpus size.
    *
    * Reduction law (Round18OpsSpec): a corpus with no expandable
    * vocabulary (every non-stop term already in the query workload)
    * must reproduce the plain BM25 ranking with empty expansion labels.
    */
  private def prfCtes(d: SqlDialect, tfRel: String, dlRel: String): String = {
    val cbp = d.idiv(
      s"(${d.idiv("10000 * (nn.n - fd.df + 1)", "fd.df + 1")}) * " +
        s"(${d.idiv("440000 * t.tf * nn.tl", "20 * t.tf * nn.tl + 6 * nn.tl + 18 * dl.len * nn.n")})",
      "10000")
    s"""
prf_top AS (SELECT query_id, doc_id FROM r2 WHERE rank <= $PrfDocs),
prf_cand AS (SELECT p.query_id, t.term, CAST(sum(t.tf) AS BIGINT) AS tfsum
             FROM prf_top p JOIN $tfRel t ON p.doc_id = t.doc_id
             WHERE NOT t.term IN $Stop
             GROUP BY p.query_id, t.term),
prf_new AS (SELECT query_id, term, tfsum,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY tfsum DESC, term) AS er
            FROM (SELECT c.query_id, c.term, c.tfsum
                  FROM prf_cand c LEFT JOIN qterms q
                    ON c.query_id = q.query_id AND c.term = q.term
                  WHERE q.term IS NULL) nw),
prf_exp AS (SELECT query_id, term FROM prf_new WHERE er <= $PrfTerms),
prf_q AS (SELECT query_id, term FROM qterms
          UNION ALL SELECT query_id, term FROM prf_exp),
prf_contrib AS (SELECT q.query_id, t.doc_id, $cbp AS c_bp
                FROM prf_q q JOIN df fd ON q.term = fd.term
                JOIN $tfRel t ON q.term = t.term
                JOIN $dlRel dl ON t.doc_id = dl.doc_id CROSS JOIN nn),
prf_scores AS (SELECT query_id, doc_id, CAST(sum(c_bp) AS BIGINT) AS score_bp
               FROM prf_contrib GROUP BY query_id, doc_id),
prf_r1 AS (SELECT query_id, doc_id, score_bp,
                  ROW_NUMBER() OVER (PARTITION BY query_id, doc_id % $Salts
                                     ORDER BY score_bp DESC, doc_id) AS sr
           FROM prf_scores),
prf_r2 AS (SELECT query_id, doc_id, score_bp,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
           FROM prf_r1 WHERE sr <= $TopK),
prf_lab AS (SELECT q.query_id,
                   coalesce(min(e.term), '') AS exp_term_a,
                   coalesce(max(e.term), '') AS exp_term_b
            FROM (SELECT DISTINCT query_id FROM qterms) q
            LEFT JOIN prf_exp e ON q.query_id = e.query_id
            GROUP BY q.query_id)"""
  }

  private def prfSelect: String = s"""
SELECT r.query_id, r.rank, r.doc_id, r.score_bp, l.exp_term_a, l.exp_term_b
FROM prf_r2 r JOIN prf_lab l ON r.query_id = l.query_id
WHERE r.rank <= $TopK
ORDER BY r.query_id, r.rank"""

  /** Self-contained spelling — the DuckDB oracle and the spec twin. */
  private def prfSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${prfCtes(d, "tf", "dl")}
$prfSelect"""

  private[graft] def prfSparkSqlForTest: String = prfSql(SparkSql)

  /** PRF stages (Spark side, all nested/CTE-free definitions):
    * `prf_exp_v` — the harvested expansion terms (round-1 top docs'
    * strongest fresh terms); `prf_scores_v` — the round-2 contribution
    * join over the expanded workload. The final query is then a thin
    * two-phase rank over the cached round-2 scores.
    */
  private def ensurePrfStages(spark: SparkSession, key: String): Unit = {
    StageViews.ensureCached(spark, "prf_exp_v", key)(spark.sql(s"""
SELECT query_id, term FROM (
  SELECT nw.query_id, nw.term,
         ROW_NUMBER() OVER (PARTITION BY nw.query_id
                            ORDER BY nw.tfsum DESC, nw.term) AS er
  FROM (SELECT c.query_id, c.term, c.tfsum
        FROM (SELECT p.query_id, t.term, CAST(sum(t.tf) AS BIGINT) AS tfsum
              FROM (SELECT query_id, doc_id FROM bm25_rank_v WHERE rank <= $PrfDocs) p
              JOIN bm25_tf_v t ON p.doc_id = t.doc_id
              WHERE NOT t.term IN $Stop
              GROUP BY p.query_id, t.term) c
        LEFT JOIN bm25_qt_v q ON c.query_id = q.query_id AND c.term = q.term
        WHERE q.term IS NULL) nw) e
WHERE er <= $PrfTerms"""))
    StageViews.ensureCached(spark, "prf_scores_v", key)(spark.sql(s"""
SELECT query_id, doc_id, CAST(sum(c_bp) AS BIGINT) AS score_bp FROM (
  SELECT q.query_id, t.doc_id,
         ${cBpExpr(SparkSql, "fd.df", "t.tf", "dl.len")} AS c_bp
  FROM (SELECT query_id, term FROM bm25_qt_v
        UNION ALL SELECT query_id, term FROM prf_exp_v) q
  JOIN (SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM bm25_tf_v GROUP BY term) fd ON q.term = fd.term
  JOIN bm25_tf_v t ON q.term = t.term
  JOIN bm25_dl_v dl ON t.doc_id = dl.doc_id
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len) AS BIGINT) AS tl
              FROM bm25_dl_v) nn) x
GROUP BY query_id, doc_id"""))
    ()
  }

  private def prfStagedSparkSql: String = s"""
SELECT r.query_id, r.rank, r.doc_id, r.score_bp, l.exp_term_a, l.exp_term_b
FROM (SELECT query_id, doc_id, score_bp,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
      FROM (SELECT query_id, doc_id, score_bp,
                   ROW_NUMBER() OVER (PARTITION BY query_id, doc_id % $Salts
                                      ORDER BY score_bp DESC, doc_id) AS sr
            FROM prf_scores_v) p1
      WHERE sr <= $TopK) r
JOIN (SELECT q.query_id,
             coalesce(min(e.term), '') AS exp_term_a,
             coalesce(max(e.term), '') AS exp_term_b
      FROM (SELECT DISTINCT query_id FROM bm25_qt_v) q
      LEFT JOIN prf_exp_v e ON q.query_id = e.query_id
      GROUP BY q.query_id) l ON r.query_id = l.query_id
WHERE r.rank <= $TopK
ORDER BY r.query_id, r.rank"""

  private def runPrf(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    ensurePrfStages(spark, dir)
    spark.sql(prfStagedSparkSql)
  }

  val qPrf = Q("q_bm25_prf", runPrf _, Some(prfSql(DuckSql)))

  // ---- positional phrase search ----

  /** Phrase queries to derive and docs to keep per phrase. */
  val PhraseQueries = 10
  val PhraseTopK = 5

  /** Exact phrase retrieval — the positional-index operator BM25's
    * bag-of-words scoring cannot express: rank documents by how often
    * an exact two-word phrase occurs (adjacent positions, in order).
    * The per-doc positional bigram relation IS the positional index,
    * built once per corpus as a cached stage (`phr_dbg_v`); the phrase
    * workload is self-derived like BM25's — the [[PhraseQueries]] most
    * frequent non-stopword bigrams corpus-wide (ties by terms
    * ascending) — so both engines reproduce it with no out-of-band
    * fixture. Occurrences may overlap ("a a a" contains "a a" twice):
    * positional adjacency counts every position pair, the standard
    * positional-index semantics.
    *
    * Scale shape: ONE explode builds the positional bigrams (linear —
    * each position has exactly one successor), one groupBy collapses
    * them to per-(doc, bigram) counts, the 10-phrase workload
    * broadcasts against it, and the top-k is the same salted two-phase
    * rank as BM25's. All counts BIGINT.
    */
  private def phraseSql(d: SqlDialect, dbgRel: Option[String]): String = {
    val dbg = dbgRel.getOrElse("dbg")
    val dbgCte = dbgRel match {
      case Some(_) => ""
      case None => s"""
WITH dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents
            WHERE ${d.len(d.split("text"))} >= 2),
bi AS (${d.series("doc_id, w", d.len("w") + " - 1", "i", "dw")}),
dbg AS (SELECT doc_id, ${d.el("w", "i")} AS ta, ${d.el("w", "i + 1")} AS tb,
               CAST(count(*) AS BIGINT) AS cnt
        FROM bi
        WHERE NOT ${d.el("w", "i")} IN $Stop
          AND NOT ${d.el("w", "i + 1")} IN $Stop
        GROUP BY doc_id, ${d.el("w", "i")}, ${d.el("w", "i + 1")}),"""
    }
    val lead = if (dbgRel.isDefined) "WITH " else ""
    s"""
$dbgCte
${lead}wl AS (SELECT ta, tb, CAST(sum(cnt) AS BIGINT) AS total,
              CAST(ROW_NUMBER() OVER (ORDER BY sum(cnt) DESC, ta, tb) AS BIGINT) AS pr
       FROM $dbg GROUP BY ta, tb),
phrases AS (SELECT pr AS phrase_id, ta, tb FROM wl WHERE pr <= $PhraseQueries),
cand AS (SELECT p.phrase_id, p.ta, p.tb, g.doc_id, g.cnt
         FROM phrases p JOIN $dbg g ON p.ta = g.ta AND p.tb = g.tb),
p1 AS (SELECT phrase_id, ta, tb, doc_id, cnt,
              ROW_NUMBER() OVER (PARTITION BY phrase_id, doc_id % $Salts
                                 ORDER BY cnt DESC, doc_id) AS sr
       FROM cand),
p2 AS (SELECT phrase_id, ta, tb, doc_id, cnt,
              CAST(ROW_NUMBER() OVER (PARTITION BY phrase_id
                                      ORDER BY cnt DESC, doc_id) AS BIGINT) AS rank
       FROM p1 WHERE sr <= $PhraseTopK)
SELECT phrase_id, rank, doc_id, cnt AS phrase_tf, ta AS term_a, tb AS term_b
FROM p2 WHERE rank <= $PhraseTopK
ORDER BY phrase_id, rank"""
  }

  private[graft] def phraseSparkSqlForTest: String = phraseSql(SparkSql, None)

  private def runPhrase(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    // the positional index: per-(doc, adjacent bigram) counts, read
    // twice (workload derivation + candidate join)
    StageViews.ensureCached(spark, "phr_dbg_v", dir)(spark.sql(s"""
SELECT doc_id, ${SparkSql.el("w", "i")} AS ta, ${SparkSql.el("w", "i + 1")} AS tb,
       CAST(count(*) AS BIGINT) AS cnt
FROM (${SparkSql.series("doc_id, w", SparkSql.len("w") + " - 1", "i",
      s"(SELECT doc_id, ${SparkSql.split("text")} AS w FROM documents WHERE ${SparkSql.len(SparkSql.split("text"))} >= 2) dw")})
WHERE NOT ${SparkSql.el("w", "i")} IN $Stop
  AND NOT ${SparkSql.el("w", "i + 1")} IN $Stop
GROUP BY doc_id, ${SparkSql.el("w", "i")}, ${SparkSql.el("w", "i + 1")}"""))
    // nested spelling over the cached index (no WITH — substitution)
    spark.sql(s"""
SELECT phrase_id, rank, doc_id, cnt AS phrase_tf, ta AS term_a, tb AS term_b
FROM (SELECT phrase_id, ta, tb, doc_id, cnt,
             CAST(ROW_NUMBER() OVER (PARTITION BY phrase_id
                                     ORDER BY cnt DESC, doc_id) AS BIGINT) AS rank
      FROM (SELECT phrase_id, ta, tb, doc_id, cnt,
                   ROW_NUMBER() OVER (PARTITION BY phrase_id, doc_id % $Salts
                                      ORDER BY cnt DESC, doc_id) AS sr
            FROM (SELECT p.phrase_id, p.ta, p.tb, g.doc_id, g.cnt
                  FROM (SELECT pr AS phrase_id, ta, tb
                        FROM (SELECT ta, tb,
                                     CAST(ROW_NUMBER() OVER (ORDER BY total DESC, ta, tb) AS BIGINT) AS pr
                              FROM (SELECT ta, tb, CAST(sum(cnt) AS BIGINT) AS total
                                    FROM phr_dbg_v GROUP BY ta, tb) w0) wl
                        WHERE pr <= $PhraseQueries) p
                  JOIN phr_dbg_v g ON p.ta = g.ta AND p.tb = g.tb) cand) p1
      WHERE sr <= $PhraseTopK) p2
WHERE rank <= $PhraseTopK
ORDER BY phrase_id, rank""")
  }

  val qPhrase = Q("q_phrase_search", runPhrase _, Some(phraseSql(DuckSql, None)))

  // ---- incremental index maintenance (streaming) ----

  /** The BM25 query workload derived from a STREAMED corpus — the
    * incremental-index-maintenance composition a live retrieval service
    * runs: documents arrive as a stream, per-(doc, term) postings
    * presence dedups statefully, per-term document frequency aggregates
    * in complete mode, and the 40-term workload is derived from the
    * maintained df relation. Must equal the batch derivation exactly
    * (the oracle IS the batch spelling; Round18OpsSpec additionally
    * pins equality with the staged `bm25_qt_v` relation).
    *
    * State shape: the dropDuplicates state is postings-sized — at
    * 100 TB you bound it with `dropDuplicatesWithinWatermark` exactly
    * like q_dedup_stream_windowed (the recurrence semantics are pinned
    * there); the df aggregate's state and the memory sink are
    * VOCABULARY-sized, which saturates while the corpus grows.
    */
  val qIndexStream = Q(
    "q_bm25_index_stream",
    (spark, dir) => graft.GraftSession.withStreamingShuffle(spark,
      graft.GraftSession.adaptiveStreamParts(spark, dir, "documents"), noDataBatch = false) {
      import org.apache.spark.sql.functions.{col, count, lit, row_number}
      import org.apache.spark.sql.types._
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val sinkName = graft.GraftSession.newSinkName(spark, "bqi")
      val q = graft.Tables.streamTable(spark, dir, "documents", docSchema)
        .selectExpr("doc_id", "explode(split(text, ' ')) AS term")
        .where(s"NOT term IN $Stop")
        .dropDuplicates("doc_id", "term")
        .groupBy(col("term"))
        .agg(count(lit(1)).cast("bigint").as("df"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // batch post-processing over the vocabulary-sized sink: the same
      // (df DESC, term) rank the batch workload uses
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("df").desc, col("term"))
      spark.table(sinkName)
        .withColumn("qrank", row_number().over(w).cast("long"))
        .where(col("qrank") <= QueryTerms)
        .selectExpr("(qrank - 1) DIV 2 AS query_id", "term", "df")
        .orderBy("query_id", "term")
    },
    Some(s"""
WITH tf AS (${tfSql(DuckSql)}),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
qt AS (SELECT term, df,
              CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) AS BIGINT) AS qrank
       FROM df)
SELECT ${DuckSql.idiv("qrank - 1", "2")} AS query_id, term, df
FROM qt WHERE qrank <= $QueryTerms
ORDER BY query_id, term"""))

  // ---- hard-negative mining (BM25 negatives, near-dup-safe) ----

  /** BM25 rank depth mined for negatives (ranks 2..[[HnDepth]]). Deep
    * enough to reach PAST a cluster of exact/near duplicates of the
    * positive: on a corpus with ~10 copies per document (the sf1
    * replica measures exactly that) a depth-8 pool is copies only and
    * the dup screen correctly empties it — negatives must come from
    * the next distinct documents down the ranking.
    */
  val HnDepth = 32
  /** Negatives kept per query. */
  val HnK = 3
  /** Near-dup exclusion threshold — [[Dedup.ContainBp]] (7000 bp), the
    * SAME 5-gram-shingle containment notion and threshold as
    * q_doc_containment, so "too close to train against" and "corpus
    * near-dup" are one definition.
    */
  val NearDupBp: Long = Dedup.ContainBp

  /** Hard-negative mining for retriever training — the DPR recipe
    * (Karpukhin et al. 2020): for each query, the positive is the BM25
    * rank-1 document and the hard negatives are the next-highest BM25
    * candidates, which are exactly the lexically-confusable documents
    * a dense retriever must learn to separate. One correction the
    * plain recipe needs on a real (duplicated) corpus: a candidate
    * that is a NEAR-DUPLICATE of the positive is a false negative —
    * training on it teaches the model to separate a document from its
    * own copy — so candidates are screened by word-5-gram SHINGLE
    * containment against the positive (integer basis points,
    * 10000·|shared| DIV min(|pos sh|, |cand sh|) — q_doc_containment's
    * notion; a term-SET screen is useless on a small-vocabulary corpus
    * where every long document contains most of the vocabulary) and
    * dropped at ≥ [[NearDupBp]]. Documents too short to have shingles
    * (< 5 tokens) screen at 0 — un-screenable at this granularity,
    * never silently dropped. Candidates are also exact-deduped among
    * THEMSELVES (md5(text), keep the best-scored representative) — a
    * duplicated corpus otherwise mines k copies of one negative, which
    * is one negative's worth of training signal.
    *
    * Everything is BIGINT end-to-end (ranks, scores, containment), so
    * both engines agree bit-for-bit; ties break by doc_id ascending.
    *
    * Scale shape: the depth-[[HnDepth]] ranked list is ONE cached
    * narrow stage over the staged round-1 scores (two-phase salted
    * rank, per-salt keep = [[HnDepth]]) — the CTE chain then re-reads
    * that ≤ queries×[[HnDepth]]-row cache instead of recomputing the
    * window pipeline per mention (the WITH-CTE re-inlining lesson; the
    * un-staged spelling ran 3.5 s at sf0.1, the catalog's slowest
    * entry). Every join after it probes the shingle relation with
    * workload-sized key sets — never corpus×corpus.
    */
  /** The deduped candidate pool (ranks 2..[[HnDepth]], one
    * representative per distinct text) — the Spark side caches this
    * as `hn_cand_v` so the screening chain's three mentions read a
    * ≤ queries×[[HnDepth]]-row cache instead of re-running the dedup
    * window AND re-probing `documents` per CTE mention.
    */
  private def hnCandSql(rankRel: String, docsRel: String): String = s"""
SELECT query_id, doc_id, score_bp FROM (
  SELECT c.query_id, CAST(c.doc_id AS BIGINT) AS doc_id, c.score_bp,
         ROW_NUMBER() OVER (PARTITION BY c.query_id, md5(dd.text)
                            ORDER BY c.score_bp DESC, c.doc_id) AS dr
  FROM $rankRel c JOIN $docsRel dd ON c.doc_id = dd.doc_id
  WHERE c.rank > 1 AND c.rank <= $HnDepth) du
WHERE dr = 1"""

  private def hnPosSql(rankRel: String): String = s"""
SELECT query_id, CAST(doc_id AS BIGINT) AS pos_doc_id
FROM $rankRel WHERE rank = 1"""

  /** Screening + selection over pre-built pos/cand relations. The
    * size (nc) and overlap (ov) counts come from ONE aggregation
    * (candidate shingles LEFT JOIN the positive's shingles; count(*)
    * vs count(matched)) — half the joins of the two-aggregate
    * spelling.
    */
  private def hnScreenCtes(d: SqlDialect, posRel: String, candRel: String,
      shRel: String): String = s"""
hn_psh AS (SELECT p.query_id, s.shingle
           FROM $posRel p JOIN $shRel s ON p.pos_doc_id = s.doc_id),
hn_pn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS np
          FROM hn_psh GROUP BY query_id),
hn_co AS (SELECT c.query_id, c.doc_id,
                 CAST(count(*) AS BIGINT) AS nc,
                 CAST(count(p.shingle) AS BIGINT) AS ov
          FROM $candRel c JOIN $shRel s ON c.doc_id = s.doc_id
          LEFT JOIN hn_psh p
            ON p.query_id = c.query_id AND p.shingle = s.shingle
          GROUP BY c.query_id, c.doc_id),
hn_scored AS (SELECT c.query_id, c.doc_id, c.score_bp,
                     CAST(CASE WHEN pn.np IS NULL OR g.nc IS NULL THEN 0
                          ELSE ${d.idiv("10000 * g.ov", "LEAST(pn.np, g.nc)")}
                          END AS BIGINT) AS containment_bp
              FROM $candRel c
              LEFT JOIN hn_pn pn ON c.query_id = pn.query_id
              LEFT JOIN hn_co g ON c.query_id = g.query_id AND c.doc_id = g.doc_id),
hn_keep AS (SELECT query_id, doc_id, score_bp, containment_bp,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY score_bp DESC, doc_id) AS BIGINT) AS neg_rank
            FROM hn_scored WHERE containment_bp < $NearDupBp)"""

  /** The depth-[[HnDepth]] two-phase salted rank over a scores
    * relation — the oracle's CTE form; the Spark side caches the same
    * relation as `hn_rank_v`.
    */
  private def hnRankCtes(scoresRel: String): String = s"""
hn_r1 AS (SELECT query_id, doc_id, score_bp,
                 ROW_NUMBER() OVER (PARTITION BY query_id, doc_id % $Salts
                                    ORDER BY score_bp DESC, doc_id) AS sr
          FROM $scoresRel),
hn_rank AS (SELECT query_id, doc_id, score_bp,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
            FROM hn_r1 WHERE sr <= $HnDepth)"""

  private def hnSelect(posRel: String): String = s"""
SELECT k.query_id, k.neg_rank, p.pos_doc_id, k.doc_id AS neg_doc_id,
       CAST(k.score_bp AS BIGINT) AS neg_score_bp, k.containment_bp
FROM hn_keep k JOIN $posRel p ON k.query_id = p.query_id
WHERE k.neg_rank <= $HnK
ORDER BY k.query_id, k.neg_rank"""

  /** Self-contained spelling — the DuckDB oracle and the spec twin. */
  private def hnSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${hnRankCtes("scores")},
${Dedup.shingleCore(d)},
hn_pos AS (${hnPosSql("hn_rank")}),
hn_cand AS (${hnCandSql("hn_rank", "documents")}),
${hnScreenCtes(d, "hn_pos", "hn_cand", "sh")}
${hnSelect("hn_pos")}"""

  private[graft] def hnSparkSqlForTest: String = hnSql(SparkSql)

  private def runHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    Dedup.ensureShingles(spark, dir, graft.Tables.documents(spark, dir))
    // the ranked pool: ≤ queries×HnDepth narrow rows, cached so every
    // downstream mention re-reads it instead of re-running the window
    // pipeline over the scores relation. NO WITH in a cached view's
    // definition: CTE relation ids are fresh per parse, so a cached
    // plan containing WithCTE never `sameResult`s the re-resolved view
    // and substitution silently falls back to full recompute.
    StageViews.ensureCached(spark, "hn_rank_v", dir)(spark.sql(s"""
SELECT query_id, doc_id, score_bp, rank FROM (
  SELECT query_id, doc_id, score_bp,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
  FROM (SELECT query_id, doc_id, score_bp,
               ROW_NUMBER() OVER (PARTITION BY query_id, doc_id % $Salts
                                  ORDER BY score_bp DESC, doc_id) AS sr
        FROM bm25_scores_v) r1
  WHERE sr <= $HnDepth) r2
WHERE rank <= $HnDepth"""))
    // the deduped candidate pool: cached so the screening chain's
    // mentions never re-run the md5-dedup window or re-probe documents
    StageViews.ensureCached(spark, "hn_cand_v", dir)(
      spark.sql(hnCandSql("hn_rank_v", "documents")))
    // NESTED subqueries, not WITH: cache substitution does not reach
    // inside top-level CTE bodies (StageViews note 2) — the WITH
    // spelling of this query re-planned the ENTIRE bm25+rank+dedup
    // chain from parquet at every CTE mention (105 file scans, 11 s at
    // sf1); this spelling reads the three caches (3 s → 0.3 s).
    val pos = s"(${hnPosSql("hn_rank_v")})"
    // positives' shingles: ≤ |queries|·|doc shingles| rows, cached so
    // the np count and the overlap join scan sh_v once, not twice
    StageViews.ensureCached(spark, "hn_psh_v", dir)(spark.sql(s"""
SELECT p.query_id, s.shingle
FROM $pos p JOIN sh_v s ON p.pos_doc_id = s.doc_id"""))
    val psh = "hn_psh_v"
    spark.sql(s"""
SELECT k.query_id, k.neg_rank, p.pos_doc_id, k.doc_id AS neg_doc_id,
       CAST(k.score_bp AS BIGINT) AS neg_score_bp, k.containment_bp
FROM (
  SELECT query_id, doc_id, score_bp, containment_bp,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score_bp DESC, doc_id) AS BIGINT) AS neg_rank
  FROM (
    SELECT c.query_id, c.doc_id, c.score_bp,
           CAST(CASE WHEN pn.np IS NULL OR g.nc IS NULL THEN 0
                ELSE ${SparkSql.idiv("10000 * g.ov", "LEAST(pn.np, g.nc)")}
                END AS BIGINT) AS containment_bp
    FROM hn_cand_v c
    LEFT JOIN (SELECT query_id, CAST(count(*) AS BIGINT) AS np
               FROM $psh pp GROUP BY query_id) pn
      ON c.query_id = pn.query_id
    LEFT JOIN (SELECT c2.query_id, c2.doc_id,
                      CAST(count(*) AS BIGINT) AS nc,
                      CAST(count(ps.shingle) AS BIGINT) AS ov
               FROM hn_cand_v c2 JOIN sh_v s ON c2.doc_id = s.doc_id
               LEFT JOIN $psh ps
                 ON ps.query_id = c2.query_id AND ps.shingle = s.shingle
               GROUP BY c2.query_id, c2.doc_id) g
      ON c.query_id = g.query_id AND c.doc_id = g.doc_id) sc
  WHERE containment_bp < $NearDupBp) k
JOIN $pos p ON k.query_id = p.query_id
WHERE k.neg_rank <= $HnK
ORDER BY k.query_id, k.neg_rank""")
  }

  val qHardNegatives = Q("q_hard_negatives", runHardNegatives _,
    Some(hnSql(DuckSql)))

  // ---- best-snippet extraction (passage selection) ----

  /** Snippet window width, tokens. */
  val SnipW = 8

  /** Best-snippet extraction — the passage-selection operator a search
    * UI (and a RAG context builder) runs over each query's top hit:
    * the [[SnipW]]-token window of the document maximizing (distinct
    * query terms matched, then total matches, then earliest start).
    * All ordering keys are BIGINT counts and positions — no floats —
    * and the snippet string itself is a deterministic slice+join of
    * the whitespace tokenization both engines share.
    *
    * Scale shape: the only corpus-sized work is upstream (the staged
    * BM25 ranks and one probe of `documents` by the ≤ |queries| top
    * doc_ids — a broadcast-able semi-join, pushed to the scan as an
    * id filter at 100 TB). The window scoring explodes ≤ |queries|
    * documents × [[SnipW]] shifts of their MATCHED positions only —
    * workload-sized, not corpus-sized.
    */
  private def snippetCtes(d: SqlDialect, rankedRel: String, qtRel: String,
      docsRel: String): String = s"""
sn_doc AS (SELECT s.query_id, CAST(s.doc_id AS BIGINT) AS doc_id,
                  ${d.split("dd.text")} AS w
           FROM (SELECT query_id, doc_id FROM $rankedRel WHERE rank = 1) s
           JOIN $docsRel dd ON s.doc_id = dd.doc_id),
sn_tok AS (${d.series("query_id, doc_id, w", d.len("w"), "i", "sn_doc")}),
sn_hit AS (SELECT t.query_id, t.doc_id, t.i AS p, ${d.el("t.w", "t.i")} AS term,
                  ${d.len("t.w")} AS ln
           FROM sn_tok t JOIN $qtRel q
             ON t.query_id = q.query_id AND ${d.el("t.w", "t.i")} = q.term),
sn_sh AS (${d.series("query_id, doc_id, p, term, ln", SnipW.toString, "j", "sn_hit")}),
sn_win AS (SELECT query_id, doc_id, term, p - j + 1 AS s
           FROM sn_sh
           WHERE p - j + 1 >= 1 AND p - j + 1 <= GREATEST(1, ln - $SnipW + 1)),
sn_sc AS (SELECT query_id, doc_id, s,
                 CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                 CAST(count(*) AS BIGINT) AS n_hits
          FROM sn_win GROUP BY query_id, doc_id, s),
sn_best AS (SELECT query_id, doc_id, s, n_terms, n_hits,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY n_terms DESC, n_hits DESC, s) AS br
            FROM sn_sc)"""

  private def snippetSelect(d: SqlDialect): String = s"""
SELECT b.query_id, b.doc_id, CAST(b.s AS BIGINT) AS win_start, b.n_terms, b.n_hits,
       ${d.joinArr(d.slice("sd.w", "b.s", SnipW.toString))} AS snippet
FROM sn_best b JOIN sn_doc sd ON b.query_id = sd.query_id
WHERE b.br = 1
ORDER BY b.query_id"""

  /** Self-contained spelling — the DuckDB oracle and the spec twin. */
  private def snippetSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${snippetCtes(d, "r2", "qterms", "documents")}
${snippetSelect(d)}"""

  private[graft] def snippetSparkSqlForTest: String = snippetSql(SparkSql)

  private def runSnippet(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    // the ≤ |queries| top docs with their token arrays, cached so the
    // hit chain and the final slice read it without re-probing the
    // corpus; the whole final is nested (no WITH — substitution)
    StageViews.ensureCached(spark, "snip_doc_v", dir)(spark.sql(s"""
SELECT s.query_id, CAST(s.doc_id AS BIGINT) AS doc_id,
       ${SparkSql.split("dd.text")} AS w
FROM (SELECT query_id, doc_id FROM bm25_rank_v WHERE rank = 1) s
JOIN documents dd ON s.doc_id = dd.doc_id"""))
    val term = SparkSql.el("t.w", "t.i")
    spark.sql(s"""
SELECT b.query_id, b.doc_id, CAST(b.s AS BIGINT) AS win_start, b.n_terms, b.n_hits,
       ${SparkSql.joinArr(SparkSql.slice("sd.w", "b.s", SnipW.toString))} AS snippet
FROM (SELECT query_id, doc_id, s, n_terms, n_hits,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY n_terms DESC, n_hits DESC, s) AS br
      FROM (SELECT query_id, doc_id, s,
                   CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                   CAST(count(*) AS BIGINT) AS n_hits
            FROM (SELECT query_id, doc_id, term, p - j + 1 AS s
                  FROM (${SparkSql.series("query_id, doc_id, p, term, ln",
      SnipW.toString, "j", s"""
                        (SELECT t.query_id, t.doc_id, t.i AS p, $term AS term,
                                ${SparkSql.len("t.w")} AS ln
                         FROM (${SparkSql.series("query_id, doc_id, w",
      SparkSql.len("w"), "i", "snip_doc_v")}) t
                         JOIN bm25_qt_v q
                           ON t.query_id = q.query_id AND $term = q.term) hit""")})
                  WHERE p - j + 1 >= 1
                    AND p - j + 1 <= GREATEST(1, ln - $SnipW + 1)) sw
            GROUP BY query_id, doc_id, s) sc) b
JOIN snip_doc_v sd ON b.query_id = sd.query_id
WHERE b.br = 1
ORDER BY b.query_id""")
  }

  val qBestSnippet = Q("q_best_snippet", runSnippet _, Some(snippetSql(DuckSql)))

  // ---- faceted result counts ----

  /** Faceted search counts — the aggregation a search UI renders next
    * to the result list: for each query, the per-facet-value document
    * counts over its top-[[TopK]] hits, here over the two categorical
    * document facets (`lang`, `source`). Workload-sized: the facet
    * join probes `documents` with ≤ queries×[[TopK]] doc_ids (broadcast
    * probe side; an id-filtered scan at 100 TB), and the counts group
    * ≤ that many rows.
    */
  private def facetCtes(d: SqlDialect, rankedRel: String, docsRel: String): String = s"""
fc_j AS (SELECT f.query_id, dd.lang, dd.source
         FROM (SELECT query_id, doc_id FROM $rankedRel WHERE rank <= $TopK) f
         JOIN $docsRel dd ON f.doc_id = dd.doc_id)"""

  private def facetSelect: String = s"""
SELECT query_id, facet, val, n_docs FROM (
  SELECT query_id, 'lang' AS facet, lang AS val,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM fc_j GROUP BY query_id, lang
  UNION ALL
  SELECT query_id, 'source' AS facet, source AS val,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM fc_j GROUP BY query_id, source) u
ORDER BY query_id, facet, val"""

  private def facetSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${facetCtes(d, "r2", "documents")}
$facetSelect"""

  // ---- retrieval evaluation: MRR against the dense rank-1 label ----

  /** Retrieval evaluation — the MRR@k audit every retrieval stack runs
    * before swapping rankers: treating each query's dense cosine rank-1
    * document as the relevance label (the aligned-corpus assumption the
    * hybrid fusion already pins), score the BM25 top-[[TopK]] list by
    * reciprocal rank. Integer-exact: rr_bp = 10000 DIV rank, 0 when the
    * label is outside the lexical top-k (bm25_rank = 0 encodes the
    * miss), so the mean over queries is a ratio of exact BIGINTs.
    *
    * Scale shape: both inputs are the rankers' existing staged top
    * lists — the whole evaluation joins two ≤ |queries|·k relations.
    */
  private def mrrCtes(d: SqlDialect, bmRel: String, denseRel: String): String = s"""
mrr_rel AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(doc_id AS BIGINT) AS rel_doc
            FROM $denseRel WHERE rank = 1),
mrr_hit AS (SELECT r.query_id, r.rel_doc,
                   CAST(coalesce(b.rank, 0) AS BIGINT) AS bm25_rank
            FROM mrr_rel r LEFT JOIN $bmRel b
              ON r.query_id = b.query_id AND r.rel_doc = b.doc_id)"""

  private def mrrSelect(d: SqlDialect): String = s"""
SELECT query_id, rel_doc, bm25_rank,
       CAST(CASE WHEN bm25_rank = 0 THEN 0
            ELSE ${d.idiv("10000", "bm25_rank")} END AS BIGINT) AS rr_bp
FROM mrr_hit
ORDER BY query_id"""

  /** Self-contained spelling — the DuckDB oracle and the spec twin. */
  private def mrrSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${Similarity.bruteCtes(d)},
$bmTopCte,
${anTopCte("ranked")},
${mrrCtes(d, "bmtop", "antop")}
${mrrSelect(d)}"""

  private[graft] def mrrSparkSqlForTest: String = mrrSql(SparkSql)

  private def runMrr(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    Similarity.ensureBruteStage(spark, dir)
    // nested over the two cached rank views (no WITH — substitution)
    spark.sql(s"""
SELECT query_id, rel_doc, bm25_rank,
       CAST(CASE WHEN bm25_rank = 0 THEN 0
            ELSE ${SparkSql.idiv("10000", "bm25_rank")} END AS BIGINT) AS rr_bp
FROM (SELECT r.query_id, r.rel_doc, CAST(coalesce(b.rank, 0) AS BIGINT) AS bm25_rank
      FROM (SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(neighbor_id AS BIGINT) AS rel_doc
            FROM ann_brute_v WHERE rank = 1) r
      LEFT JOIN $bmTopSub b
        ON r.query_id = b.query_id AND r.rel_doc = b.doc_id) h
ORDER BY query_id""")
  }

  val qMrr = Q("q_retrieval_mrr", runMrr _, Some(mrrSql(DuckSql)))

  // ---- retrieval evaluation: recall@k against the dense top-k labels ----

  /** Recall@[[TopK]] — the third leg of the evaluation triad
    * (MRR grades the first hit's position, nDCG the graded ordering,
    * recall the raw coverage): treating each query's dense cosine
    * top-[[TopK]] as the relevant set, count how many the BM25
    * top-[[TopK]] recovers. Every probe query stays a row (zero-recall
    * included — the q_ann_ivf_recall discipline); recall_bp is the
    * exact integer ratio. Workload-sized: joins two ≤ |queries|·k
    * staged lists.
    */
  private def recallSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${Similarity.bruteCtes(d)},
$bmTopCte,
${anTopCte("ranked", TopK)},
rq AS (SELECT DISTINCT query_id FROM antop),
ov AS (SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_common
       FROM antop a JOIN bmtop b
         ON a.query_id = b.query_id AND a.doc_id = b.doc_id
       GROUP BY a.query_id)
SELECT rq.query_id,
       CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common,
       ${d.idiv("10000 * coalesce(ov.n_common, 0)", TopK.toString)} AS recall_bp
FROM rq LEFT JOIN ov ON rq.query_id = ov.query_id
ORDER BY rq.query_id"""

  private[graft] def recallSparkSqlForTest: String = recallSql(SparkSql)

  private def runRecall(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    Similarity.ensureBruteStage(spark, dir)
    val anSub = s"""(SELECT CAST(query_id AS BIGINT) AS query_id,
        CAST(neighbor_id AS BIGINT) AS doc_id
 FROM ann_brute_v WHERE rank <= $TopK)"""
    spark.sql(s"""
SELECT rq.query_id,
       CAST(coalesce(ov.n_common, 0) AS BIGINT) AS n_common,
       ${SparkSql.idiv("10000 * coalesce(ov.n_common, 0)", TopK.toString)} AS recall_bp
FROM (SELECT DISTINCT query_id FROM $anSub rq0) rq
LEFT JOIN (SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_common
           FROM $anSub a JOIN $bmTopSub b
             ON a.query_id = b.query_id AND a.doc_id = b.doc_id
           GROUP BY a.query_id) ov
  ON rq.query_id = ov.query_id
ORDER BY rq.query_id""")
  }

  val qRecall = Q("q_retrieval_recall", runRecall _, Some(recallSql(DuckSql)))

  // ---- retrieval evaluation: nDCG@k with graded dense labels ----

  /** Graded-relevance depth: dense ranks 1..3 carry gains 7/3/1
    * (the standard 2^rel − 1 for rel 3/2/1); deeper ranks are 0.
    */
  val NdcgGrades = 3

  /** nDCG@[[TopK]] of the BM25 list under graded dense labels — the
    * second retrieval-eval operator next to q_retrieval_mrr's binary
    * one: the dense cosine rank-1/2/3 neighbors carry gains 7/3/1
    * (2^rel − 1), and the BM25 list is scored with the standard
    * log2-position discount. The discount is [[SqlLog.log2x16]] —
    * dcg is Σ gain·160000 DIV L16(pos+1), pure BIGINT — and the
    * normalizer is the full-graded ideal (all three labels at
    * positions 1..3: 7·160000/16 + 3·160000/25 + 1·160000/32 =
    * 94200), a CONSTANT, so ndcg_bp = 10000·dcg DIV 94200 is an
    * absolute score comparable across queries and corpora. Both
    * engines run identical integer arithmetic.
    *
    * Scale shape: workload-sized like the MRR — two ≤ |queries|·k
    * staged top lists joined and summed.
    */
  private def ndcgCtes(d: SqlDialect, bmRel: String, denseRel: String): String = {
    def disc(pos: String) = SqlLog.log2x16(d, s"$pos + 1")
    s"""
nd_rel AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                  CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(CASE rank WHEN 1 THEN 7 WHEN 2 THEN 3 ELSE 1 END AS BIGINT) AS gain
           FROM $denseRel WHERE rank <= $NdcgGrades),
nd_hit AS (SELECT b.query_id, CAST(b.rank AS BIGINT) AS pos, r.gain
           FROM $bmRel b JOIN nd_rel r
             ON b.query_id = r.query_id AND b.doc_id = r.doc_id),
nd_dcg AS (SELECT query_id,
                  CAST(sum(${d.idiv("gain * 160000", disc("pos"))}) AS BIGINT) AS dcg_x,
                  CAST(count(*) AS BIGINT) AS n_rel_hit
           FROM nd_hit GROUP BY query_id),
nd_q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id FROM $denseRel)"""
  }

  private def ndcgSelect(d: SqlDialect): String = {
    def disc(i: Int) = SqlLog.log2x16(d, i.toString)
    // the full-graded ideal: gains 7/3/1 at positions 1/2/3
    val idcg = s"(${d.idiv("7 * 160000", disc(2))} + ${d.idiv("3 * 160000", disc(3))} + ${d.idiv("1 * 160000", disc(4))})"
    s"""
SELECT q.query_id,
       CAST(coalesce(g.dcg_x, 0) AS BIGINT) AS dcg_x,
       CAST(coalesce(g.n_rel_hit, 0) AS BIGINT) AS n_rel_hit,
       CAST(${d.idiv("10000 * coalesce(g.dcg_x, 0)", idcg)} AS BIGINT) AS ndcg_bp
FROM nd_q q LEFT JOIN nd_dcg g ON q.query_id = g.query_id
ORDER BY q.query_id"""
  }

  /** Self-contained spelling — the DuckDB oracle and the spec twin. */
  private def ndcgSql(d: SqlDialect): String = s"""
WITH tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
${Similarity.bruteCtes(d)},
$bmTopCte,
${anTopCte("ranked")},
${ndcgCtes(d, "bmtop", "antop")}
${ndcgSelect(d)}"""

  private[graft] def ndcgSparkSqlForTest: String = ndcgSql(SparkSql)

  private def runNdcg(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    Similarity.ensureBruteStage(spark, dir)
    val d = SparkSql
    val idcg = s"(${d.idiv("7 * 160000", SqlLog.log2x16(d, "2"))} + " +
      s"${d.idiv("3 * 160000", SqlLog.log2x16(d, "3"))} + " +
      s"${d.idiv("1 * 160000", SqlLog.log2x16(d, "4"))})"
    // nested over the two cached rank views (no WITH — substitution)
    spark.sql(s"""
SELECT q.query_id,
       CAST(coalesce(g.dcg_x, 0) AS BIGINT) AS dcg_x,
       CAST(coalesce(g.n_rel_hit, 0) AS BIGINT) AS n_rel_hit,
       CAST(${d.idiv("10000 * coalesce(g.dcg_x, 0)", idcg)} AS BIGINT) AS ndcg_bp
FROM (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id FROM ann_brute_v) q
LEFT JOIN (SELECT query_id,
                  CAST(sum(${d.idiv("gain * 160000", SqlLog.log2x16(d, "pos + 1"))}) AS BIGINT) AS dcg_x,
                  CAST(count(*) AS BIGINT) AS n_rel_hit
           FROM (SELECT b.query_id, CAST(b.rank AS BIGINT) AS pos, r.gain
                 FROM $bmTopSub b
                 JOIN (SELECT CAST(query_id AS BIGINT) AS query_id,
                              CAST(neighbor_id AS BIGINT) AS doc_id,
                              CAST(CASE rank WHEN 1 THEN 7 WHEN 2 THEN 3 ELSE 1 END AS BIGINT) AS gain
                       FROM ann_brute_v WHERE rank <= $NdcgGrades) r
                   ON b.query_id = r.query_id AND b.doc_id = r.doc_id) h
           GROUP BY query_id) g ON q.query_id = g.query_id
ORDER BY q.query_id""")
  }

  val qNdcg = Q("q_retrieval_ndcg", runNdcg _, Some(ndcgSql(DuckSql)))

  private[graft] def facetSparkSqlForTest: String = facetSql(SparkSql)

  private def runFacets(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    // the ≤ queries×TopK facet rows, cached so both facet group-bys
    // read one relation; nested spelling (no WITH — substitution)
    StageViews.ensureCached(spark, "fc_j_v", dir)(spark.sql(s"""
SELECT f.query_id, dd.lang, dd.source
FROM (SELECT query_id, doc_id FROM bm25_rank_v WHERE rank <= $TopK) f
JOIN documents dd ON f.doc_id = dd.doc_id"""))
    spark.sql(s"""
SELECT query_id, facet, val, n_docs FROM (
  SELECT query_id, 'lang' AS facet, lang AS val,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM fc_j_v GROUP BY query_id, lang
  UNION ALL
  SELECT query_id, 'source' AS facet, source AS val,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM fc_j_v GROUP BY query_id, source) u
ORDER BY query_id, facet, val""")
  }

  val qFacetCounts = Q("q_facet_counts", runFacets _, Some(facetSql(DuckSql)))

  private def runHybrid(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    Similarity.ensureBruteStage(spark, dir) // registers embeddings + cosine
    spark.sql(hybridStagedSparkSql)
  }

  val qHybrid = Q("q_hybrid_retrieval", runHybrid _, Some(hybridSql(DuckSql)))

  /** Hybrid retrieval over the SERVING dense ranker (r18 VERDICT task
    * 3): same RRF arithmetic as [[qHybrid]], but the dense list comes
    * from the two-level IVF index ([[Similarity]] `ann_ivfr_v`) instead
    * of the brute ground truth — the fusion a 100 TB RAG pipeline
    * actually runs, where the exact dense ranking is unaffordable and
    * the index's n^(3/4) probe budget is the whole point. Brute stays
    * the right GROUND TRUTH (q_retrieval_mrr/ndcg grade against it);
    * this entry is the production topology, and ScaleSmoke gates its
    * top-k overlap against the brute fusion (the q_ann_ivf_recall
    * discipline — the index must keep FINDING what exact fusion finds).
    *
    * The IVF index is deterministic (both engines derive every
    * parameter from count(*); seeds are first-by-id), so the oracle
    * restates the full chain exactly, as q_ann_ivf already does. Dense
    * depth is [[IvfAnnTopK]] = 5 (the index stage's retained ranks);
    * the dominance law still holds at depths (5, 5): worst both-lists
    * doc scores 2·(10000 DIV 65) = 306 bp > best single-list doc's
    * 10000 DIV 61 = 163 bp.
    */
  private def hybridIvfSql(d: SqlDialect): String = s"""
${Similarity.ivfRerankCtes(d)},
tf AS (${tfSql(d)}),
dl AS (SELECT doc_id, CAST(${dlen(d)} AS BIGINT) AS len FROM documents),
${bm25Ctes(d, "tf", "dl")},
$bmTopCte,
${anTopCte("ranked", IvfAnnTopK)},
${fusionSql(d, "bmtop", "antop")}"""

  private[graft] def hybridIvfSparkSqlForTest: String = hybridIvfSql(SparkSql)

  private def runHybridIvf(spark: SparkSession, dir: String): DataFrame = {
    StageViews.documents(spark, dir)
    ensureStages(spark, dir)
    Similarity.ensureIvfStages(spark, dir) // registers embeddings + cosine
    spark.sql(hybridStagedSql(anIvfTopSub))
  }

  val qHybridIvf = Q("q_hybrid_retrieval_ivf", runHybridIvf _, Some(hybridIvfSql(DuckSql)))

  /** Mean top-[[TopK]] overlap of the IVF fusion against the brute
    * fusion per probe query — ScaleSmoke's recall gate for
    * q_hybrid_retrieval_ivf. Self-contained CTE spellings (each probe
    * multiple is its own corpus key: build, read once, drop); the two
    * fusions run as separate statements because the brute and IVF
    * chains share relation names (meta/pairs/scored/ranked).
    */
  private[graft] def hybridIvfOverlapAt5On(spark: SparkSession, key: String,
      docs: => DataFrame, emb: => DataFrame): Double = {
    graft.functions.CosineSimilarity.register(spark)
    StageViews.ensure(spark, "documents", key)(StageViews.widen(spark, docs, "doc_id"))
    StageViews.ensure(spark, "embeddings", key)(StageViews.widen(spark, emb, "vec_id"))
    val ivfFused = spark.sql(hybridIvfSql(SparkSql))
    val bruteFused = spark.sql(hybridSql(SparkSql))
    val nq = bruteFused.select("query_id").distinct().count()
    if (nq == 0) 0.0
    else {
      val common = ivfFused.select("query_id", "doc_id")
        .intersect(bruteFused.select("query_id", "doc_id")).count()
      common.toDouble / (nq * TopK.toDouble)
    }
  }

  val all: Seq[Q] = Seq(qBm25, qHybrid, qHybridIvf, qPrf, qPhrase, qIndexStream,
    qHardNegatives, qBestSnippet, qFacetCounts, qMrr, qNdcg, qRecall)
}
