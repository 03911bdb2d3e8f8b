package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Privacy-audit operators over the customer quasi-identifiers — the
  * release gate a training-data pipeline runs before structured/user
  * data leaves the curation boundary (companion to q_pii_scrub, which
  * handles free text).
  *
  * `q_k_anonymity` walks the standard generalization ladder (Sweeney
  * 2002): a record's quasi-identifier tuple is (nation, market
  * segment, account-balance band); if its full-precision group has
  * < [[Privacy.K]] members, the balance generalizes away (level 1),
  * then the segment (level 2), then the record is suppressed
  * (level 3). Because the ladder levels NEST, the corpus is grouped
  * ONCE at full precision and every coarser level aggregates the
  * group relation, not the data — the level-assignment joins run over
  * group-sized (broadcast-able) relations at any scale. Output is the
  * per-level census: how many records (and level-0 atoms) become
  * k-anonymous at each rung, with exact basis-point shares.
  *
  * `q_l_diversity` is the complementary audit (Machanavalli et al.
  * 2007): within each (nation, segment) group, how many DISTINCT
  * balance bands appear — a group can be k-anonymous yet expose its
  * members' balance if every member shares one band. One
  * map-side-combinable groupBy with a two-phase count(DISTINCT).
  *
  * Determinism: the balance band is ⌊c_acctbal / 1000⌋ via the DOUBLE
  * floor — both engines read the identical parquet double and IEEE
  * division/floor are exact-deterministic, so the band agrees
  * bit-for-bit (the q_corpus_temperature sqrt argument). Every output
  * column is BIGINT/VARCHAR/BOOLEAN.
  */
object Privacy {

  /** k-anonymity threshold. */
  val K = 5L
  /** l-diversity threshold on the balance band. */
  val L = 3L

  private def qidCte(rel: String): String = s"""
q AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
      FROM $rel)"""

  private[graft] def kAnonymitySql(d: SqlDialect, rel: String = "customer"): String = s"""
WITH ${qidCte(rel)},
g0 AS (SELECT nat, seg, band, CAST(count(*) AS BIGINT) AS n0
       FROM q GROUP BY nat, seg, band),
g1 AS (SELECT nat, seg, CAST(sum(n0) AS BIGINT) AS n1 FROM g0 GROUP BY nat, seg),
g2 AS (SELECT nat, CAST(sum(n1) AS BIGINT) AS n2 FROM g1 GROUP BY nat),
lv AS (SELECT g0.n0,
              CASE WHEN g0.n0 >= $K THEN 0
                   WHEN g1.n1 >= $K THEN 1
                   WHEN g2.n2 >= $K THEN 2
                   ELSE 3 END AS anon_level
       FROM g0 JOIN g1 ON g0.nat = g1.nat AND g0.seg = g1.seg
       JOIN g2 ON g0.nat = g2.nat),
tot AS (SELECT CAST(sum(n0) AS BIGINT) AS n FROM g0)
SELECT CAST(anon_level AS BIGINT) AS anon_level,
       CAST(sum(n0) AS BIGINT) AS n_records,
       CAST(count(*) AS BIGINT) AS n_atoms,
       ${d.idiv("10000 * CAST(sum(n0) AS BIGINT)", "tot.n")} AS share_bp
FROM lv CROSS JOIN tot
GROUP BY anon_level, tot.n
ORDER BY anon_level"""

  private[graft] def lDiversitySql(d: SqlDialect, rel: String = "customer"): String = s"""
WITH ${qidCte(rel)}
SELECT nat AS nationkey, seg AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(DISTINCT band) AS BIGINT) AS l_div,
       count(DISTINCT band) >= $L AS diverse
FROM q GROUP BY nat, seg
ORDER BY nationkey, mktsegment"""

  // Spark side reads through a query-unique view name so registering
  // it can never invalidate caches hanging off a shared `customer`
  // view (the StageViews invalidation note).
  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.customer(spark, dir).createOrReplaceTempView("customer_priv")
    spark.sql(sql)
  }

  val qKAnonymity = Q("q_k_anonymity",
    run(kAnonymitySql(SparkSql, "customer_priv")) _,
    Some(kAnonymitySql(DuckSql)))

  val qLDiversity = Q("q_l_diversity",
    run(lDiversitySql(SparkSql, "customer_priv")) _,
    Some(lDiversitySql(DuckSql)))

  /** t-closeness threshold in basis points (t = 0.20). */
  val TBp = 2000L

  /** `q_t_closeness` completes the release-gate triad (Li, Li,
    * Venkatasubramanian 2007): a group can be k-anonymous AND
    * l-diverse yet still leak — if its balance-band DISTRIBUTION skews
    * far from the corpus-wide one, membership alone shifts an
    * attacker's posterior. For an ORDERED sensitive attribute the
    * distance is the Earth Mover's Distance, which over m ordered
    * bands reduces to Σ|running cumulative difference| / (m−1).
    *
    * Integer-exact EMD: with group counts c_i (total n) and global
    * counts g_i (total N), the per-band probability difference
    * c_i/n − g_i/N clears denominators as c_i·N − g_i·n — BIGINT.
    * emd_bp = 10000·Σ|cum_i| DIV ((m−1)·n·N). Headroom: Σ|cum| ≤
    * (m−1)·n·N, so the dividend needs 10⁴·(m−1)·n·N < 2⁶³ — holds to
    * n·N ≈ 3×10¹⁴ per group at m ≈ 30; past that, pre-divide N out of
    * the cumulative sum.
    *
    * Scale shape: ONE corpus-sized groupBy builds the (group, band)
    * counts; everything after — the band domain, the zero-filled
    * grid (groups × bands), the per-group cumulative window — is
    * group-sized (broadcastable at any corpus size), and the window
    * partitions by group, never unbounded.
    */
  private[graft] def tClosenessSql(d: SqlDialect, rel: String = "customer"): String = s"""
WITH ${qidCte(rel)},
gb AS (SELECT nat, seg, band, CAST(count(*) AS BIGINT) AS c
       FROM q GROUP BY nat, seg, band),
gn AS (SELECT nat, seg, CAST(sum(c) AS BIGINT) AS n FROM gb GROUP BY nat, seg),
bd AS (SELECT band, CAST(sum(c) AS BIGINT) AS g FROM gb GROUP BY band),
nn AS (SELECT CAST(sum(g) AS BIGINT) AS nt,
              GREATEST(CAST(count(*) AS BIGINT) - 1, 1) AS m1 FROM bd),
grid AS (SELECT gn.nat, gn.seg, gn.n, bd.band, bd.g,
                coalesce(gb.c, CAST(0 AS BIGINT)) AS c
         FROM gn CROSS JOIN bd
         LEFT JOIN gb ON gn.nat = gb.nat AND gn.seg = gb.seg AND bd.band = gb.band),
cum AS (SELECT nat, seg, n,
               SUM(c * nn.nt - g * n) OVER (PARTITION BY nat, seg ORDER BY band
                                            ROWS UNBOUNDED PRECEDING) AS cd,
               nn.nt, nn.m1
        FROM grid CROSS JOIN nn)
SELECT nat AS nationkey, seg AS mktsegment,
       CAST(n AS BIGINT) AS n_records,
       ${d.idiv("10000 * CAST(sum(abs(cd)) AS BIGINT)", "m1 * n * nt")} AS emd_bp,
       ${d.idiv("10000 * CAST(sum(abs(cd)) AS BIGINT)", "m1 * n * nt")} <= $TBp AS close
FROM cum
GROUP BY nat, seg, n, nt, m1
ORDER BY nationkey, mktsegment"""

  val qTCloseness = Q("q_t_closeness",
    run(tClosenessSql(SparkSql, "customer_priv")) _,
    Some(tClosenessSql(DuckSql)))

  val all: Seq[Q] = Seq(qKAnonymity, qLDiversity, qTCloseness)
}
