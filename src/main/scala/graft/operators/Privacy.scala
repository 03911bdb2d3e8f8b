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

  val all: Seq[Q] = Seq(qKAnonymity, qLDiversity)
}
