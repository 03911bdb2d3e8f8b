package graft.operators

/** Tiny dialect shim for the few constructs Spark SQL and DuckDB spell
  * differently. Every extension-operator query is built ONCE as a SQL
  * template over these and rendered for both engines, so the Spark plan
  * and the DuckDB oracle cannot drift semantically.
  */
sealed trait SqlDialect {
  /** split on a literal single space → array of words */
  def split(col: String): String
  def len(arr: String): String
  /** 1-based element access */
  def el(arr: String, idx1: String): String
  /** SELECT cols, <series 1..n> AS alias FROM src (lateral) */
  def series(cols: String, n: String, alias: String, src: String): String
  /** SELECT <series 1..n> AS alias (standalone) */
  def seriesTable(n: String, alias: String): String
  def shr(x: String, bits: String): String
  def shl(x: String, bits: String): String
  def xor(a: String, b: String): String
  def strpos(str: String, sub: String): String
  /** integer (floor) division of non-negative integers */
  def idiv(a: String, b: String): String
  /** 1-based array slice of `len` elements starting at `start1`,
    * truncated at the array end
    */
  def slice(arr: String, start1: String, len: String): String
  /** join a string array with a single-space separator */
  def joinArr(arr: String): String
  /** element-wise negation of a numeric array (exact in IEEE — safe
    * cross-engine, unlike arithmetic that rounds) */
  def negArr(arr: String): String
  /** floor(log2(x)) of a POSITIVE integer, computed exactly as
    * (binary-digit count − 1) — never through float log2, whose last
    * ulp is libm-implementation-specific across engines
    */
  def floorLog2(x: String): String
  /** aggregate: string values joined by single spaces in ascending
    * `orderCol` order — deterministic regardless of input row order
    * (Spark's collect_list is order-free; the sort pins it)
    */
  def orderedConcat(term: String, orderCol: String): String
}

case object SparkSql extends SqlDialect {
  def split(col: String) = s"split($col, ' ')"
  def len(arr: String) = s"size($arr)"
  def el(arr: String, idx1: String) = s"element_at($arr, CAST(($idx1) AS INT))"
  def series(cols: String, n: String, alias: String, src: String) =
    s"SELECT $cols, explode(sequence(1, $n)) AS $alias FROM $src"
  def seriesTable(n: String, alias: String) =
    s"SELECT explode(sequence(1, $n)) AS $alias"
  def shr(x: String, bits: String) = s"shiftright($x, CAST(($bits) AS INT))"
  def shl(x: String, bits: String) = s"shiftleft($x, CAST(($bits) AS INT))"
  def xor(a: String, b: String) = s"($a ^ $b)"
  def strpos(str: String, sub: String) = s"instr($str, $sub)"
  def idiv(a: String, b: String) = s"(($a) DIV ($b))"
  def slice(arr: String, start1: String, len: String) =
    s"slice($arr, CAST(($start1) AS INT), CAST(($len) AS INT))"
  def joinArr(arr: String) = s"array_join($arr, ' ')"
  def negArr(arr: String) = s"transform($arr, x -> -x)"
  def floorLog2(x: String) = s"(length(bin($x)) - 1)"
  def orderedConcat(term: String, orderCol: String) =
    s"array_join(transform(array_sort(collect_list(struct($orderCol AS o, $term AS t))), x -> x.t), ' ')"
}

/** Cross-engine hashing building block: md5() is the one hash function
  * whose output is bit-identical in Spark and DuckDB, so every
  * hash-partitioned operator family (LSH bands, bloom filters, count-min
  * rows) derives its integers from md5 hex digits.
  */
object SqlHash {
  /** 32-bit non-negative integer from the 8 hex chars of `hexCol` (an
    * md5() output) starting at 1-based char `off`. Distinct offsets read
    * disjoint digest bits (md5 gives 32 hex chars = 4 disjoint 32-bit
    * words), so they act as independent hash functions at no extra
    * digest cost.
    */
  def hex32(d: SqlDialect, hexCol: String, off: Int): String = (0 until 8)
    .map { i =>
      val c = s"substr($hexCol, ${off + i}, 1)"
      s"(${d.strpos("'0123456789abcdef'", c)} - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
    }
    .mkString("(", " + ", ")")
}

/** Integer fixed-point base-2 logarithm: L(x) ≈ 16·log2(x) for x ≥ 1,
  * computed EXACTLY in BIGINT arithmetic — leading-bit position (the
  * dialect's [[SqlDialect.floorLog2]], itself digit-count-exact) plus a
  * 16-entry lookup on the 4 mantissa bits below it. Monotone
  * non-decreasing, max error 0.134 bits, and — the property the DSIR
  * scorer needs — IDENTICAL in both engines, where a libm log would
  * diverge in the last ulp. L(1) = 0 exactly; equal inputs give equal
  * outputs, so ratio scores of identical distributions cancel to 0
  * exactly.
  */
object SqlLog {
  /** ⌊16·log2(1 + i/16)⌋ for i in 0..15. */
  private val Lut = Seq(0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 12, 13, 14, 15)

  /** Render L(x) for a non-negative-integer SQL expression `x` ≥ 1. */
  def log2x16(d: SqlDialect, x: String): String = {
    val fl = d.floorLog2(x)
    // (16x >> fl) ∈ [16, 32); its low 4 bits are the mantissa index —
    // one spelling covers both the fl ≥ 4 (shift right) and fl < 4
    // (shift left) regimes
    val frac = s"((${d.idiv(s"16 * ($x)", d.shl("CAST(1 AS BIGINT)", fl))}) % 16)"
    val cases = Lut.zipWithIndex.map { case (v, i) => s"WHEN $i THEN $v" }.mkString(" ")
    s"(16 * ($fl) + CASE $frac $cases ELSE 0 END)"
  }
}

case object DuckSql extends SqlDialect {
  def split(col: String) = s"string_split($col, ' ')"
  def len(arr: String) = s"len($arr)"
  def el(arr: String, idx1: String) = s"list_extract($arr, $idx1)"
  def series(cols: String, n: String, alias: String, src: String) =
    s"SELECT $cols, unnest(generate_series(1, $n)) AS $alias FROM $src"
  def seriesTable(n: String, alias: String) =
    s"SELECT unnest(generate_series(1, $n)) AS $alias"
  def shr(x: String, bits: String) = s"($x >> ($bits))"
  def shl(x: String, bits: String) = s"($x << ($bits))"
  def xor(a: String, b: String) = s"xor($a, $b)"
  def strpos(str: String, sub: String) = s"strpos($str, $sub)"
  def idiv(a: String, b: String) = s"(($a) // ($b))"
  def slice(arr: String, start1: String, len: String) =
    s"list_slice($arr, $start1, ($start1) + ($len) - 1)"
  def joinArr(arr: String) = s"array_to_string($arr, ' ')"
  def negArr(arr: String) = s"list_transform($arr, x -> -x)"
  def floorLog2(x: String) = s"(length(format('{:b}', $x)) - 1)"
  def orderedConcat(term: String, orderCol: String) =
    s"string_agg($term, ' ' ORDER BY $orderCol)"
}
