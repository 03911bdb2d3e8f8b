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
  def xor(a: String, b: String): String
  def strpos(str: String, sub: String): String
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
  def xor(a: String, b: String) = s"($a ^ $b)"
  def strpos(str: String, sub: String) = s"instr($str, $sub)"
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
  def xor(a: String, b: String) = s"xor($a, $b)"
  def strpos(str: String, sub: String) = s"strpos($str, $sub)"
}
