package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash primitives for the LLM-data-pipeline operators.
  *
  * Everything here is ENGINE-NEUTRAL on purpose: the same normalization,
  * shingling and 32-bit md5-derived hash are expressible verbatim in ANSI
  * SQL (`('0x' || substr(md5(x),1,8))::BIGINT` in DuckDB ⇔
  * `conv(substr(md5(x),1,8),16,10)` in Spark), so every dedup/similarity
  * operator built on them has an exact, hash-matchable oracle — integer
  * arithmetic end to end, no engine-specific hash functions.
  *
  * All column expressions are built-in Catalyst functions (codegen'd); no
  * UDFs anywhere, so whole-stage codegen spans stay wide.
  */
object TextOps {

  /** Mersenne prime 2^31-1: modulus for all 32-bit hash arithmetic
    * (products with <2^32 hashes stay under 2^63 — no overflow in either
    * engine, ANSI mode included). */
  val P: Long = 2147483647L

  /** Whitespace-collapsed, trimmed, lower-cased text. The whitespace
    * class is spelled EXPLICITLY because Java's `\s` and RE2's (DuckDB's)
    * `\s` differ on vertical tab — an implicit class would silently
    * desync the oracles on exotic input. Keep in lockstep with
    * `LlmQueries.NormSql`. */
  val WhitespaceClass = "[ \\t\\n\\r\\f\\x0B]+"
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, WhitespaceClass, " ")))

  /** Normalized word array. */
  def words(c: Column): Column = split(normText(c), " ")

  /** Word n-grams (order-preserving, with duplicates) of a word-array
    * column. Guarded so docs shorter than `n` words yield an empty array
    * (Spark's `sequence(1, 0)` would DESCEND, not return empty).
    *
    * The word array is bound ONCE as a lambda variable via the
    * one-element-array wrapper: a naive
    * `transform(sequence(...), i -> slice($col, i, n))` re-evaluates the
    * full `$col` expression (regexp + split after projection collapse) for
    * EVERY sequence element — measured as a ~25× slowdown on the shingle
    * pipeline. CSE does not reach inside lambda bodies; the explicit
    * binding does. */
  def wordNgrams(wordsCol: String, n: Int): Column = expr(
    s"""element_at(transform(array($wordsCol), arr ->
       |  CASE WHEN size(arr) >= $n
       |    THEN transform(sequence(1, size(arr) - ${n - 1}),
       |                   i -> concat_ws(' ', slice(arr, i, $n)))
       |    ELSE filter(arr, x -> false) END), 1)""".stripMargin)

  /** Portable 32-bit hash: first 8 hex chars of md5, as a long in
    * [0, 2^32). DuckDB: `('0x' || substr(md5(x),1,8))::BIGINT`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The DuckDB SQL fragment equivalent to [[hash32]], for oracle
    * builders. */
  def hash32Sql(x: String): String =
    s"('0x' || substr(md5($x), 1, 8))::BIGINT"

  /** MinHash permutation constants (deterministic, shared with oracles):
    * h_i(x) = (a_i * x + b_i) mod P. */
  def permConstants(numHashes: Int): Seq[(Int, Long, Long)] =
    (0 until numHashes).map { i =>
      val a = (2654435761L * (i + 1) + 1) % P
      val b = (40503L * 65537L * (i + 1) + 12345L) % P
      (i, a, b)
    }
}
