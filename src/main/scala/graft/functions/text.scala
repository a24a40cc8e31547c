package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup/text-analysis operators (§2.C/E).
  *
  * Everything here is built from codegen'd higher-order builtins
  * (transform/filter/aggregate) — no Scala UDFs — so the expressions
  * stay inside whole-stage codegen and, where an operator has a
  * DuckDB oracle, the oracle SQL mirrors the exact same operation
  * shapes for bit-identical results.
  */
object text {

  /** Lowercased whitespace tokens, empties dropped (split keeps
    * trailing empties; DuckDB's string_split_regex does too — both
    * sides filter). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** Distinct n-token shingles joined with single spaces. Guarded:
    * sequence(1, size-n+1) would count DOWN for short docs. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))

  /** ALL n-token grams in order, WITH multiplicity (shingles() is the
    * distinct-set variant for Jaccard; this one feeds frequency
    * counting). Same short-doc guard. */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Polynomial rolling hash over the raw characters:
    * fold(acc*31 + codepoint) mod 1e9+7, as the native zero-
    * allocation [[graft.plans.RollingHashExpr]] (the builtin
    * split('')+ascii fold allocates a string per character — it was
    * half the task time of every token-hashing operator). Oracle
    * mirror: list_reduce(list_prepend(0, ...)). */
  def rollingHash(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.RollingHashExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** The builtin-composition form of [[rollingHash]] — kept as the
    * cross-check twin for RollingHashSpec (expr ≡ builtin on the
    * corpus), not used in operator hot paths. */
  def rollingHashBuiltin(c: Column): Column =
    aggregate(
      transform(filter(split(c, ""), ch => ch =!= ""),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Stopword membership count ratio used by quality scoring. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")
}
