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

  /** TOKENIZER CONTRACT (pinned, round 6): both engines must produce
    * bit-identical tokens for ARBITRARY input, so the contract uses
    * only operations with identical semantics in Spark/Java and
    * DuckDB/utf8proc/RE2:
    *  - lowercasing is ASCII-range only, via translate(A-Z → a-z).
    *    Java's String.toLowerCase is context-sensitive (final-sigma
    *    Σ→ς, İ→i̇) where DuckDB's utf8proc lower is not — so full
    *    Unicode lower() can silently diverge; translate cannot.
    *  - the whitespace class is explicit: [ \t\n\x0B\f\r] (what Java
    *    regex \s means) — RE2's \s omits \x0B, so '\s' spelled on
    *    both sides is NOT the same class.
    * Non-ASCII letters pass through unchanged on both sides. */
  private val Uppers = ('A' to 'Z').mkString
  private val Lowers = ('a' to 'z').mkString
  val WsClass = "[ \\t\\n\\x0B\\f\\r]"

  /** The same class spelled for RE2 (DuckDB regexp functions) — for
    * splicing into oracle SQL regex literals. */
  val WsClassRe2 = "[ \\t\\n\\x0b\\f\\r]"

  /** ASCII-lowercased whitespace tokens, empties dropped (split keeps
    * trailing empties; DuckDB's string_split_regex does too — both
    * sides filter). See the tokenizer contract above. */
  def tokens(c: Column): Column =
    filter(split(translate(c, Uppers, Lowers), WsClass + "+"), t => t =!= "")

  /** ASCII-range lowercase — the contract's lowercasing primitive for
    * non-tokenizing call sites that previously used lower(). */
  def asciiLower(c: Column): Column = translate(c, Uppers, Lowers)

  /** The DuckDB mirror of [[tokens]] over a column named `text` —
    * the ONE shared oracle-side tokenizer string (was repeated
    * per-file before round 6). */
  val tokensSql: String =
    s"list_filter(string_split_regex(translate(text, '$Uppers', '$Lowers'), " +
      "'[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')"

  /** DuckDB mirror of [[asciiLower]] applied to an arbitrary SQL
    * expression. */
  def asciiLowerSql(e: String): String =
    s"translate($e, '$Uppers', '$Lowers')"

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
