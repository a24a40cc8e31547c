package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.text

/** Cross-engine tokenizer-contract fuzz dump (dev tool, driven by
  * tools/fuzz_tokens.py).
  *
  * Reads `<inDir>/fuzz.parquet` (doc_id, text) — arbitrary, fuzzer-
  * generated strings including the Unicode edge cases the synthetic
  * corpus never exercises (final sigma, dotted İ, combining marks,
  * astral emoji, NEL/NBSP/LS/PS, vertical tab) — and dumps every
  * primitive of the pinned tokenizer contract (functions.text) to
  * `<outDir>/` parquet, next to `fuzz_oracle.json` with the DuckDB
  * mirror of each dump. fuzz_tokens.py then runs the mirrors and
  * compares cell-by-cell under the strict selfcheck discipline.
  *
  * This is the guard the round-5 `vocab_coverage` red demanded: that
  * divergence (Java full-lower + Java \s vs utf8proc lower + RE2 \s)
  * was data-dependent and invisible until the driver's corpus
  * happened to contain an affected token. The fuzzer makes the
  * contract's equivalence an EXERCISED property, not an argument. */
object FuzzTokens {

  /** (name → (DataFrame builder, DuckDB mirror over view `fuzz`)). */
  def dumps(inDir: String): Map[String, (org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame, String)] = {
    val rhSql = (e: String) =>
      "list_reduce(list_prepend(cast(0 as bigint), " +
        s"list_transform(string_split($e, ''), c -> cast(ascii(c) as bigint))), " +
        "(acc, x) -> (acc * 31 + x) % 1000000007)"
    Map(
      // ordered token stream: position pins ORDER, not just multiset
      "fuzz_tokens" -> ((s => {
        val docs = s.read.parquet(inDir + "/fuzz.parquet")
        docs.select(col("doc_id"),
            posexplode(text.tokens(col("text"))).as(Seq("pos", "token")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
      }): org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame,
        s"""WITH t AS (SELECT doc_id, ${text.tokensSql} AS tk FROM fuzz)
           |SELECT doc_id, cast(i - 1 as bigint) AS pos, tk[i] AS token
           |FROM t, unnest(range(1, len(tk) + 1)) AS u(i)""".stripMargin),
      // per-doc scalars: ascii-lower round trip, codepoint length,
      // rolling-hash fingerprint, contract-whitespace count
      "fuzz_scalars" -> ((s => {
        val docs = s.read.parquet(inDir + "/fuzz.parquet")
        docs.select(col("doc_id"),
          text.asciiLower(col("text")).as("lowered"),
          length(col("text")).cast("long").as("n_cp"),
          text.rollingHash(col("text")).as("fp"),
          size(filter(split(col("text"), ""),
            ch => ch.rlike("^" + text.WsClass + "$")))
            .cast("long").as("n_ws"))
      }): org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame,
        s"""SELECT doc_id,
           |  ${text.asciiLowerSql("text")} AS lowered,
           |  cast(length(text) as bigint) AS n_cp,
           |  ${rhSql("text")} AS fp,
           |  cast(len(list_filter(string_split(text, ''),
           |    c -> regexp_matches(c, '^${text.WsClassRe2}$$')))
           |    as bigint) AS n_ws
           |FROM fuzz""".stripMargin))
  }

  def main(args: Array[String]): Unit = {
    val (inDir, outDir) = (args(0), args(1))
    val spark = GraftSession.get("local[8]", 8)
    Files.createDirectories(Paths.get(outDir))
    val ds = dumps(inDir)
    ds.foreach { case (name, (build, _)) =>
      build(spark).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
    }
    val json = ds.map { case (name, (_, sql)) =>
      graft.Bench.jsonStr(name) + ":" + graft.Bench.jsonStr(sql)
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(outDir, "fuzz_oracle.json"), json)
    println(s"[fuzz] dumped ${ds.size} relations to $outDir")
    spark.stop()
  }
}
