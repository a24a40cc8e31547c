package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.text

/** §2.E — corpus-level vocabulary statistics over `documents`.
  *
  * Where TextOps is all narrow per-document maps, these two operators
  * are the corpus-global aggregations a tokenizer/vocab-building stage
  * needs: document frequency with pruning decisions, and per-language
  * n-gram frequency ranking. Both are single-shuffle aggregations
  * whose reduce keys are tokens/n-grams — at 100 TB the heavy explode
  * happens map-side and partial aggregation collapses each partition's
  * token multiset before anything moves, so shuffle volume is bounded
  * by per-partition DISTINCT tokens, not corpus token count.
  */
object VocabOps {

  /** Vocab pruning bounds: drop tokens seen in < MinDf docs (noise /
    * typos) or in more than half the corpus (stopwords carry no
    * signal). Both thresholds compare INTEGERS (doc_freq·2 ≤ n_docs),
    * so the keep flag is exact in both engines; df_ratio is published
    * for inspection only. */
  private val MinDf = 2

  /** Per-token document frequency + keep/prune decision. The corpus
    * size joins in as a broadcast 1-row aggregate — no driver action,
    * no second scan barrier in the plan. */
  def docFreq(s: SparkSession, d: String): DataFrame =
    docFreqFromDocs(Tables.parallelize(Tables.documents(s, d)))

  /** `docs` needs a `text` column. */
  private[graft] def docFreqFromDocs(docs: DataFrame): DataFrame = {
    val tok = docs.select(
      explode(array_distinct(text.tokens(col("text")))).as("token"))
    val df = tok.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    df.crossJoin(broadcast(nd)).select(
      col("token"),
      col("doc_freq"),
      (col("doc_freq") * lit(1.0) / col("n_docs")).as("df_ratio"),
      (col("doc_freq") >= MinDf && col("doc_freq") * 2 <= col("n_docs"))
        .as("keep"))
  }

  private val docFreqSql = {
    val toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    s"""WITH tok AS (
       |  SELECT unnest(list_distinct($toks)) AS token FROM documents),
       |df AS (SELECT token, count(*) AS doc_freq FROM tok GROUP BY 1),
       |nd AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT token, doc_freq,
       |  doc_freq * 1.0 / n_docs AS df_ratio,
       |  (doc_freq >= $MinDf AND doc_freq * 2 <= n_docs) AS keep
       |FROM df, nd""".stripMargin
  }

  private val TopK = 20

  /** Top-K bigrams per language by occurrence count, ranked through
    * the custom bounded-heap top-k operator (map-side partial heaps —
    * the (lang, ngram) count relation never sorts globally). */
  def ngramTopK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(s, d))
    val grams = docs.select(col("lang"),
      explode(text.ngrams(text.tokens(col("text")), 2)).as("ngram"))
    val counts = grams.groupBy("lang", "ngram").agg(count(lit(1)).as("n"))
    graft.functions.topk.perKey(counts,
      keys = Seq("lang"),
      order = Seq(graft.functions.topk.Order("n", ascending = false),
        graft.functions.topk.Order("ngram")),
      k = TopK)
  }

  private val ngramTopKSql = {
    val toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    s"""WITH t AS (SELECT lang, $toks AS toks FROM documents),
       |g AS (
       |  SELECT lang,
       |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))
       |      AS ngram
       |  FROM t),
       |c AS (SELECT lang, ngram, count(*) AS n FROM g GROUP BY 1, 2)
       |SELECT lang, ngram, n,
       |  cast(row_number() OVER (PARTITION BY lang ORDER BY n DESC, ngram) as int) AS rank
       |FROM c
       |QUALIFY rank <= $TopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_df" -> (docFreq _),
    "vocab_ngram_topk" -> (ngramTopK _))

  val oracle: Map[String, String] = Map(
    "vocab_df" -> docFreqSql,
    "vocab_ngram_topk" -> ngramTopKSql)
}
