package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.C capstone — from near-dup PAIRS to a clean corpus.
  *
  * Pair lists aren't what a training pipeline consumes; it needs a
  * keep/drop decision per document. `clusters` resolves the pair
  * graph into connected components by iterative min-label
  * propagation (each round: every doc adopts the smallest label in
  * its neighborhood; fixpoint ≤ component diameter rounds, checked
  * per round with an early exit). At 100 TB with adversarial graph
  * shapes you'd switch to the large-star/small-star algorithm — the
  * per-round join structure is identical, only the edge rewriting
  * differs; near-dup components in practice have tiny diameters.
  */
object CorpusOps {

  /** doc_id → cluster_id (smallest doc_id reachable through near-dup
    * pairs), is_kept = representative flag. */
  def clusters(s: SparkSession, d: String): DataFrame = {
    val pairs = DedupOps.ngramJaccard(s, d).select("doc_a", "doc_b")
    clustersFromPairs(Tables.documents(s, d).select("doc_id"), pairs)
  }

  private[graft] def clustersFromPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels = docs.select(col("doc_id"), col("doc_id").as("lbl")).cache()
    var converged = false
    var round = 0
    while (!converged && round < 10) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("lbl", "old_lbl"), "doc_id")
        .filter(col("lbl") =!= col("old_lbl")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      round += 1
    }
    labels.select(col("doc_id"), col("lbl").as("cluster_id"),
      (col("doc_id") === col("lbl")).as("is_kept"))
  }

  /** The flagship composite: quality-filter → near-dup cluster →
    * keep representatives. Output: the retained corpus with its
    * quality score and fingerprint — what a training-data run would
    * materialize. */
  def cleanCorpus(s: SparkSession, d: String): DataFrame = {
    val quality = TextOps.quality(s, d).select(col("doc_id"), col("quality"))
    val fp = TextOps.fingerprint(s, d).select(col("doc_id"), col("fp"))
    val keep = clusters(s, d).filter(col("is_kept")).select("doc_id", "cluster_id")
    Tables.documents(s, d)
      .join(quality, "doc_id")
      .filter(col("quality") >= 0.5)
      .join(keep, "doc_id")
      .join(fp, "doc_id")
      .select("doc_id", "lang", "source", "n_chars", "quality", "fp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> (clusters _),
    "clean_corpus" -> (cleanCorpus _))

  val oracle: Map[String, String] = Map()
}
