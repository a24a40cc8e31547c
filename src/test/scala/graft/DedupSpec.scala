package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.functions.{text, vector}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("exact dedup covers every document exactly once") {
    val e = DedupOps.exact(spark, sf)
    val docs = Tables.documents(spark, sf).count()
    assert(e.agg(sum("n_copies")).first.getLong(0) == docs)
  }

  /** Exact bigram-jaccard pairs >= 0.2 computed the slow O(n^2) way —
    * ground truth for the LSH variants (500 docs at sf0.001). */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(text.shingles(text.tokens(col("text")), 2)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("a"), col("sh"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .filter(col("c") * 1.0 / (col("na") + col("nb") - col("c")) >= 0.2)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash-lsh finds near-duplicate pairs with high recall and exact precision") {
    val got = DedupOps.minhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision exact by construction (candidates are jaccard-verified
    // against the df-capped shingle space, a subset of the full space)
    assert(got.subsetOf(exactPairs), s"false positives: ${got -- exactPairs}")
    assert(exactPairs.nonEmpty, "test data lost its planted near-dups")
    val recall = got.size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"recall $recall (${got.size}/${exactPairs.size})")
  }

  test("simhash blocking is exhaustive for hamming <= 3 (pigeonhole)") {
    val out = DedupOps.simhash(spark, sf)
    assert(out.filter(col("hamming") > 3).count() == 0)
    // every reported pair is symmetric-free and distinct
    val n = out.count()
    assert(out.distinct().count() == n)
  }

  test("embedding near-dup pairs all meet the cosine threshold") {
    val out = DedupOps.embeddingNearDup(spark, sf)
    assert(out.filter(col("cosine") < 0.4).count() == 0)
    // spot-check one pair's cosine against a driver-side computation
    val row = out.orderBy(col("vec_a"), col("vec_b")).limit(1).collect()
    if (row.nonEmpty) {
      val (a, b) = (row(0).getLong(0), row(0).getLong(1))
      val emb = Tables.embeddings(spark, sf)
        .filter(col("vec_id").isin(a, b))
        .orderBy("vec_id")
        .collect().map(_.getSeq[Float](1).toArray)
      val dot = emb(0).zip(emb(1)).map { case (x, y) => (x * y).toDouble }.sum
      val na = math.sqrt(emb(0).map(x => (x * x).toDouble).sum)
      val nb = math.sqrt(emb(1).map(x => (x * x).toDouble).sum)
      assert(math.abs(row(0).getDouble(2) - dot / (na * nb)) < 1e-9)
    }
  }
}
