package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.vector

/** §2.D — similarity search over the embeddings table.
  *
  * Brute force is the exact baseline (and the DuckDB-oracle'd query);
  * LSH and IVF are the scale paths: both turn the O(n·q) scan into a
  * bucket-local probe, so at 100 TB a query touches only its cells.
  * The query set is a deterministic slice (vec_id < 5) broadcast to
  * the executors — the corpus never moves.
  */
object AnnOps {

  private val K = 10
  private val NQueries = 5

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  // ------------------------------------------------------ brute force

  /** Exact top-k: broadcast the query block, one pass over the
    * corpus, per-query rank window. Cosine is the deterministic
    * double fold from graft.functions.vector, so the oracle's ranks
    * and (rounded) sims match exactly. */
  def bruteForce(s: SparkSession, d: String): DataFrame = {
    val e = Tables.parallelize(Tables.embeddings(s, d))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.crossJoin(broadcast(queriesDf(s, d)))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", vector.cosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  private val bruteForceSql = {
    val cos = vector.sql.cosine("e.embedding", "q.embedding")
    s"""SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |  cast(row_number() OVER (PARTITION BY q.vec_id
       |       ORDER BY $cos DESC, e.vec_id) as int) AS rank,
       |  round($cos, 6) AS cosine
       |FROM embeddings e, embeddings q
       |WHERE q.vec_id < $NQueries AND e.vec_id <> q.vec_id
       |QUALIFY rank <= $K""".stripMargin
  }

  // -------------------------------------------------------------- lsh

  private val LshTables = 8
  private val LshBits = 4

  /** Hyperplane-LSH ANN: corpus and queries share the multi-table
    * bucket space; candidates = corpus vectors sharing ≥1 bucket with
    * the query. Candidate generation moves only (id, bucket) pairs —
    * the float arrays are re-attached after the distinct, so the wide
    * rows never shuffle. Recall measured in AnnSpec against the
    * brute-force baseline. */
  def lsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.parallelize(Tables.embeddings(s, d))
    def banded(df: DataFrame, idCol: String, embCol: String): DataFrame =
      df.select(col(idCol),
        explode(DedupOps.lshBuckets(col(embCol), LshTables, LshBits, 64)).as("b"))
        .select(col(idCol), col("b.tbl").as("tbl"), col("b.bv").as("bv"))

    val corpusB = banded(e.select(col("vec_id"), col("embedding")), "vec_id", "embedding")
    val qsB = banded(queriesDf(s, d), "query_id", "q_emb")

    val cand = corpusB.join(broadcast(qsB), Seq("tbl", "bv"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id")).distinct()

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(queriesDf(s, d)), "query_id")
      .withColumn("cos", vector.cosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  // -------------------------------------------------------------- ivf

  private val NCells = 16
  private val NProbe = 4

  /** One k-means refinement sweep: assign every vector to its nearest
    * centroid, then replace each centroid with the element-wise mean
    * of its members — computed distributed via posexplode →
    * (cell, dim) average → re-assembled arrays. Two shuffles per
    * iteration, all narrow expressions. */
  private def kmeansStep(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist").asc, col("cell_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("dist", -vector.cosine(col("embedding"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cell_id"), col("embedding"))
    assigned
      .select(col("cell_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cell_id", "dim").agg(avg(col("v")).as("m"))
      .groupBy("cell_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell_id"),
        expr("transform(dm, x -> cast(x.m as float))").as("c_emb"))
  }

  /** IVF ANN with a TRAINED coarse quantizer: centroids seeded from
    * the 16 lowest-vec_id vectors, refined by two distributed k-means
    * sweeps, then the classic probe-N search: each corpus vector is
    * assigned to its nearest centroid once; a query searches only its
    * NProbe nearest cells. */
  def ivf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.parallelize(Tables.embeddings(s, d))
    val seed = e.filter(col("vec_id") < NCells)
      .select(col("vec_id").cast("int").as("cell_id"), col("embedding").as("c_emb"))
    val cents = kmeansStep(e, kmeansStep(e, seed)).cache()

    // corpus assignment: argmin over broadcast centroids
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cell_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("dist", -vector.cosine(col("embedding"), col("c_emb")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell_id"))

    // query probes: NProbe nearest cells
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("cell_id"))
    val probes = queriesDf(s, d).crossJoin(broadcast(cents))
      .withColumn("dist", -vector.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("q_emb"), col("cell_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), "cell_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("embedding"), col("q_emb"))
      .withColumn("cos", vector.cosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> (bruteForce _),
    "ann_lsh" -> (lsh _),
    "ann_ivf" -> (ivf _))

  val oracle: Map[String, String] = Map(
    "ann_bruteforce" -> bruteForceSql)
}
