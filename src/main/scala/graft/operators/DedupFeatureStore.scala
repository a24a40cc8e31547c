package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Persisted (on-disk) dedup feature store — the CROSS-SESSION twin
  * of the per-session memoized shingle/banded relations.
  *
  * A production re-crawl arrives DAYS after the base corpus was
  * featurized: the base must be verdict-able through relations that
  * were written when IT landed, never by re-tokenizing base text per
  * batch (the round-9 scale-killer: `verdictAgainstBase` recomputes
  * `shinglesFromDocs(batch ∪ base)` per call, O(|base|) text work
  * against a standing 100 TB corpus). This store persists exactly
  * the four relations the verdict consumes, each a few fixed-width
  * columns — document text NEVER lands in the store:
  *
  *   - `frequent`  (hs)                — the FROZEN df blocklist
  *   - `norm`      (doc_id, nt_h)      — xxhash64 of normalized text
  *   - `shingles`  (doc_id, sh: long)  — xxhash64 of capped shingles
  *   - `banded`    (doc_id, band, bh)  — MinHash band signatures
  *   - `sizes`     (doc_id, n)         — capped shingle count
  *
  * All but `frequent` are parquet tables PARTITIONED BY `ingest_gen`
  * (generation): the seed corpus is generation [[DedupFeatureStore
  * .SeedGen]], each folded batch its own generation (a streaming
  * micro-batch's batchId). A fold's base is every generation
  * STRICTLY BEFORE its own, and its feature append overwrites only
  * its own generation's partition (dynamic partition overwrite) — so
  * an at-least-once replay of a batch is idempotent: the re-fold
  * cannot see the half-written features of its first attempt (own
  * gen excluded from the base) and the re-append replaces rather
  * than duplicates them.
  *
  * FROZEN df discipline: the frequent-shingle blocklist is a SEED
  * statistic (computed once at [[build]], like a stopword list) and
  * applies uniformly to every later batch — the discipline the
  * registered `dedup_ingest_fold` documents ("the df cap and
  * signatures come from the global store, only the id split moves").
  * [[refreshBlocklist]] recomputes it over everything folded so far
  * for corpora whose head distribution drifts.
  *
  * Hash representation: the store keeps xxhash64 of normalized text
  * and of shingle strings, not the strings (at 100 TB the wide
  * strings must neither shuffle nor persist). Exact-dup equality and
  * intersection counts are therefore identical to the string form
  * modulo a ~2^-64 collision — the same documented caveat as
  * `ngramJaccard`'s hashed pair join. Banding hashes the STRING
  * (rollingHash) before any xxhash64, so band signatures are
  * bit-identical to the memoized corpus path.
  *
  * Reference: the check-then-insert ingest discipline of
  * etl_job.py:139-182 (store_data's INSERT OR IGNORE), lifted to
  * featurized near-dup state. */
final class DedupFeatureStore private[operators] (
    val spark: SparkSession, val path: String) {

  import DedupFeatureStore._

  /** Frozen frequent-shingle blocklist (hs: long). Small by
    * construction (a shingle needs df > MaxDf docs to enter), so it
    * broadcasts. */
  def frequent: DataFrame =
    spark.read.schema("hs long").parquet(s"$path/frequent")

  /** Explicit schemas for every store read: a generation whose batch
    * produced ZERO rows for a table (every shingle blocklisted — a
    * real state on a small-vocabulary corpus where the whole shingle
    * vocabulary is frequent) writes no data files, and schema
    * INFERENCE over a files-less table fails; a declared schema
    * yields the correct empty relation instead. `ingest_gen` is the
    * partition column — declared long so generation ids never
    * truncate. */
  private val genSchemas = Map(
    "norm" -> "doc_id long, nt_h long, ingest_gen long",
    "shingles" -> "doc_id long, sh long, ingest_gen long",
    "banded" -> "doc_id long, band int, bh long, ingest_gen long",
    "sizes" -> "doc_id long, n long, ingest_gen long")

  private def gens(name: String, before: Long): DataFrame =
    spark.read.schema(genSchemas(name)).parquet(s"$path/$name")
      .filter(col("ingest_gen") < before)
      .drop("ingest_gen")

  /** Verdict of `batch` (doc_id, text) against every generation
    * strictly before `gen`, through the persisted relations only —
    * the per-batch plan tokenizes/shingles/bands the BATCH and joins
    * the store's columnar feature tables; base text is never read.
    * Output: (doc_id, status exact_dup|near_dup|new, hit_id, jaccard)
    * — the `verdictAgainstBase` contract. Pure read side; see
    * [[fold]] for verdict + feature append. */
  def verdict(batch: DataFrame, gen: Long): DataFrame =
    verdictOf(featurize(batch), gen)

  private def verdictOf(f: Features, gen: Long): DataFrame = {
    val exactHit = f.norm
      .join(gens("norm", gen)
        .select(col("nt_h"), col("doc_id").as("base_id")), "nt_h")
      .groupBy("doc_id").agg(min(col("base_id")).as("exact_hit"))
    DedupOps.verdictCoreSplit(
      f.ids, exactHit,
      batchB = f.banded, baseB = gens("banded", gen),
      batchSh = f.shingles, baseSh = gens("shingles", gen),
      sizes = gens("sizes", gen).unionByName(f.sizes))
  }

  /** Verdict + fold: featurize `batch` ONCE, append its features as
    * generation `gen` (overwriting that generation if it already
    * exists — idempotent replay), and return the verdict against the
    * strictly-earlier generations. The verdict DataFrame stays valid
    * after the append because its base excludes `gen` by partition
    * filter. Cost per call: O(|batch| text work + candidates) — the
    * base is touched only through the capped bucket join and the
    * candidate-bounded intersection join over the store's columnar
    * integer relations. */
  def fold(batch: DataFrame, gen: Long): DataFrame = {
    val f = featurize(batch)
    append(f, gen)
    verdictOf(f, gen)
  }

  private def append(f: Features, gen: Long): Unit = {
    def write(name: String, df: DataFrame): Unit =
      df.withColumn("ingest_gen", lit(gen))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_gen")
        .parquet(s"$path/$name")
    write("norm", f.norm)
    write("shingles", f.shingles)
    write("banded", f.banded)
    write("sizes", f.sizes)
  }

  /** Batch featurization under the FROZEN blocklist: one pass over
    * the batch text (eagerly checkpointed — banding, sizes and the
    * verdict all read it), strings dropped at the boundary. */
  private def featurize(batch: DataFrame): Features = {
    val docs = batch.select("doc_id", "text")
    val capped = graft.Checkpoints.eager(
      DedupOps.rawShingles(docs)
        .withColumn("hs", xxhash64(col("sh")))
        .join(broadcast(frequent), Seq("hs"), "left_anti"))
    val banded = DedupOps.bandedFromShingles(capped.select("doc_id", "sh"))
    val shingles = capped.select(col("doc_id"), col("hs").as("sh"))
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val norm = DedupOps.normText(docs)
      .select(col("doc_id"), xxhash64(col("nt")).as("nt_h"))
    Features(docs.select("doc_id"), norm, shingles, banded, sizes)
  }

  /** Recompute the frequent blocklist over every generation folded so
    * far (maintenance — run when the corpus head distribution has
    * drifted from the seed; newly-appended batches then cap against
    * the refreshed list, already-persisted generations keep their
    * rows, which the rep-capped bucket join tolerates). */
  def refreshBlocklist(): Unit =
    spark.read.schema(genSchemas("shingles")).parquet(s"$path/shingles")
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > DedupOps.MaxDf)
      .select(col("sh").as("hs"))
      .write.mode("overwrite").parquet(s"$path/frequent")

  private case class Features(ids: DataFrame, norm: DataFrame,
                              shingles: DataFrame, banded: DataFrame,
                              sizes: DataFrame)
}

object DedupFeatureStore {

  /** Generation of the seed corpus — strictly below every real batch
    * id (streaming batchIds start at 0). */
  val SeedGen: Long = -1L

  /** Featurize the seed corpus (doc_id, text) and write the store:
    * frequent blocklist from the seed's document frequencies, then
    * the seed's own features as generation [[SeedGen]]. Overwrites
    * any store at `path`. */
  def build(docs: DataFrame, path: String): DedupFeatureStore = {
    val spark = docs.sparkSession
    // a NEW store: wipe the whole path first — overwriting only the
    // seed generation would leave any stale/partial generations from
    // a previous (possibly crashed mid-write) store alive under the
    // same root, and a generation dir holding only staging debris
    // fails parquet schema inference at read time
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val seed = docs.select("doc_id", "text")
    val raw = graft.Checkpoints.eager(
      DedupOps.rawShingles(seed).withColumn("hs", xxhash64(col("sh"))))
    raw.groupBy("hs").agg(count(lit(1)).as("df"))
      .filter(col("df") > DedupOps.MaxDf)
      .select("hs")
      .write.mode("overwrite").parquet(s"$path/frequent")
    val store = new DedupFeatureStore(spark, path)
    store.append(store.featurize(seed), SeedGen)
    store
  }

  /** Open an existing store — pure disk read, no session state: the
    * cross-session path a re-crawl takes days after [[build]]. */
  def load(spark: SparkSession, path: String): DedupFeatureStore =
    new DedupFeatureStore(spark, path)

  // ------------------------------------------ registered evaluation

  /** Deterministic store location for the registered query (rebuilt
    * and overwritten per call — partition overwrite keeps repeated
    * runs idempotent). */
  private def storePathFor(d: String): String =
    "/tmp/graft_store/" + d.replaceAll("[^A-Za-z0-9._-]", "_")

  /** `dedup_store_fold`: the two-step crawl-ingest fold of
    * `dedup_ingest_fold`, run THROUGH a real on-disk store — build
    * from the ≤80% id slice (frozen blocklist = seed statistic),
    * fold batch A = (80%, 90%] as generation 1, then batch B =
    * (90%, 100%] as generation 2 (whose base is seed ∪ A: the
    * cross-batch attribution case). Unlike `dedup_ingest_fold` the
    * base features here come off PARQUET written by earlier folds,
    * not a session memo — the oracle applies the identical frozen
    * seed-df cap. */
  def storeFold(s: SparkSession, d: String): DataFrame = {
    val docs = DedupOps.docsParallel(s, d).select("doc_id", "text")
    val mx = docs.agg(max(col("doc_id")).as("mx_id"))
    def slice(lo: Int, hi: Int): DataFrame =
      docs.crossJoin(broadcast(mx))
        .filter(col("doc_id") * 10 > col("mx_id") * lo &&
          col("doc_id") * 10 <= col("mx_id") * hi)
        .drop("mx_id")
    val base0 = docs.crossJoin(broadcast(mx))
      .filter(col("doc_id") * 10 <= col("mx_id") * 8).drop("mx_id")
    val store = build(base0, storePathFor(d))
    def step(n: Int, v: DataFrame): DataFrame =
      v.select(lit(n).as("ingest_step"), col("doc_id"), col("status"),
        col("hit_id"), col("jaccard"))
    step(1, store.fold(slice(8, 9), 1L))
      .unionAll(step(2, store.fold(slice(9, 10), 2L)))
  }

  /** Mirror: identical to the `dedup_ingest_fold` mirror except the
    * df cap — FROZEN over the ≤80% seed slice and applied uniformly
    * to every doc (the store's blocklist discipline), instead of
    * self-capped over the whole corpus. The Spark side joins
    * xxhash64 of normalized text / shingles where this mirror joins
    * the strings — the documented ~2^-64 asymmetry. */
  private[operators] def storeFoldSql: String =
    s"""WITH ${DedupOps.shingleRawSqlCte},
       |mx0 AS (SELECT max(doc_id) AS mx_id FROM documents),
       |freq AS (
       |  SELECT sh FROM sh0 CROSS JOIN mx0
       |  WHERE doc_id * 10 <= mx_id * 8
       |  GROUP BY sh HAVING count(*) > ${DedupOps.MaxDf}),
       |sh AS MATERIALIZED (
       |  SELECT sh0.doc_id, sh0.sh FROM sh0
       |  LEFT JOIN freq ON sh0.sh = freq.sh
       |  WHERE freq.sh IS NULL),
       |${DedupOps.foldMirrorTail}""".stripMargin
}
