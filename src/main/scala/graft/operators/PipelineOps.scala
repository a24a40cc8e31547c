package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.text

/** §2.C/E extension — corpus-assembly utilities a training-data run
  * needs after dedup/quality: deterministic stratified sampling and
  * token-budget sequence packing.
  *
  * Both are engine-reproducible by construction: the "randomness" for
  * sampling is the rolling-hash fingerprint (computed identically by
  * the DuckDB oracle — no engine-specific RNG), and packing is a
  * windowed cumulative sum, so either engine lands every doc in the
  * same sample/shard.
  */
object PipelineOps {

  private val SamplePerStratum = 50
  private val ShardTargetTokens = 2000L

  /** k docs per language stratum, picked by rolling-hash order
    * (deterministic pseudo-random — hash order is uncorrelated with
    * doc order) with a doc_id tiebreak. Runs through the CUSTOM
    * bounded-heap top-k operator: one shuffle on lang, k rows kept
    * per stratum, no partition sort — at 100 TB only k·|langs| rows
    * survive the heap. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      text.rollingHash(col("text")).as("fp"))
    graft.functions.topk.perKey(base,
      keys = Seq("lang"),
      order = Seq(graft.functions.topk.Order("fp"),
        graft.functions.topk.Order("doc_id")),
      k = SamplePerStratum)
      .select(col("doc_id"), col("lang"), col("fp"), col("rank"))
  }

  private val sampleStratifiedSql =
    s"""WITH f AS (
       |  SELECT doc_id, lang, ${TextOps.fpExprSql} AS fp FROM documents)
       |SELECT doc_id, lang, fp,
       |  cast(row_number() OVER (PARTITION BY lang ORDER BY fp, doc_id) as int) AS rank
       |FROM f
       |QUALIFY rank <= $SamplePerStratum""".stripMargin

  /** Block count for the distributed prefix sum: parallelism is
    * |langs| × PackBlocks regardless of how skewed the language mix
    * is. On a cluster this tracks total cores. */
  private val PackBlocks = 32

  /** Greedy contiguous sequence packing: docs in doc_id order fill
    * shard after shard of ~`ShardTargetTokens` whitespace tokens —
    * the pretraining "pack documents into fixed-budget sequences"
    * step. shard_id = floor(tokens-before-this-doc / target).
    *
    * The running sum is a DISTRIBUTED TWO-LEVEL PREFIX SUM, not one
    * window per language (whose parallelism would be |langs| and
    * whose biggest stratum would serialize): docs split into doc_id
    * RANGE blocks (order-preserving by construction), each
    * (lang, block) computes its local cumulative sum independently,
    * and the tiny per-block totals (langs × blocks rows) are
    * prefix-summed on their own to give each block its offset.
    * cum = block_offset + local_cum is EXACTLY the single-window
    * answer — the oracle (one window) proves it per row. */
  def packShards(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(text.tokens(col("text"))).cast("long").as("n_tok"))
    val bounds = base.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val withBlk = base.crossJoin(broadcast(bounds))
      .withColumn("span",
        greatest(floor((col("hi") - col("lo") + 1) / PackBlocks), lit(1L)))
      .withColumn("blk", floor((col("doc_id") - col("lo")) / col("span")))
      .drop("lo", "hi", "span")
    // local cumsum within each (lang, doc_id-range block)
    val wLocal = Window.partitionBy(col("lang"), col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withBlk.withColumn("local_cum", sum(col("n_tok")).over(wLocal))
    // per-block totals are langs*blocks rows: prefix-sum THEM per lang
    val wBlocks = Window.partitionBy(col("lang")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withBlk.groupBy(col("lang"), col("blk"))
      .agg(sum(col("n_tok")).as("blk_tok"))
      .withColumn("offset", sum(col("blk_tok")).over(wBlocks) - col("blk_tok"))
      .select(col("lang"), col("blk"), col("offset"))
    local.join(broadcast(offsets), Seq("lang", "blk"))
      .withColumn("cum", col("offset") + col("local_cum"))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / lit(ShardTargetTokens.toDouble))
          .cast("bigint").as("shard_id"))
  }

  private val packShardsSql = {
    val toks = text.tokensSql
    s"""WITH t AS (
       |  SELECT doc_id, lang, cast(len($toks) as bigint) AS n_tok FROM documents)
       |SELECT doc_id, lang, n_tok,
       |  cast(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
       |         ROWS UNBOUNDED PRECEDING) - n_tok) / ${ShardTargetTokens}.0) as bigint)
       |    AS shard_id
       |FROM t""".stripMargin
  }

  private val BottomK = 10

  /** Per-event-type deterministic uniform sample through the CUSTOM
    * bottom-k sketch aggregate (graft.plans.BottomKSketchAgg, a
    * TypedImperativeAggregate): O(k) state per group, mergeable
    * partials, same answer on any partitioning. The "randomness" is
    * the mirrored rolling hash of the id, so the DuckDB oracle
    * reproduces the exact sample with a window rank. */
  def sampleBottomK(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("h", text.rollingHash(col("event_id").cast("string")))
      .groupBy(col("event_type"))
      .agg(graft.functions.sketch.bottomK(col("h"), col("event_id"), BottomK)
        .as("ids"))
      .select(col("event_type"), posexplode(col("ids")).as(Seq("pos", "event_id")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        col("event_id"))

  private val sampleBottomKSql = {
    val fph = """list_reduce(
      |    list_prepend(cast(0 as bigint),
      |      list_transform(string_split(cast(event_id as varchar), ''),
      |        c -> cast(ascii(c) as bigint))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
    s"""WITH h AS (
       |  SELECT event_type, event_id, $fph AS fph FROM events)
       |SELECT event_type,
       |  cast(row_number() OVER (PARTITION BY event_type
       |       ORDER BY fph, event_id) as int) AS rank,
       |  event_id
       |FROM h
       |QUALIFY rank <= $BottomK""".stripMargin
  }

  /** Source → doc quota for the mixture sample (a 50/30/20 split of a
    * 100-doc target). In a real run these come from the training
    * recipe's mixture weights × total budget. */
  private val MixtureQuotas: Seq[(String, Int)] =
    Seq("src0" -> 50, "src1" -> 30, "src2" -> 20)

  /** Training-mixture sampling: fill each source's quota with its
    * rolling-hash-lowest docs — the "weighted data mixture" step that
    * turns recipe weights into an exact deterministic subset. One
    * shuffle on source through the bounded-heap top-k (k = max quota;
    * only k rows per source survive the map side), then the per-source
    * quota cut is a broadcast-free CASE filter. Sources outside the
    * recipe are filtered at the scan. */
  def sampleMixture(s: SparkSession, d: String): DataFrame = {
    val srcs = MixtureQuotas.map(_._1)
    val maxQuota = MixtureQuotas.map(_._2).max
    val base = Tables.documents(s, d)
      .filter(col("source").isin(srcs: _*))
      .select(col("doc_id"), col("source"),
        text.rollingHash(col("text")).as("fp"))
    val ranked = graft.functions.topk.perKey(base,
      keys = Seq("source"),
      order = Seq(graft.functions.topk.Order("fp"),
        graft.functions.topk.Order("doc_id")),
      k = maxQuota)
    val quota = MixtureQuotas.foldLeft(lit(0)) { case (acc, (src, q)) =>
      when(col("source") === src, q).otherwise(acc)
    }
    ranked.filter(col("rank") <= quota)
      .select(col("doc_id"), col("source"), col("fp"), col("rank"))
  }

  private val sampleMixtureSql = {
    val srcList = MixtureQuotas.map { case (s0, _) => s"'$s0'" }.mkString(", ")
    val quotaCase = MixtureQuotas
      .map { case (s0, q) => s"WHEN source = '$s0' THEN $q" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH f AS (
       |  SELECT doc_id, source, ${TextOps.fpExprSql} AS fp FROM documents
       |  WHERE source IN ($srcList))
       |SELECT doc_id, source, fp,
       |  cast(row_number() OVER (PARTITION BY source ORDER BY fp, doc_id) as int)
       |    AS rank
       |FROM f
       |QUALIFY rank <= $quotaCase""".stripMargin
  }

  private val WeightedK = 100
  private val WeightCap = 16

  /** Iterated-quadratic-map hash — THE shared definition in
    * [[graft.functions.ihash]] (same map the ANN family trains with). */
  private def wqhash(c: Column): Column = graft.functions.ihash.quad(c)

  /** Weighted sampling without replacement (length-weighted): each
    * doc gets an integer weight w ∈ [1, WeightCap] from its length,
    * its priority is the MINIMUM of w independent hash draws
    * (`min_{j≤w} h(doc_id·WeightCap + j)` — for any two docs the
    * pairwise odds of winning are w_a : w_b, the classic
    * priority-sampling construction), and the sample is the global
    * bottom-`WeightedK` by (priority, doc_id). Entirely integer
    * arithmetic → the DuckDB oracle reproduces every draw. At scale:
    * the w draws are a fold over a generated sequence INSIDE one
    * narrow projection (no explode, no replicated rows), so the scan
    * is shuffle-free and the only data movement is the TakeOrdered
    * top-k of WeightedK rows per partition → driver-merged k. */
  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    // coalesce the length BEFORE deriving the weight: a null n_chars
    // would otherwise null the weight and priority, and the two
    // engines order NULLs differently (Spark asc = NULLS FIRST,
    // DuckDB = NULLS LAST) — a single null-length doc would flip the
    // sample; coalesced, such a doc just gets the minimum weight 1
    val w = (least(floor(coalesce(col("n_chars"), lit(0L)) / lit(400.0)),
      lit(WeightCap - 1)).cast("long") + lit(1L)).as("weight")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), w)
      .withColumn("priority",
        array_min(transform(sequence(lit(1L), col("weight")),
          j => wqhash(col("doc_id") * lit(WeightCap.toLong) + j))))
      .orderBy(col("priority"), col("doc_id"))
      .limit(WeightedK)
  }

  private val sampleWeightedSql = {
    // nested (CTE-free) SQL twin of the shared hash: list lambdas
    // can't reference CTE columns
    val hash = graft.functions.ihash.quadSqlNested(s"doc_id*$WeightCap + j")
    s"""WITH wd AS (
       |  SELECT doc_id, lang,
       |    cast(least(floor(coalesce(n_chars, 0) / 400.0), ${WeightCap - 1}) as bigint)
       |      + 1 AS weight
       |  FROM documents)
       |SELECT doc_id, lang, weight,
       |  list_min(list_transform(range(1, cast(weight+1 as int)),
       |    j -> $hash)) AS priority
       |FROM wd
       |ORDER BY priority, doc_id
       |LIMIT $WeightedK""".stripMargin
  }

  private val ChunkSize = 64
  private val ChunkStride = 48 // 16-token overlap between chunks

  /** Fixed-size overlapping token chunking — the pretraining step
    * that SPLITS long documents into model-window-sized pieces
    * (pack_shards packs whole docs; this is its complement). Chunk i
    * covers tokens [i·stride+1, i·stride+size]; the last chunk may be
    * short; a doc shorter than one chunk yields exactly one. The
    * whole operator is one narrow projection + explode — zero
    * shuffles, streams at scan speed at 100 TB — and emits the
    * chunk's token count + rolling-hash fingerprint (the same fp
    * `dedup_passage` keys on) instead of re-materializing text. */
  def chunkDocs(s: SparkSession, d: String): DataFrame = {
    val nChunks = expr(
      s"1 + (greatest(n_tok - $ChunkSize, 0) + ${ChunkStride - 1}) div $ChunkStride")
    DedupOps.docsParallel(s, d)
      .select(col("doc_id"), text.tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("ctoks",
        slice(col("toks"), (col("chunk_id") * ChunkStride + 1).cast("int"),
          lit(ChunkSize)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).as("n_chunk_tokens"),
        text.rollingHash(concat_ws(" ", col("ctoks"))).as("chunk_fp"))
  }

  private val chunkDocsSql = {
    val toks = text.tokensSql
    val fp = """list_reduce(
      |    list_prepend(cast(0 as bigint),
      |      list_transform(list_filter(string_split(array_to_string(ctoks, ' '), ''),
      |        c -> c <> ''),
      |        c -> cast(ascii(c) as bigint))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |m AS (
       |  SELECT doc_id, toks, cast(len(toks) as bigint) AS n_tok FROM t),
       |n AS (
       |  SELECT doc_id, toks,
       |    1 + (greatest(n_tok - $ChunkSize, 0) + ${ChunkStride - 1})
       |      // $ChunkStride AS n_chunks
       |  FROM m),
       |c AS (
       |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM n),
       |sl AS (
       |  SELECT doc_id, chunk_id,
       |    list_slice(toks, cast(chunk_id*$ChunkStride + 1 as int),
       |      cast(chunk_id*$ChunkStride + $ChunkSize as int)) AS ctoks
       |  FROM c)
       |SELECT doc_id, chunk_id,
       |  cast(len(ctoks) as int) AS n_chunk_tokens,
       |  $fp AS chunk_fp
       |FROM sl""".stripMargin
  }

  private val ShuffleShardSize = 100L
  private val ShuffleBlocks = 64L

  /** Deterministic global shuffle — the "randomize the training
    * order" pass every corpus takes before sharding to the trainer:
    * each doc's position is its rank by (hash(doc_id), doc_id), so
    * the permutation is reproducible on any engine/partitioning (no
    * RNG, no global sort): positions come from the SAME two-level
    * prefix-sum shape as pack_shards, but blocked on HASH RANGES —
    * the hash is uniform, so the ~|blocks| block sizes are balanced
    * regardless of doc_id skew. The block-prefix window runs on
    * ≤ $ShuffleBlocks rows (the §6 bounded-window carve-out); local
    * ranks run per block in parallel. Output: shard file + offset
    * within shard, ShardSize docs per shard. */
  def corpusShuffle(s: SparkSession, d: String): DataFrame = {
    val base = DedupOps.docsParallel(s, d)
      .select(col("doc_id"),
        graft.functions.ihash.quad(col("doc_id")).as("h"))
    hashRankPositions(base, "doc_id")
      .select(col("doc_id"), col("h"),
        expr(s"cast(pos div $ShuffleShardSize as int)").as("shard"),
        (col("pos") % ShuffleShardSize).cast("int").as("pos_in_shard"))
  }

  /** Adds `pos` = 0-based global rank by (`h`, `idCol`) to a frame
    * that already carries an `h` hash column — the hash-range-blocked
    * two-level prefix sum corpus_shuffle and assemble_corpus share:
    * uniform hash blocks balance regardless of id skew, local ranks
    * run per block in parallel, and the block-prefix window touches
    * ≤ ShuffleBlocks rows (the §6 bounded-window carve-out). */
  private[operators] def hashRankPositions(df: DataFrame, idCol: String): DataFrame = {
    val blkWidth = graft.functions.ihash.M / ShuffleBlocks + 1
    val base = df.withColumn("blk", expr(s"h div $blkWidth"))
    val wLocal = Window.partitionBy(col("blk")).orderBy(col("h"), col(idCol))
    val local = base.withColumn("lrank",
      row_number().over(wLocal).cast("long") - 1)
    val blockTotals = base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
    val wBlocks = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = blockTotals.withColumn("boff",
      coalesce(sum(col("bn")).over(wBlocks), lit(0L)))
    local.join(broadcast(prefixes.select(col("blk"), col("boff"))), "blk")
      .withColumn("pos", col("boff") + col("lrank"))
      .drop("blk", "lrank", "boff")
  }

  private[operators] def shuffleShardSize: Long = ShuffleShardSize

  private val corpusShuffleSql = {
    val hash = graft.functions.ihash.quadSqlNested("doc_id")
    s"""WITH f AS (SELECT doc_id, $hash AS h FROM documents),
       |r AS (
       |  SELECT doc_id, h,
       |    row_number() OVER (ORDER BY h, doc_id) - 1 AS pos
       |  FROM f)
       |SELECT doc_id, h,
       |  cast(pos // $ShuffleShardSize as int) AS shard,
       |  cast(pos % $ShuffleShardSize as int) AS pos_in_shard
       |FROM r""".stripMargin
  }

  // ---------------------------------------------------- token budget

  private val BudgetDenom = 3L

  /** Token-budget corpus cut: rank the corpus in deterministic
    * hash-shuffled order (the same engine-reproducible order
    * corpus_shuffle trains in) and keep the PREFIX whose cumulative
    * token count fits the budget — here total/3, a scale-free
    * fraction so the operator stays meaningful at any SF. This is the
    * "trim the corpus to N tokens" step every training run ends with;
    * doing it on the shuffled order (not doc order) makes the cut an
    * unbiased subsample. The global cumulative sum is the two-level
    * hash-blocked prefix sum shared with corpus_shuffle — per-block
    * window sums in parallel, one ≤ShuffleBlocks-row offset window,
    * broadcast offsets re-joined — so no single-partition window
    * anywhere; the budget itself is a 1-row broadcast. */
  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(text.tokens(col("text"))).cast("long").as("n_tok"),
        graft.functions.ihash.quad(col("doc_id")).as("h"))
    val blkWidth = graft.functions.ihash.M / ShuffleBlocks + 1
    val withBlk = base.withColumn("blk", expr(s"h div $blkWidth"))
    val wLocal = Window.partitionBy(col("blk"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlocks = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBlk.groupBy(col("blk"))
      .agg(sum(col("n_tok")).as("btok"))
      .withColumn("boff", coalesce(sum(col("btok")).over(wBlocks), lit(0L)))
      .select(col("blk"), col("boff"))
    val total = base.agg(sum(col("n_tok")).as("total_tok"))
    withBlk
      .withColumn("lcum", sum(col("n_tok")).over(wLocal))
      .join(broadcast(offsets), Seq("blk"))
      .withColumn("cum_tok", col("boff") + col("lcum"))
      .crossJoin(broadcast(total))
      .filter(col("cum_tok") - col("n_tok") < expr(s"total_tok div $BudgetDenom"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("cum_tok"))
  }

  private val tokenBudgetSql = {
    val toks = text.tokensSql
    val hash = graft.functions.ihash.quadSqlNested("doc_id")
    s"""WITH t AS (
       |  SELECT doc_id, lang, cast(len($toks) as bigint) AS n_tok, $hash AS h
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tok,
       |    sum(n_tok) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
       |      AS cum_tok,
       |    sum(n_tok) OVER () AS total_tok
       |  FROM t)
       |SELECT doc_id, lang, n_tok, cast(cum_tok as bigint) AS cum_tok
       |FROM c WHERE cum_tok - n_tok < total_tok // $BudgetDenom""".stripMargin
  }

  /** Per-language Bernoulli keep rates in ppm — the language-
    * rebalancing dial (downsample the dominant language, keep all of
    * the scarce ones). */
  private val BernoulliPpm = Seq(
    "en" -> 125000L, "es" -> 250000L, "fr" -> 500000L,
    "zh" -> 750000L, "de" -> 1000000L)

  /** Rate-based (Bernoulli) language rebalancing — the sampler a
    * 100 TB run uses when it wants a FRACTION per language, not a
    * count: keep doc ⟺ quadhash(doc_id) mod 1e6 < rate_ppm(lang).
    * One narrow map over one scan — no count pass, no rank, no
    * shuffle at all (contrast sample_stratified's exact-k heap path,
    * which needs per-stratum ranking); the keep decision is
    * engine-reproducible (no RNG) and STABLE under corpus growth: a
    * doc's fate never changes when other docs arrive, so incremental
    * ingestion keeps old decisions. inv_weight = 1e6/rate is the
    * Horvitz-Thompson reweighting factor downstream estimators
    * multiply by. */
  def sampleBernoulli(s: SparkSession, d: String): DataFrame = {
    val rate = BernoulliPpm.foldLeft(lit(0L)) { case (acc, (l, p)) =>
      when(col("lang") === l, p).otherwise(acc)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        rate.as("rate_ppm"),
        (graft.functions.ihash.quad(col("doc_id")) % 1000000L).as("bucket"))
      .filter(col("bucket") < col("rate_ppm"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("rate_ppm"),
        (lit(1000000.0) / col("rate_ppm")).as("inv_weight"))
  }

  private val sampleBernoulliSql = {
    val hash = graft.functions.ihash.quadSqlNested("doc_id")
    val rateCase = BernoulliPpm
      .map { case (l, p) => s"WHEN lang = '$l' THEN $p" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH b AS (
       |  SELECT doc_id, lang, n_chars,
       |    cast($rateCase as bigint) AS rate_ppm,
       |    ($hash) % 1000000 AS bucket
       |  FROM documents)
       |SELECT doc_id, lang, n_chars, rate_ppm,
       |  1000000.0 / rate_ppm AS inv_weight
       |FROM b WHERE bucket < rate_ppm""".stripMargin
  }

  /** Quality-tiered multi-epoch upsampling — the data-mixing step
    * that shows high-quality documents to training more than once
    * (epochs 3/2/1 by quality tier): each doc explodes into its
    * epoch copies with per-copy token counts, so the packed/budgeted
    * stages downstream account the repeats exactly. The tier rule is
    * a pure per-row expression over the shared quality score —
    * embarrassingly parallel, output rows bounded by maxEpochs·|docs|
    * with zero shuffles. */
  def sampleEpochs(s: SparkSession, d: String): DataFrame = {
    val q = TextOps.quality(s, d).select(
      col("doc_id"), col("n_tokens"),
      when(col("quality") >= 0.75, 3)
        .when(col("quality") >= 0.5, 2)
        .otherwise(1).cast("int").as("n_epochs"))
    q.select(col("doc_id"), col("n_epochs"),
      explode(sequence(lit(1), col("n_epochs"))).as("epoch"),
      col("n_tokens"))
  }

  private val sampleEpochsSql =
    s"""WITH ${TextOps.qualityCte},
       |e AS (
       |  SELECT qm.doc_id, cast(qm.n_tok as int) AS n_tokens,
       |    cast(CASE WHEN qual.quality >= 0.75 THEN 3
       |              WHEN qual.quality >= 0.5 THEN 2
       |              ELSE 1 END as int) AS n_epochs
       |  FROM qm JOIN qual USING (doc_id)),
       |sel AS (
       |  SELECT doc_id, n_epochs,
       |    unnest(range(1, n_epochs + 1)) AS epoch, n_tokens
       |  FROM e)
       |SELECT doc_id, n_epochs, cast(epoch as int) AS epoch, n_tokens
       |FROM sel""".stripMargin

  private val TempBudget = 120

  /** Temperature-scaled multilingual sampling (the UNIMAX /
    * multilingual-recipe step): per-language sampling quotas
    * proportional to n_l^α with α = 1/2, so low-resource languages
    * are up-weighted relative to their raw share without swamping
    * the high-resource ones. All quota arithmetic is INTEGER —
    * w_l = floor(sqrt(n_l)) (sqrt is correctly-rounded IEEE in both
    * engines, and floor∘sqrt can only sit on an integer boundary at
    * perfect squares, where sqrt is exact), then
    * quota_l = (budget · w_l) div Σw — so both engines compute
    * bit-identical quotas with no float summation anywhere. Doc
    * selection inside a language is the deterministic
    * lowest-rolling-hash rank via the bounded-heap top-k (k = the
    * whole budget bounds every per-language quota, so only k rows
    * per language survive the map side). Scale shape: one |langs|-row
    * aggregate broadcast back, one top-k shuffle on lang. */
  def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("wt", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("wt")).as("tot_w"))
    val quota = counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        expr(s"($TempBudget * wt) div tot_w").as("quota"))
    val base = docs.select(col("doc_id"), col("lang"),
      text.rollingHash(col("text")).as("fp"))
    val ranked = graft.functions.topk.perKey(base,
      keys = Seq("lang"),
      order = Seq(graft.functions.topk.Order("fp"),
        graft.functions.topk.Order("doc_id")),
      k = TempBudget)
    ranked.join(broadcast(quota), "lang")
      .filter(col("rank") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("n_docs"), col("quota"),
        col("rank"), col("fp"))
  }

  private val sampleTemperatureSql =
    s"""WITH c AS (
       |  SELECT lang, cast(count(*) as bigint) AS n_docs
       |  FROM documents GROUP BY 1),
       |w AS (
       |  SELECT lang, n_docs,
       |    cast(floor(sqrt(cast(n_docs as double))) as bigint) AS wt
       |  FROM c),
       |tw AS (SELECT cast(sum(wt) as bigint) AS tot_w FROM w),
       |q AS (
       |  SELECT lang, n_docs, ($TempBudget * wt) // tot_w AS quota
       |  FROM w, tw),
       |f AS (
       |  SELECT doc_id, lang, ${TextOps.fpExprSql} AS fp FROM documents),
       |r AS (
       |  SELECT doc_id, lang, fp,
       |    cast(row_number() OVER (PARTITION BY lang ORDER BY fp, doc_id) as int)
       |      AS rank
       |  FROM f)
       |SELECT r.doc_id, r.lang, q.n_docs, q.quota, r.rank, r.fp
       |FROM r JOIN q USING (lang)
       |WHERE r.rank <= q.quota""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_temperature" -> (sampleTemperature _),
    "sample_epochs" -> (sampleEpochs _),
    "sample_bernoulli" -> (sampleBernoulli _),
    "corpus_token_budget" -> (tokenBudget _),
    "corpus_chunk" -> (chunkDocs _),
    "corpus_shuffle" -> (corpusShuffle _),
    "sample_stratified" -> (sampleStratified _),
    "sample_bottomk" -> (sampleBottomK _),
    "pack_shards" -> (packShards _),
    "sample_mixture" -> (sampleMixture _),
    "sample_weighted" -> (sampleWeighted _))

  val oracle: Map[String, String] = Map(
    "sample_temperature" -> sampleTemperatureSql,
    "sample_epochs" -> sampleEpochsSql,
    "sample_bernoulli" -> sampleBernoulliSql,
    "corpus_token_budget" -> tokenBudgetSql,
    "corpus_chunk" -> chunkDocsSql,
    "corpus_shuffle" -> corpusShuffleSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_bottomk" -> sampleBottomKSql,
    "pack_shards" -> packShardsSql,
    "sample_mixture" -> sampleMixtureSql,
    "sample_weighted" -> sampleWeightedSql)
}
