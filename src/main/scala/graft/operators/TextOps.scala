package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.text

/** §2.E — text analysis over `documents`.
  *
  * All four operators are narrow maps (no shuffle at all): at 100 TB
  * they stream through the corpus at scan speed, fully inside
  * whole-stage codegen. Tokenization/scoring shapes are mirrored in
  * the DuckDB oracles where SQL can express them.
  */
object TextOps {

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single other
    * non-space chars — the standard regex shape used before byte-pair
    * merges. */
  // \s spelled explicitly: Java \s includes \x0B, RE2 \s does not
  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0b\\f\\r]"

  // ------------------------------------------------------ token count

  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(text.tokens(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(text.asciiLower(col("text")), lit(BpePattern), lit(0)))
        .as("n_bpe_tokens"),
      length(col("text")).as("text_len"))

  private val tokenCountSql =
    s"""SELECT doc_id,
       |  cast(len(${text.tokensSql}) as int) AS n_ws_tokens,
       |  cast(len(regexp_extract_all(${text.asciiLowerSql("text")}, '$BpePattern')) as int) AS n_bpe_tokens,
       |  cast(length(text) as int) AS text_len
       |FROM documents""".stripMargin

  // ---------------------------------------------------------- quality

  /** Quality score: length saturation, stopword ratio, type-token
    * ratio — the reference's 0-1000/0-100 range-check idea
    * (etl_job.py:51-72) generalized to content quality. All integer
    * counts divided once at the end, so both engines agree exactly. */
  def quality(s: SparkSession, d: String): DataFrame = {
    val toks = text.tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(text.stopwords: _*))).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val stopRatio = when(nTok > 0, nStop / nTok).otherwise(0.0)
    val ttr = when(nTok > 0, nUniq / nTok).otherwise(0.0)
    val lenSat = least(nTok / 20.0, lit(1.0))
    Tables.documents(s, d).select(
      col("doc_id"),
      nTok.cast("int").as("n_tokens"),
      stopRatio.as("stop_ratio"),
      ttr.as("type_token_ratio"),
      (lenSat * 0.4 + stopRatio * 0.3 + ttr * 0.3).as("quality"))
  }

  private val qualitySql = {
    val toks = text.tokensSql
    val stopList = text.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    cast(len(toks) as double) AS n_tok,
       |    cast(len(list_filter(toks, x -> list_contains($stopList, x))) as double) AS n_stop,
       |    cast(len(list_distinct(toks)) as double) AS n_uniq
       |  FROM t)
       |SELECT doc_id,
       |  cast(n_tok as int) AS n_tokens,
       |  CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stop_ratio,
       |  CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END AS type_token_ratio,
       |  (least(n_tok / 20.0, 1.0) * 0.4
       |   + (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 0.3
       |   + (CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END) * 0.3) AS quality
       |FROM m""".stripMargin
  }

  // ---------------------------------------------------------- lang id

  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "mit"),
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "on"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "los", "con"),
    "fr" -> Seq("le", "la", "de", "et", "est", "en", "les", "avec"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "不", "人"))

  /** Stopword-profile language ID (n-gram heuristic): score each
    * candidate language by profile-token hits, argmax with a
    * deterministic tiebreak (max score, then lexicographically larger
    * lang — struct comparison order, identical in DuckDB). */
  def langId(s: SparkSession, d: String): DataFrame = {
    val toks = text.tokens(col("text"))
    val scored = langProfiles.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score, lexicographically
    // larger lang on ties — deterministic
    val best = array_max(array(scored: _*))
    Tables.documents(s, d).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      best.getField("lang").as("pred_lang"),
      best.getField("score").as("pred_score"))
  }

  /** DuckDB mirror of langId: the same profile structs, max() over a
    * struct list (lexicographic (score, lang) comparison — identical
    * tiebreak to Spark's array_max). */
  private val langIdSql = {
    val toks = text.tokensSql
    val structs = langProfiles.map { case (lang, words) =>
      val wl = words.map(w => s"'$w'").mkString("[", ",", "]")
      s"{'score': cast(len(list_filter(toks, x -> list_contains($wl, x))) as int), 'lang': '$lang'}"
    }.mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, lang AS labeled_lang, $toks AS toks FROM documents),
       |u AS (SELECT doc_id, labeled_lang, unnest($structs) AS c FROM t),
       |b AS (SELECT doc_id, labeled_lang, max(c) AS best FROM u GROUP BY 1, 2)
       |SELECT doc_id, labeled_lang, best.lang AS pred_lang, best.score AS pred_score
       |FROM b""".stripMargin
  }

  /** Classifier-evaluation confusion matrix for the n-gram language
    * identifier — the accuracy audit every heuristic filter needs
    * before it gates a corpus: labeled × predicted language counts
    * with per-label recall share. Composes the langId operator (the
    * two stay expression-identical via the shared builders), then one
    * partial/final count aggregation whose key domain is |langs|² —
    * a ≤25-row final state at any corpus size; recall = one IEEE
    * division of exact integers. */
  def langIdEval(s: SparkSession, d: String): DataFrame = {
    val cell = langId(s, d)
      .groupBy(col("labeled_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val labTot = cell.groupBy(col("labeled_lang")).agg(sum(col("n_docs")).as("t"))
    cell.join(broadcast(labTot), "labeled_lang")
      .select(col("labeled_lang"), col("pred_lang"), col("n_docs"),
        (col("labeled_lang") === col("pred_lang")).as("is_correct"),
        round(col("n_docs").cast("double") / col("t"), 6).as("label_share"))
  }

  private val langIdEvalSql =
    s"""WITH pred AS ($langIdSql),
       |c AS (
       |  SELECT labeled_lang, pred_lang, cast(count(*) as bigint) AS n_docs
       |  FROM pred GROUP BY 1, 2),
       |lt AS (SELECT labeled_lang, cast(sum(n_docs) as bigint) AS t
       |       FROM c GROUP BY 1)
       |SELECT labeled_lang, pred_lang, n_docs,
       |  labeled_lang = pred_lang AS is_correct,
       |  round(cast(n_docs as double) / t, 6) AS label_share
       |FROM c JOIN lt USING (labeled_lang)""".stripMargin

  /** Fluency floor for the ensemble's LM gate — sits just under the
    * corpus median bigram probability, so the gate actually
    * discriminates on this corpus. */
  private val EnsembleLmMin = 0.032

  /** The production filter STACK as one table — every quality signal
    * the repo computes (heuristic quality score, Gopher word-shape
    * gate, repetition gate, bigram-LM fluency) joined per document
    * with per-filter verdicts, a failure count, and the final keep
    * decision. This is the artifact a curation run reviews before
    * committing to a filter config: which filters fire, how often,
    * and on which documents they disagree. Four narrow per-doc
    * relations equi-join on doc_id (co-partitioned by the join key —
    * one shuffle each, no broadcast needed since all sides are
    * |corpus| rows); each signal stays expression-identical to its
    * standalone operator, so the ensemble can't drift from the
    * already-oracled parts. */
  def qualityEnsemble(s: SparkSession, d: String): DataFrame = {
    val q = quality(s, d).select(col("doc_id"), col("quality"))
    val g = qualityGopher(s, d).select(col("doc_id"), col("keep").as("gopher_ok"))
    val r = repetition(s, d).select(col("doc_id"), col("is_repetitive"))
    val l = VocabOps.lmScore(s, d).select(col("doc_id"), col("lm_score"))
    val fails =
      when(col("quality") < 0.5, 1).otherwise(0) +
        when(!col("gopher_ok"), 1).otherwise(0) +
        when(col("is_repetitive"), 1).otherwise(0) +
        when(col("lm_score") < EnsembleLmMin, 1).otherwise(0)
    q.join(g, "doc_id").join(r, "doc_id").join(l, "doc_id")
      .select(col("doc_id"), col("quality"), col("gopher_ok"),
        col("is_repetitive"), col("lm_score"),
        fails.as("n_failed"),
        (fails === 0).as("keep"))
  }

  // def, not val: it interpolates SQL vals declared LATER in this
  // object (gopher/repetition) — a val here would capture null at
  // object-init time
  private def qualityEnsembleSql: String =
    s"""WITH q AS ($qualitySql),
       |g AS ($qualityGopherSql),
       |r AS ($repetitionSql),
       |l AS (${VocabOps.lmScoreSql}),
       |j AS (
       |  SELECT q.doc_id, q.quality, g.keep AS gopher_ok,
       |    r.is_repetitive, l.lm_score,
       |    (CASE WHEN q.quality < 0.5 THEN 1 ELSE 0 END
       |     + CASE WHEN NOT g.keep THEN 1 ELSE 0 END
       |     + CASE WHEN r.is_repetitive THEN 1 ELSE 0 END
       |     + CASE WHEN l.lm_score < $EnsembleLmMin THEN 1 ELSE 0 END)
       |      AS n_failed
       |  FROM q JOIN g ON q.doc_id = g.doc_id
       |         JOIN r ON q.doc_id = r.doc_id
       |         JOIN l ON q.doc_id = l.doc_id)
       |SELECT doc_id, quality, gopher_ok, is_repetitive, lm_score,
       |  cast(n_failed as int) AS n_failed, n_failed = 0 AS keep
       |FROM j""".stripMargin

  /** CTE chain ending in `qual(doc_id, quality)` — the quality score
    * only, for oracles that embed it (clean_corpus). Must stay
    * expression-identical to `quality`/`qualitySql`. */
  private[operators] val qualityCte: String = {
    val toks = text.tokensSql
    val stopList = text.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""qt AS (SELECT doc_id, $toks AS toks FROM documents),
       |qm AS (
       |  SELECT doc_id,
       |    cast(len(toks) as double) AS n_tok,
       |    cast(len(list_filter(toks, x -> list_contains($stopList, x))) as double) AS n_stop,
       |    cast(len(list_distinct(toks)) as double) AS n_uniq
       |  FROM qt),
       |qual AS (
       |  SELECT doc_id,
       |    (least(n_tok / 20.0, 1.0) * 0.4
       |     + (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 0.3
       |     + (CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END) * 0.3) AS quality
       |  FROM qm)""".stripMargin
  }

  /** The rolling-hash fingerprint as a bare SQL expression over a
    * `text` column (for composition into other oracles). */
  private[operators] val fpExprSql: String =
    """list_reduce(
      |    list_prepend(cast(0 as bigint),
      |      list_transform(string_split(text, ''), c -> cast(ascii(c) as bigint))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  // ------------------------------------------------------ fingerprint

  /** Polynomial rolling-hash fingerprint of the full text (mod 1e9+7)
    * — the content-identity primitive the exact-dedup path builds on. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      text.rollingHash(col("text")).as("fp"),
      length(col("text")).as("text_len"))

  private val fingerprintSql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(cast(0 as bigint),
      |      list_transform(string_split(text, ''), c -> cast(ascii(c) as bigint))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp,
      |  cast(length(text) as int) AS text_len
      |FROM documents""".stripMargin

  /** Normalization materializer: lowercase, stopwords dropped,
    * whitespace collapsed — the cleaned text a tokenizer consumes.
    * Narrow map, zero shuffle. */
  def normalize(s: SparkSession, d: String): DataFrame = {
    val toks = text.tokens(col("text"))
    val kept = filter(toks, t => !t.isin(text.stopwords: _*))
    Tables.documents(s, d).select(
      col("doc_id"),
      concat_ws(" ", kept).as("norm_text"),
      size(toks).as("n_tokens_raw"),
      size(kept).as("n_tokens_kept"))
  }

  private val normalizeSql = {
    val stopList = text.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    val toks = text.tokensSql
    s"""SELECT doc_id,
       |  array_to_string(list_filter($toks, x -> NOT list_contains($stopList, x)), ' ')
       |    AS norm_text,
       |  cast(len($toks) as int) AS n_tokens_raw,
       |  cast(len(list_filter($toks, x -> NOT list_contains($stopList, x))) as int)
       |    AS n_tokens_kept
       |FROM documents""".stripMargin
  }

  // -------------------------------------------------------- redaction

  /** PII patterns kept to the regex subset Java and RE2 interpret
    * identically (character classes, bounded repeats, \b/\d) so the
    * DuckDB mirror behaves the same byte-for-byte. */
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhonePat = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII scrubbing — the corpus-cleaning pass that replaces emails /
    * IPv4s / phone-shaped numbers with typed placeholder tokens and
    * reports per-doc match counts (counted on the RAW text; the
    * replacements run email → ip → phone in both engines). Narrow
    * map, zero shuffle, fully codegen'd. */
  def redact(s: SparkSession, d: String): DataFrame =
    redactFromDocs(Tables.documents(s, d))

  /** `docs` needs (doc_id, text). */
  private[graft] def redactFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        EmailPat, "<EMAIL>"), Ipv4Pat, "<IP>"), PhonePat, "<PHONE>")
        .as("redacted_text"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pat), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhonePat), lit(0))).as("n_phones"))

  private val redactSql =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailPat', '<EMAIL>', 'g'), '$Ipv4Pat', '<IP>', 'g'),
       |    '$PhonePat', '<PHONE>', 'g') AS redacted_text,
       |  cast(len(regexp_extract_all(text, '$EmailPat')) as int) AS n_emails,
       |  cast(len(regexp_extract_all(text, '$Ipv4Pat')) as int) AS n_ips,
       |  cast(len(regexp_extract_all(text, '$PhonePat')) as int) AS n_phones
       |FROM documents""".stripMargin

  // ------------------------------------------------------- repetition

  private val RepDupFracMax = 0.10
  private val RepTopShareMax = 0.05

  /** Gopher-style within-doc repetition metrics: duplicate-bigram
    * fraction and most-frequent-bigram share, with the composite
    * repetitive flag. Per-bigram counts need grouping, so this is
    * explode → (doc, gram) count → per-doc rollup: two partial/final
    * aggregations keyed by doc_id — shuffle volume is bounded by
    * distinct (doc, gram) pairs, never the corpus crossed with
    * itself, and docs without bigrams come back via the left join
    * with zero counts. */
  def repetition(s: SparkSession, d: String): DataFrame = {
    val docs = DedupOps.docsParallel(s, d)
    // bigram explode over the shared memoized tokenize pass — narrow,
    // already parallelized, no second regex scan of the corpus
    val grams = VocabOps.docToks(s, d).select(col("doc_id"),
      explode(text.ngrams(col("toks"), 2)).as("g"))
    val cnt = grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
    val stats = cnt.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))
    val topShare = when(col("n_grams") > 0,
      col("top_cnt").cast("double") / col("n_grams").cast("double")).otherwise(0.0)
    val dupFrac = when(col("n_grams") > 0,
      (col("n_grams") - col("n_distinct")).cast("double")
        / col("n_grams").cast("double")).otherwise(0.0)
    docs.select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_2grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_2grams_distinct"),
        topShare.as("top_share"),
        dupFrac.as("dup_frac"),
        (dupFrac > RepDupFracMax || topShare > RepTopShareMax)
          .as("is_repetitive"))
  }

  private val repetitionSql = {
    val toks = text.tokensSql
    s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    unnest(CASE WHEN len(t) < 2 THEN cast([] as varchar[])
       |           ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
       |           END) AS g
       |  FROM t),
       |cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
       |st AS (
       |  SELECT doc_id, cast(sum(c) as bigint) AS n_grams,
       |    cast(count(*) as bigint) AS n_distinct,
       |    cast(max(c) as bigint) AS top_cnt
       |  FROM cnt GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(n_grams, 0) AS n_2grams,
       |  coalesce(n_distinct, 0) AS n_2grams_distinct,
       |  CASE WHEN n_grams > 0
       |    THEN cast(top_cnt as double) / cast(n_grams as double)
       |    ELSE 0.0 END AS top_share,
       |  CASE WHEN n_grams > 0
       |    THEN cast(n_grams - n_distinct as double) / cast(n_grams as double)
       |    ELSE 0.0 END AS dup_frac,
       |  (CASE WHEN n_grams > 0
       |     THEN cast(n_grams - n_distinct as double) / cast(n_grams as double)
       |     ELSE 0.0 END > $RepDupFracMax
       |   OR CASE WHEN n_grams > 0
       |     THEN cast(top_cnt as double) / cast(n_grams as double)
       |     ELSE 0.0 END > $RepTopShareMax) AS is_repetitive
       |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin
  }

  // ---------------------------------------------------- gopher quality

  private val GopherMeanLenMin = 3.0
  private val GopherMeanLenMax = 10.0
  private val GopherShortFracMax = 0.4
  private val GopherMinTokens = 10

  /** Gopher-rule word-shape filters (mean word length in [3,10],
    * short-word fraction, minimum token count) as a narrow map —
    * zero shuffle, fully codegen'd; integer length sums divide once
    * at the end so both engines agree bit-exactly. */
  def qualityGopher(s: SparkSession, d: String): DataFrame = {
    val toks = text.tokens(col("text"))
    val nTok = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nShort = size(filter(toks, t => length(t) <= 2))
    val meanLen = when(nTok > 0,
      sumLen.cast("double") / nTok.cast("double")).otherwise(0.0)
    val fracShort = when(nTok > 0,
      nShort.cast("double") / nTok.cast("double")).otherwise(0.0)
    Tables.documents(s, d).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      meanLen.as("mean_word_len"),
      fracShort.as("frac_short_words"),
      (nTok >= GopherMinTokens &&
        meanLen >= GopherMeanLenMin && meanLen <= GopherMeanLenMax &&
        fracShort <= GopherShortFracMax).as("keep"))
  }

  private val qualityGopherSql = {
    val toks = text.tokensSql
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    cast(len(toks) as int) AS n_tok,
       |    list_reduce(list_prepend(cast(0 as bigint),
       |      list_transform(toks, x -> cast(length(x) as bigint))),
       |      (acc, x) -> acc + x) AS sum_len,
       |    cast(len(list_filter(toks, x -> length(x) <= 2)) as int) AS n_short
       |  FROM t)
       |SELECT doc_id,
       |  n_tok AS n_tokens,
       |  CASE WHEN n_tok > 0
       |    THEN cast(sum_len as double) / cast(n_tok as double)
       |    ELSE 0.0 END AS mean_word_len,
       |  CASE WHEN n_tok > 0
       |    THEN cast(n_short as double) / cast(n_tok as double)
       |    ELSE 0.0 END AS frac_short_words,
       |  (n_tok >= $GopherMinTokens
       |   AND CASE WHEN n_tok > 0
       |     THEN cast(sum_len as double) / cast(n_tok as double)
       |     ELSE 0.0 END >= $GopherMeanLenMin
       |   AND CASE WHEN n_tok > 0
       |     THEN cast(sum_len as double) / cast(n_tok as double)
       |     ELSE 0.0 END <= $GopherMeanLenMax
       |   AND CASE WHEN n_tok > 0
       |     THEN cast(n_short as double) / cast(n_tok as double)
       |     ELSE 0.0 END <= $GopherShortFracMax) AS keep
       |FROM m""".stripMargin
  }

  // ----------------------------------------- feature-hash embeddings

  private val HashDim = 64
  private val HashMod = 1000000007L

  /** Feature-hashing ("hashing trick") document embeddings: every
    * token hashes to one of 64 dimensions with a ±1 sign (bit 6 of
    * the rolling hash), signed counts accumulate per dimension, and
    * the dense integer vector L2-normalizes into the same 64-dim
    * float space the `embeddings` table uses — the cheap, stateless,
    * vocabulary-free text→vector step that closes the documents →
    * embedding → ANN pipeline (sign hashing keeps the estimate
    * unbiased, Weinberger et al.'s construction). Shuffle volume is
    * (doc × distinct dim) pairs — ≤64 rows per doc regardless of
    * document length, with map-side partial aggregation collapsing
    * token multiplicity first. */
  private[graft] def hashEmbedVectors(docs: DataFrame): DataFrame = {
    val dense = hashEmbedDense(docs)
    dense.select(col("doc_id"),
      when(col("norm2") > 0,
        transform(col("vec"),
          x => (x.cast("double") / sqrt(col("norm2").cast("double")))
            .cast("float")))
        .otherwise(transform(col("vec"), _ => lit(0.0f)))
        .as("embedding"))
  }

  /** Sparse signed hash counts (doc_id, dim, cnt) — the integer core
    * shared by the dense embedding and the hybrid-search dot
    * products. Works for ANY (doc_id, text)-shaped relation (the
    * hybrid query embeds its query string through the same path). */
  private[operators] def hashEmbedCounts(docs: DataFrame): DataFrame =
    hashEmbedCountsFromTokens(docs.select(col("doc_id"),
      explode(text.tokens(col("text"))).as("token")))

  /** Same counts from an already-tokenized (doc_id, token) stream —
    * corpus callers feed the shared memoized tokenize pass
    * (VocabOps.docTokens) here instead of re-running the regex. */
  private[operators] def hashEmbedCountsFromTokens(tok: DataFrame): DataFrame = {
    val h = text.rollingHash(col("token"))
    tok
      .select(col("doc_id"), (h % HashDim).cast("int").as("dim"),
        when(h % lit(2L * HashDim) < lit(HashDim.toLong), 1L)
          .otherwise(-1L).as("sign"))
      .groupBy("doc_id", "dim").agg(sum(col("sign")).as("cnt"))
  }

  private[operators] def hashEmbedDim: Int = HashDim

  /** The dense signed-count vector per doc (dim order), plus its
    * exact integer squared norm. Every doc appears, even token-free
    * ones (zero vector) — the grid join guarantees it. */
  private[operators] def hashEmbedDense(docs: DataFrame): DataFrame =
    hashEmbedDenseFrom(docs, hashEmbedCounts(docs))

  private def hashEmbedDenseFrom(docs: DataFrame, counts: DataFrame): DataFrame = {
    val grid = docs.select(col("doc_id"))
      .crossJoin(broadcast(
        docs.sparkSession.range(HashDim).select(col("id").cast("int").as("dim"))))
    grid.join(counts, Seq("doc_id", "dim"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("cnt")))).as("entries"))
      .select(col("doc_id"),
        expr("transform(entries, e -> e.cnt)").as("vec"))
      .withColumn("norm2",
        aggregate(col("vec"), lit(0L), (acc, x) => acc + x * x))
  }

  /** Oracle-checked view: float arrays don't hash-compare across
    * engines (dtype width), so the query publishes the exact integer
    * invariants of the embedding — nonzero count, integer squared
    * norm, and a positional polynomial digest of the signed counts —
    * which pin the full vector bit-for-bit. */
  def hashEmbed(s: SparkSession, d: String): DataFrame =
    hashEmbedDenseFrom(DedupOps.docsParallel(s, d),
      hashEmbedCountsFromTokens(VocabOps.docTokens(s, d)))
      .select(col("doc_id"),
        size(filter(col("vec"), x => x =!= 0L)).as("nnz"),
        col("norm2"),
        aggregate(col("vec"), lit(0L),
          (acc, x) => ((acc * 31 + x) % HashMod + HashMod) % HashMod)
          .as("digest"))

  /** The tokenize → signed-hash-count → dense-vector CTE chain
    * (tok/hs/counts/grid/vecs, `vecs(doc_id, vec)` last) — shared by
    * the hashEmbed mirror and the media semantic-dedup mirror, whose
    * stub encoder is exactly this pipeline over the decoded payload.
    * `src` is any in-scope (doc_id, text) relation: the media
    * semantic mirror feeds the sha-collapsed REPRESENTATIVE docs
    * here (round-12 rep-collapse), so the per-token vector work runs
    * over distinct payloads, not every replica. */
  private[operators] def hashEmbedVecCtesFor(src: String): String = {
    val toks = text.tokensSql
    val tokHash = "list_reduce(list_prepend(cast(0 as bigint), " +
      "list_transform(list_filter(string_split_regex(token, ''), c -> c <> ''), " +
      "c -> cast(ascii(c) as bigint))), (acc, x) -> (acc * 31 + x) % $M)"
        .replace("$M", HashMod.toString)
    s"""tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM $src),
       |hs AS (
       |  SELECT doc_id, $tokHash AS h FROM tok),
       |counts AS (
       |  SELECT doc_id, cast(h % $HashDim as int) AS dim,
       |    cast(sum(CASE WHEN h % ${2 * HashDim} < $HashDim
       |             THEN 1 ELSE -1 END) as bigint) AS cnt
       |  FROM hs GROUP BY 1, 2),
       |grid AS (
       |  SELECT doc_id, cast(unnest(range(0, $HashDim)) as int) AS dim
       |  FROM $src),
       |vecs AS (
       |  SELECT g.doc_id, list(coalesce(c.cnt, 0) ORDER BY g.dim) AS vec
       |  FROM grid g LEFT JOIN counts c ON g.doc_id = c.doc_id AND g.dim = c.dim
       |  GROUP BY g.doc_id)""".stripMargin
  }

  private[operators] def hashEmbedVecCtes: String =
    hashEmbedVecCtesFor("documents")

  private val hashEmbedSql = {
    s"""WITH $hashEmbedVecCtes
       |SELECT doc_id,
       |  cast(len(list_filter(vec, x -> x <> 0)) as int) AS nnz,
       |  list_reduce(list_prepend(cast(0 as bigint), vec),
       |    (acc, x) -> acc + x * x) AS norm2,
       |  list_reduce(list_prepend(cast(0 as bigint), vec),
       |    (acc, x) -> ((acc * 31 + x) % $HashMod + $HashMod) % $HashMod)
       |    AS digest
       |FROM vecs""".stripMargin
  }

  // ------------------------------------------------- boilerplate spans

  private val BoilerK = 3
  private val BoilerDf = 5
  private val BoilerFracMax = 0.5

  /** C4-style boilerplate-span detection: a K-token gram that appears
    * in ≥ [[BoilerDf]] distinct documents is boilerplate (navigation
    * chrome, license headers, templated text), and each document
    * reports what fraction of its gram INSTANCES are boilerplate —
    * the pre-dedup cleaning signal (a high-boilerplate doc is
    * template, not content). Scale shape: the gram explode is narrow;
    * document frequency is one partial/final aggregation over
    * DISTINCT (doc, gram); the boilerplate set is the Zipf HEAD of
    * that distribution (df ≥ threshold), orders of magnitude smaller
    * than the gram universe, so marking instances is a broadcast
    * join — the exploded grams never shuffle for the mark, only for
    * the per-doc recount, which partial-aggregates to one row per doc
    * before the exchange. */
  def boilerplate(s: SparkSession, d: String): DataFrame = {
    val docs = DedupOps.docsParallel(s, d)
    val grams = VocabOps.docToks(s, d).select(col("doc_id"),
      explode(text.ngrams(col("toks"), BoilerK)).as("sh"))
    val boiler = grams.select(col("doc_id"), col("sh")).distinct()
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerDf)
      .select(col("sh"), lit(1L).as("is_boiler"))
    val per = grams.join(broadcast(boiler), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        when(col("n_grams") > 0,
          col("n_boiler").cast("double") / col("n_grams").cast("double"))
          .otherwise(0.0))
      .withColumn("keep", col("boiler_frac") <= BoilerFracMax)
  }

  private val boilerplateSql = {
    val toks = text.tokensSql
    s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(t) - ${BoilerK - 2}),
       |      i -> list_reduce(list_slice(t, i, i + ${BoilerK - 1}),
       |             (a, b) -> a || ' ' || b))) AS sh
       |  FROM toks WHERE len(t) >= $BoilerK),
       |boiler AS (
       |  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM g)
       |  GROUP BY sh HAVING count(*) >= $BoilerDf),
       |per AS (
       |  SELECT g.doc_id,
       |    cast(count(*) as bigint) AS n_grams,
       |    cast(count(*) FILTER (b.sh IS NOT NULL) as bigint) AS n_boiler
       |  FROM g LEFT JOIN boiler b ON g.sh = b.sh
       |  GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(per.n_grams, 0) AS n_grams,
       |  coalesce(per.n_boiler, 0) AS n_boiler,
       |  CASE WHEN coalesce(per.n_grams, 0) > 0
       |    THEN cast(per.n_boiler as double) / cast(per.n_grams as double)
       |    ELSE 0.0 END AS boiler_frac,
       |  (CASE WHEN coalesce(per.n_grams, 0) > 0
       |    THEN cast(per.n_boiler as double) / cast(per.n_grams as double)
       |    ELSE 0.0 END) <= $BoilerFracMax AS keep
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin
  }

  // ----------------------------------------------------- char classes

  /** Character-class profile per document — the alphabetic/digit/
    * whitespace/symbol breakdown quality pipelines threshold on
    * (code-vs-prose detection, mojibake screens, the C4 "too much
    * punctuation" cut). Counts come from length differences after
    * class-targeted regexp strips (one narrow codegen'd map, zero
    * shuffle); shares are exact integer ppm. */
  def charStats(s: SparkSession, d: String): DataFrame = {
    def cnt(pat: String) =
      length(col("text")) - length(regexp_replace(col("text"), pat, ""))
    Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        cnt("[A-Za-z]").as("n_alpha"), cnt("[0-9]").as("n_digit"),
        // explicit class, not \s: Java \s includes \x0B, RE2 \s
        // does not — same contract as graft.functions.text.WsClass
        cnt(graft.functions.text.WsClass).as("n_space"))
      .withColumn("n_other",
        col("n_chars") - col("n_alpha") - col("n_digit") - col("n_space"))
      .withColumn("alpha_ppm",
        when(col("n_chars") > 0,
          expr("cast(n_alpha as bigint) * 1000000 div n_chars"))
          .otherwise(0L))
      .select(col("doc_id"), col("n_chars").cast("int").as("n_chars"),
        col("n_alpha").cast("int").as("n_alpha"),
        col("n_digit").cast("int").as("n_digit"),
        col("n_space").cast("int").as("n_space"),
        col("n_other").cast("int").as("n_other"),
        col("alpha_ppm"))
  }

  private val charStatsSql =
    """WITH c AS (
      |  SELECT doc_id, cast(length(text) as int) AS n_chars,
      |    cast(length(text)
      |      - length(regexp_replace(text, '[A-Za-z]', '', 'g')) as int)
      |      AS n_alpha,
      |    cast(length(text)
      |      - length(regexp_replace(text, '[0-9]', '', 'g')) as int)
      |      AS n_digit,
      |    cast(length(text)
      |      - length(regexp_replace(text, '[ \t\n\x0b\f\r]', '', 'g')) as int)
      |      AS n_space
      |  FROM documents)
      |SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
      |  n_chars - n_alpha - n_digit - n_space AS n_other,
      |  CASE WHEN n_chars > 0
      |    THEN cast(n_alpha as bigint) * 1000000 // n_chars
      |    ELSE 0 END AS alpha_ppm
      |FROM c""".stripMargin

  // ------------------------------------------------ lexical diversity

  private val TtrMinToks = 50L
  private val TtrLowPpm = 300000L

  /** Per-document lexical diversity: type-token ratio + hapax share —
    * the UNIGRAM companion of text_repetition's bigram duplication
    * signals (template/spam pages reuse a tiny vocabulary even when
    * no bigram repeats verbatim; both filters run in real curation
    * stacks). Reads the memoized per-doc term-frequency relation
    * (zero extra tokenize/explode cost in-session), one partial/final
    * per-doc aggregation; ratios in exact integer ppm so the
    * low-diversity gate sits on no float knife edge. Short docs are
    * exempt from the flag (TTR is length-biased — flagging a 5-token
    * doc for 100% TTR would be backwards; [[TtrMinToks]] gates it). */
  def lexicalDiversity(s: SparkSession, d: String): DataFrame = {
    val st = VocabOps.docTf(s, d).groupBy("doc_id")
      .agg(sum(col("tf")).as("n_toks"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
    DedupOps.docsParallel(s, d).select(col("doc_id"))
      .join(st, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_toks"), col("n_types"), col("n_hapax"),
        when(col("n_toks") === 0, 0L)
          .otherwise(expr("n_types * 1000000 div n_toks")).as("ttr_ppm"),
        when(col("n_types") === 0, 0L)
          .otherwise(expr("n_hapax * 1000000 div n_types")).as("hapax_ppm"))
      .withColumn("low_diversity",
        col("n_toks") >= TtrMinToks && col("ttr_ppm") < TtrLowPpm)
  }

  private val lexicalDiversitySql = {
    val toks = text.tokensSql
    s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS token FROM t),
       |tf AS (SELECT doc_id, token, cast(count(*) as bigint) AS tf
       |       FROM tok GROUP BY 1, 2),
       |st AS (
       |  SELECT doc_id, cast(sum(tf) as bigint) AS n_toks,
       |    cast(count(*) as bigint) AS n_types,
       |    cast(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) as bigint) AS n_hapax
       |  FROM tf GROUP BY 1),
       |j AS (
       |  SELECT d.doc_id, coalesce(st.n_toks, 0) AS n_toks,
       |    coalesce(st.n_types, 0) AS n_types,
       |    coalesce(st.n_hapax, 0) AS n_hapax
       |  FROM documents d LEFT JOIN st USING (doc_id))
       |SELECT doc_id, n_toks, n_types, n_hapax,
       |  cast(CASE WHEN n_toks = 0 THEN 0
       |       ELSE n_types * 1000000 // n_toks END as bigint) AS ttr_ppm,
       |  cast(CASE WHEN n_types = 0 THEN 0
       |       ELSE n_hapax * 1000000 // n_types END as bigint) AS hapax_ppm,
       |  (n_toks >= $TtrMinToks AND
       |   (CASE WHEN n_toks = 0 THEN 0
       |         ELSE n_types * 1000000 // n_toks END) < $TtrLowPpm)
       |    AS low_diversity
       |FROM j""".stripMargin
  }

  /** `text_ngram_novelty`: per-doc first-occurrence share of its
    * df-capped bigrams — the fraction of a doc's (rare) shingles
    * whose FIRST appearance in the corpus (min doc_id — the corpus's
    * stable ingest order) is this doc. The standard freshness /
    * memorization-risk panel for training-data curation: a doc whose
    * shingles all debuted earlier adds no new n-gram mass (near-dup,
    * boilerplate remix, quote collage) even when no single pair
    * crosses a dedup threshold. Shares [[DedupOps.shingleSets]]'s
    * memoized universe and df discipline (a >MaxDf shingle is
    * "novel" for no one); docs with zero qualifying shingles have no
    * novelty to report and are absent, same as the dedup family.
    * Score is ONE integer division (exact ppm) — bit-identical
    * cross-engine. At 100 TB: one aggregation to the first-seen
    * relation (|distinct shingles| rows), one shingle-keyed shuffle
    * join back, one per-doc aggregation — no self-join, no window. */
  def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = DedupOps.shingleSets(s, d)
    val first = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_ppm", expr("(1000000 * n_novel) div n_sh"))
  }

  private val ngramNoveltySql =
    s"""WITH ${DedupOps.shingleSetsSqlCte},
       |first AS MATERIALIZED (
       |  SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh)
       |SELECT s.doc_id,
       |  cast(count(*) as bigint) AS n_sh,
       |  cast(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
       |    as bigint) AS n_novel,
       |  (1000000 * cast(sum(CASE WHEN f.first_doc = s.doc_id
       |                           THEN 1 ELSE 0 END) as bigint))
       |    // cast(count(*) as bigint) AS novelty_ppm
       |FROM sh s JOIN first f USING (sh)
       |GROUP BY s.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_ngram_novelty" -> (ngramNovelty _),
    "text_lexical_diversity" -> (lexicalDiversity _),
    "text_char_stats" -> (charStats _),
    "text_boilerplate" -> (boilerplate _),
    "doc_hash_embed" -> (hashEmbed _),
    "text_repetition" -> (repetition _),
    "text_quality_gopher" -> (qualityGopher _),
    "text_redact" -> (redact _),
    "text_normalize" -> (normalize _),
    "text_token_count" -> (tokenCount _),
    "text_quality" -> (quality _),
    "text_lang_id" -> (langId _),
    "text_langid_eval" -> (langIdEval _),
    "doc_quality_ensemble" -> (qualityEnsemble _),
    "text_fingerprint" -> (fingerprint _))

  val oracle: Map[String, String] = Map(
    "text_ngram_novelty" -> ngramNoveltySql,
    "text_lexical_diversity" -> lexicalDiversitySql,
    "text_char_stats" -> charStatsSql,
    "text_boilerplate" -> boilerplateSql,
    "text_langid_eval" -> langIdEvalSql,
    "doc_quality_ensemble" -> qualityEnsembleSql,
    "doc_hash_embed" -> hashEmbedSql,
    "text_repetition" -> repetitionSql,
    "text_quality_gopher" -> qualityGopherSql,
    "text_redact" -> redactSql,
    "text_normalize" -> normalizeSql,
    "text_token_count" -> tokenCountSql,
    "text_quality" -> qualitySql,
    "text_lang_id" -> langIdSql,
    "text_fingerprint" -> fingerprintSql)
}
