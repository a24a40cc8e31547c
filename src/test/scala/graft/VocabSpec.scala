package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.VocabOps
import graft.functions.text

class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = TestSession.sf

  test("ngrams keeps multiplicity and order; shingles is its distinct set") {
    val df = Seq("a b a b").toDF("t")
      .select(text.ngrams(text.tokens(col("t")), 2).as("g"),
        text.shingles(text.tokens(col("t")), 2).as("s"))
    val r = df.first
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(r.getSeq[String](1).sorted == Seq("a b", "b a"))
    // short-doc guard: 1 token < n=2 → empty, not a descending sequence
    val short = Seq("solo").toDF("t")
      .select(text.ngrams(text.tokens(col("t")), 2)).first.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("docFreq agrees with a driver-side recount and prunes both tails") {
    val vocab = VocabOps.docFreq(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val expected = docs
      .flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    assert(vocab.view.mapValues(_._1).toMap == expected)
    val n = docs.length
    vocab.foreach { case (t, (dfq, keep)) =>
      assert(keep == (dfq >= 2 && dfq * 2 <= n), s"token $t df=$dfq n=$n")
    }
  }

  test("docFreq prunes both tails (planted rare + ubiquitous tokens)") {
    val docs = Seq(
      "common rare1 filler1", "common filler2", "common filler3",
      "common filler4").toDF("text")
    val vocab = VocabOps.docFreqFromDocs(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(vocab("rare1") == ((1L, false)))   // df < MinDf
    assert(vocab("common") == ((4L, false)))  // df·2 > n_docs
    assert(vocab.filter(_._1.startsWith("filler")).forall(!_._2._2))
    // a mid-band token: appears twice in 4 docs → kept
    val mid = VocabOps.docFreqFromDocs(
      (docs.collect().map(_.getString(0)) :+ "rare1 x").toSeq.toDF("text"))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(mid("rare1"))
  }

  test("redact replaces emails/ips/phones and counts on the raw text") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "contact John.Doe@Example.com or 10.0.0.1"),
      (2L, "call 555-123-4567 twice: 555-123-4567"),
      (3L, "clean text")).toDF("doc_id", "text")
    val r = TextOps.redactFromDocs(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getString(1) == "contact <EMAIL> or <IP>")
    assert((r(1L).getInt(2), r(1L).getInt(3), r(1L).getInt(4)) == ((1, 1, 0)))
    assert(r(2L).getString(1) == "call <PHONE> twice: <PHONE>")
    assert(r(2L).getInt(4) == 2)
    assert(r(3L).getString(1) == "clean text" && r(3L).getInt(2) == 0)
  }

  test("decontaminate: benchmark docs fully hit; flag is the integer rule") {
    import graft.operators.CorpusOps
    val out = CorpusOps.decontaminate(spark, sf).collect()
    assert(out.nonEmpty)
    val bm = out.filter(_.getBoolean(4))
    // a benchmark doc's surviving shingles are all in the benchmark
    // set by construction (the df cap drops from both sides)
    assert(bm.nonEmpty && bm.forall(r => r.getLong(2) == r.getLong(1)))
    out.foreach { r =>
      assert(r.getBoolean(5) == (2 * r.getLong(2) >= r.getLong(1)))
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("ngramTopK ranks per language by (count desc, ngram asc), k bounded") {
    val top = VocabOps.ngramTopK(spark, sf).collect()
    assert(top.nonEmpty)
    val byLang = top.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length <= 20, s"$lang has ${rows.length} rows")
      val ordered = rows.sortBy(_.getInt(3))
      // ranks are 1..m and the sort key is honored
      assert(ordered.map(_.getInt(3)).toSeq == (1 to rows.length))
      val key = ordered.map(r => (-r.getLong(2), r.getString(1))).toSeq
      assert(key == key.sorted, s"$lang not ordered by (n desc, ngram)")
    }
    // spot-check the global winner against a driver-side recount
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { r =>
      val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(2).filter(_.length == 2).foreach { w =>
        val k = (r.getString(0), w.mkString(" "))
        counts(k) = counts.getOrElse(k, 0L) + 1
      }
    }
    val (lang, _) = counts.keys.head
    val want = counts.filterKeys(_._1 == lang).toSeq
      .sortBy { case ((_, g), n) => (-n, g) }.head
    val got = top.filter(r => r.getString(0) == lang && r.getInt(3) == 1).head
    assert((got.getString(1), got.getLong(2)) == (want._1._2, want._2))
  }

  test("bm25: scores positive, ranked desc, and agree with a driver recompute") {
    val out = VocabOps.bm25(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val scores = out.map(_.getDouble(2))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-_)), "not ranked by score desc")
    // driver-side recompute of the top doc's score from raw text
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("\\s+").filter(_.nonEmpty)).toMap
    val terms = Seq("spark", "join", "window")
    val n = docs.size.toDouble
    val sumDl = docs.values.map(_.length.toLong).sum.toDouble
    val avgdl = sumDl / n
    val dfs = terms.map(t => docs.values.count(_.contains(t)).toDouble)
    def score(toks: Array[String]): Double = {
      val dl = toks.length.toDouble
      terms.zip(dfs).map { case (t, df) =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else ((n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      }.sum
    }
    val top = out.head
    assert(math.abs(score(docs(top.getLong(0))) - top.getDouble(2)) < 1e-9)
  }

  test("lm score: probabilities average within (0,1]; repeated text scores high") {
    val out = VocabOps.lmScore(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val sc = r.getDouble(2)
      assert(sc >= 0.0 && sc <= 1.0, s"lm_score $sc out of range")
      if (r.getLong(1) > 0) assert(sc > 0.0, "docs with bigrams score > 0")
    }
    // sanity: the mean score is well above 0 (corpus is its own LM,
    // so common continuations dominate)
    val mean = out.map(_.getDouble(2)).sum / out.length
    assert(mean > 0.001, s"mean lm score $mean suspiciously low")
  }

  test("doc tfidf: <=k ranked terms per doc; a corpus-rare heavy term ranks first") {
    val out = VocabOps.docTfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.size == Tables.documents(spark, sf).count())
    byDoc.values.foreach { rows =>
      assert(rows.length <= 5)
      assert(rows.map(_._4).sorted.sameElements(1 to rows.length))
    }
    // driver-side recompute for one doc: the top term must maximize
    // tf * (N - df + 0.5) / (df + 0.5) with the token tiebreak
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).toSeq).toMap
    val n = docs.size.toDouble
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val someDoc = docs.keys.min
    val toks = docs(someDoc)
    val best = toks.distinct.map { t =>
      (t, toks.count(_ == t).toDouble * ((n - dfm(t) + 0.5) / (dfm(t) + 0.5)))
    }.minBy { case (t, sc) => (-sc, t) }
    val got = byDoc(someDoc).minBy(_._4)
    assert(got._2 == best._1,
      s"doc $someDoc top term ${got._2} != recomputed ${best._1}")
  }

  test("pmi collocations: counts consistent, association above independence") {
    val rows = VocabOps.pmi(spark, TestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { case (bg, nab, na, nb, assoc) =>
      val Array(a, b) = bg.split(" ")
      assert(nab >= 5, s"$bg below min count")
      assert(na >= nab && nb >= nab,
        s"$bg marginals ($na,$nb) below pair count $nab")
      assert(assoc > 0.0)
      assert(a.nonEmpty && b.nonEmpty)
    }
    // ranked descending by association
    rows.map(_._5).sliding(2).foreach {
      case Array(x, y) => assert(x >= y, "not ranked by association")
      case _ =>
    }
  }

  test("coverage: cum_ppm strictly increasing, counts desc, agrees with a recount") {
    val rows = VocabOps.coverage(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 30)
    // counts non-increasing with rank, cumulative share strictly increasing, <= 1e6
    rows.sliding(2).foreach {
      case Array((_, _, c1, p1), (_, _, c2, p2)) =>
        assert(c1 >= c2, "counts must be non-increasing in rank")
        assert(p2 > p1, "cumulative ppm must strictly increase")
      case _ =>
    }
    assert(rows.last._4 <= 1000000L)
    // driver recount of the full token stream pins cnt and the ppm math
    val counts = Tables.documents(spark, sf).collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    val total = counts.values.sum
    var cum = 0L
    rows.foreach { case (_, tok, cnt, ppm) =>
      assert(counts(tok) == cnt, s"count mismatch for $tok")
      cum += cnt
      assert(ppm == cum * 1000000L / total, s"ppm mismatch for $tok")
    }
  }

  test("freq spectrum: mass conserves the corpus token count; hapax row exact") {
    val out = VocabOps.freqSpectrum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = Tables.documents(spark, sf).collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).map { case (_, a) => a.length.toLong }
      .toSeq
    val totalTokens = counts.sum
    assert(out.map(_._3).sum == totalTokens,
      "spectrum mass must equal the corpus token count")
    assert(out.map(_._2).sum == counts.length.toLong,
      "token counts must partition the vocabulary")
    val hapax = counts.count(_ == 1L).toLong
    assert(out.find(_._1 == 1L).map(_._2).getOrElse(0L) == hapax)
    out.foreach { case (freq, nTok, mass, ppm) =>
      assert(mass == freq * nTok)
      assert(ppm == mass * 1000000L / totalTokens)
    }
  }

  test("oov rate: counts match a driver recount against the top-16 vocab") {
    val out = VocabOps.oovRate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docToks = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    val freqs = docToks.values.flatten.groupBy(identity(_))
      .map { case (t, a) => t -> a.size.toLong }
    val vocab = freqs.toSeq.sortBy { case (t, f) => (-f, t) }.take(16)
      .map(_._1).toSet
    assert(out.keySet == docToks.keySet)
    docToks.foreach { case (id, toks) =>
      val (nTok, nOov, ppm) = out(id)
      assert(nTok == toks.length.toLong)
      assert(nOov == toks.count(t => !vocab.contains(t)).toLong, s"doc $id oov")
      assert(ppm == nOov * 1000000L / nTok)
    }
    assert(out.values.exists(_._2 > 0), "some doc must carry OOV tokens")
  }

  test("vocab growth: cumulative counts conserve and are monotone") {
    val rows = VocabOps.vocabGrowth(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (0 to 9))
    val docs = Tables.documents(spark, sf)
    val totalDocs = docs.count()
    val totalVocab = docs
      .select(explode(text.tokens(col("text"))).as("t"))
      .select("t").distinct().count()
    val totalToks = docs
      .select(org.apache.spark.sql.functions.size(text.tokens(col("text"))).as("n"))
      .agg(sum(col("n"))).first.getLong(0)
    val last = rows.last
    assert(last.getLong(1) == totalDocs)
    assert(last.getLong(2) == totalToks)
    assert(last.getLong(3) == totalVocab, "final cum vocab = corpus vocab")
    // monotone non-decreasing cumulatives; marginals sum to the total
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1) && a.getLong(2) <= b.getLong(2)
        && a.getLong(3) <= b.getLong(3))
    }
    assert(rows.map(_.getLong(4)).sum == totalVocab)
  }

  test("hybrid search: rrf arithmetic checks out, lex ranks follow bm25") {
    val out = VocabOps.hybridSearch(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(lex.nonEmpty || sem.nonEmpty)
      val want = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-6, s"doc ${r.getLong(0)}")
    }
    // scores arrive fused-rank ordered
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
    // lex ranks agree with the bm25 ordering
    val bmOrder = VocabOps.bm25(spark, sf).collect().map(_.getLong(0)).toSeq
    out.foreach { r =>
      if (!r.isNullAt(1)) {
        val lr = r.getInt(1)
        assert(bmOrder(lr - 1) == r.getLong(0), s"lex rank $lr")
      }
    }
  }

  test("keyness: chi2 and ranking agree with a driver-side recount") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct))
    val nAll = docs.length.toLong
    val bySrc = docs.groupBy(_._1)
    val dfTot = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val want = bySrc.flatMap { case (src, g) =>
      val nSrc = g.size.toLong
      val dfSrc = g.flatMap(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      dfSrc.toSeq.flatMap { case (tok, a) =>
        val tot = dfTot(tok)
        if (tot >= nAll) None
        else {
          val b = nSrc - a
          val c = tot - a
          val dd = nAll - nSrc - c
          if (a * dd <= b * c) None
          else {
            val diff = (a * dd - b * c).toDouble
            Some((tok, nAll.toDouble * diff * diff /
              (nSrc.toDouble * (nAll - nSrc).toDouble
                * tot.toDouble * (nAll - tot).toDouble)))
          }
        }
      }.sortBy { case (tok, chi2) => (-chi2, tok) }
        .take(20).zipWithIndex
        .map { case ((tok, chi2), i) =>
          (src, tok) -> (math.floor(chi2 * 1e6) / 1e6, i + 1) }
    }.toMap
    val got = graft.operators.VocabOps.keyness(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getInt(5))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (chi2, rank)) =>
      assert(math.abs(chi2 - want(k)._1) < 1e-9, s"$k chi2")
      assert(rank == want(k)._2, s"$k rank")
    }
  }

  test("token shapes agree with a driver-side pretokenizer recount") {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => pat.findAllIn(r.getString(0).toLowerCase))
    def cls(t: String) =
      if (t.forall(c => c >= 'a' && c <= 'z')) "alpha"
      else if (t.forall(_.isDigit)) "digit" else "symbol"
    val want = toks.groupBy(t => (cls(t), t.length)).view.mapValues { g =>
      (g.size.toLong, g.distinct.size.toLong)
    }.toMap
    val got = graft.operators.VocabOps.tokenShapes(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"shape $k") }
    assert(got.values.map(_._1).sum == toks.length.toLong,
      "occurrences partition the token stream")
  }

  test("bpe merges: all registered steps match a driver-side reference trainer") {
    // reference BPE over the same (token, freq) table: count adjacent
    // symbol pairs weighted by freq, argmax with (n desc, a, b)
    // tiebreak, merge greedily left-to-right
    val freq0 = Tables.documents(spark, sf)
      .select(explode(text.tokens(col("text"))).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0).map(_.toString).toVector -> r.getLong(1))
    def step(words: Seq[(Vector[String], Long)]):
        ((String, String, Long), Seq[(Vector[String], Long)]) = {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      val merged = words.map { case (syms, cnt) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), cnt)
      }
      ((a, b, n), merged)
    }
    // roll the reference trainer through the full registered round
    // count (BpeSteps, 8 as of round 9), keeping each state for the
    // segment-side stats
    val states = scala.collection.mutable.ArrayBuffer(freq0.toSeq)
    val merges = (1 to VocabOps.BpeSteps).map { _ =>
      val (m, w) = step(states.last)
      states += w
      m
    }
    val got = VocabOps.bpeMerges(spark, sf).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
    assert(got.length == VocabOps.BpeSteps)
    merges.zip(got).zipWithIndex.foreach {
      case (((wa, wb, wn), (ga, gb, gn, gm)), i) =>
        assert((ga, gb, gn) == (wa, wb, wn), s"step ${i + 1}")
        assert(gm == wa + wb, s"step ${i + 1} merged symbol")
    }

    // the APPLY side: segmentation stats match the same reference
    // trainer's word states, compression is monotone
    def stats(words: Seq[(Vector[String], Long)]): (Long, Long) =
      (words.map(_._2).sum, words.map { case (s, n) => s.length * n }.sum)
    val want = states.toSeq.map(stats)
    val seg = VocabOps.bpeSegment(spark, sf).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(seg.length == VocabOps.BpeSteps + 1)
    val base = want.head._2
    seg.zip(want).zipWithIndex.foreach {
      case (((st, nTok, nSym, sptPpm, redPpm), (wTok, wSym)), i) =>
        assert(st == i, s"step order")
        assert(nTok == wTok && nSym == wSym, s"step $i counts")
        assert(sptPpm == wSym * 1000000L / wTok, s"step $i spt")
        assert(redPpm == (base - wSym) * 1000000L / base, s"step $i red")
    }
    assert(seg.map(_._3).toSeq == seg.map(_._3).sorted.reverse.toSeq,
      "symbol count monotonically decreases")
  }

  test("ppl buckets: exact match to a driver-side tercile recount") {
    val rows = VocabOps.pplBucket(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.length == 500, "one bucket verdict per document")
    // recompute the cuts from the operator's own scores (lm scoring
    // itself is pinned by the lm-score test): smallest score whose
    // cumulative count clears n/3 (resp. 2n/3), ties to the LOWER
    // bucket — then every doc's bucket must match exactly
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val n = docs.length.toLong
      val sorted = docs.map(_._3).sorted
      def cut(mult: Long): Long =
        sorted.zipWithIndex
          .find { case (_, i) => (i + 1).toLong * 3 >= n * mult }.get._1
      val (cutTail, cutMid) = (cut(1), cut(2))
      docs.foreach { case (did, _, score, bucket) =>
        val want = if (score <= cutTail) "tail"
                   else if (score <= cutMid) "middle" else "head"
        assert(bucket == want,
          s"doc $did lang $lang score $score: got $bucket want $want")
      }
      // each bucket holds roughly a third: the head can't start
      // before 2n/3 and the tail reaches at least n/3
      val tailN = docs.count(_._4 == "tail").toLong
      assert(tailN * 3 >= n, s"lang $lang tail too small")
      val headN = docs.count(_._4 == "head").toLong
      assert(headN * 3 <= n, s"lang $lang head too large")
    }
  }

  test("fertility: per-language totals partition the global segment stats") {
    val fert = VocabOps.fertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fert.length == 5, "one row per language")
    // the same corpus, the same trained merges: language rollups must
    // partition the global step-BpeSteps totals bpeSegment publishes
    val seg = VocabOps.bpeSegment(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .find(_._1 == VocabOps.BpeSteps).get
    assert(fert.map(_._2).sum == seg._2, "token totals partition")
    assert(fert.map(_._3).sum == seg._3, "symbol totals partition")
    fert.foreach { case (lang, nt, ns, ppm) =>
      assert(ppm == ns * 1000000L / nt, s"$lang ppm exact")
      assert(ppm >= 1000000L, s"$lang fertility >= 1 symbol per token")
    }
  }
}
