package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.functions.text

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = TestSession.sf

  test("rolling hash matches a hand-computed golden value") {
    val got = Seq("abc").toDF("t").select(text.rollingHash(col("t"))).first.getLong(0)
    // ((0*31+97)*31+98)*31+99 = 96354
    assert(got == 96354L)
  }

  test("token counts agree with a driver-side recount on a sample") {
    val sample = Tables.documents(spark, sf).limit(20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.tokenCount(spark, sf)
      .filter(col("doc_id") < 20).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    sample.foreach { case (id, t) =>
      val ws = t.toLowerCase.split("\\s+").count(_.nonEmpty)
      val bpe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r.findAllIn(t.toLowerCase).size
      assert(got(id) == ((ws, bpe)), s"doc $id")
    }
  }

  test("quality scores are in [0,1] and deterministic") {
    val q = TextOps.quality(spark, sf)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    val a = q.orderBy("doc_id").limit(5).collect().map(_.getDouble(4)).toSeq
    val b = TextOps.quality(spark, sf).orderBy("doc_id").limit(5).collect()
      .map(_.getDouble(4)).toSeq
    assert(a == b)
  }

  test("lang id predicts a profile language for every doc with en dominating") {
    val l = TextOps.langId(spark, sf)
    assert(l.count() == Tables.documents(spark, sf).count())
    val langs = l.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
    // the synthetic corpus is english-ish db jargon: 'the'/'a'... dominate
    val top = l.groupBy("pred_lang").count().orderBy(col("count").desc)
      .first.getString(0)
    assert(top == "en", s"top predicted lang was $top")
  }

  test("repetition: planted repetitive doc flags; counts reconcile") {
    val s = TestSession.spark
    val r = operators.TextOps.repetition(s, TestSession.sf).collect()
    assert(r.length == 500)
    r.foreach { row =>
      val (n, dist) = (row.getLong(1), row.getLong(2))
      assert(dist <= n, "distinct bigrams cannot exceed total")
      val dup = row.getDouble(4)
      assert(dup >= 0.0 && dup <= 1.0)
      if (n > 0)
        assert(math.abs(dup - (n - dist).toDouble / n) < 1e-12)
    }
    // a doc that is one bigram repeated is maximally repetitive
    import s.implicits._
    val planted = Seq((1L, "ab cd ab cd ab cd ab cd ab cd"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    // route the planted frame through the same expressions
    val toks = graft.functions.text.tokens(col("text"))
    val grams = planted.select(col("doc_id"),
      explode(graft.functions.text.ngrams(toks, 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n"), count(lit(1)).as("d"))
      .collect().map(r0 => r0.getLong(0) -> (r0.getLong(1), r0.getLong(2))).toMap
    assert(grams(1L)._2 == 2 && grams(1L)._1 == 9) // "ab cd"/"cd ab" repeated
    assert(grams(2L)._1 == grams(2L)._2)           // all distinct
  }

  test("gopher quality: bounds hold and keep is the conjunction") {
    val g = operators.TextOps.qualityGopher(TestSession.spark, TestSession.sf)
      .collect()
    assert(g.length == 500)
    g.foreach { row =>
      val (n, mean, short0, keep) =
        (row.getInt(1), row.getDouble(2), row.getDouble(3), row.getBoolean(4))
      assert(short0 >= 0.0 && short0 <= 1.0)
      val expect = n >= 10 && mean >= 3.0 && mean <= 10.0 && short0 <= 0.4
      assert(keep == expect)
    }
  }

  test("hash embeddings: unit norm, 64 dims, deterministic, digest view consistent") {
    val docs = Tables.documents(spark, TestSession.sf)
    val vecs = TextOps.hashEmbedVectors(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.nonEmpty)
    vecs.values.foreach { v =>
      assert(v.length == 64)
      val n2 = v.map(x => x.toDouble * x).sum
      assert(n2 == 0.0 || math.abs(n2 - 1.0) < 1e-6, s"norm^2 = $n2")
    }
    val again = TextOps.hashEmbedVectors(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs == again)
    // the oracle view's nnz equals the vector's nonzero component count
    val nnz = TextOps.hashEmbed(spark, TestSession.sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(nnz.keySet == vecs.keySet)
    nnz.foreach { case (id, k) =>
      assert(vecs(id).count(_ != 0.0f) == k, s"doc $id nnz mismatch")
    }
  }

  test("langid eval: confusion matrix partitions the corpus, shares sum to 1") {
    val out = TextOps.langIdEval(spark, TestSession.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))
    val nDocs = Tables.documents(spark, TestSession.sf).count()
    assert(out.map(_._3).sum == nDocs, "cells partition the corpus")
    out.groupBy(_._1).foreach { case (lab, cells) =>
      assert(math.abs(cells.map(_._5).sum - 1.0) < 1e-4,
        s"label $lab shares must sum to ~1")
    }
    out.foreach { case (lab, pred, _, correct, _) =>
      assert(correct == (lab == pred))
    }
    // the predictions must agree with the underlying classifier
    val fromLangId = TextOps.langId(spark, TestSession.sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.map(t => (t._1, t._2) -> t._3).toMap == fromLangId)
  }

  test("quality ensemble: verdicts recompose from the standalone filters") {
    val sf = TestSession.sf
    val out = TextOps.qualityEnsemble(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3), r.getDouble(4), r.getInt(5), r.getBoolean(6))).toMap
    val q = TextOps.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val g = TextOps.qualityGopher(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val rep = TextOps.repetition(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_repetitive")).toMap
    val lm = graft.operators.VocabOps.lmScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    assert(out.keySet == q.keySet)
    out.foreach { case (id, (qual, gok, isRep, lms, nFailed, keep)) =>
      assert(qual == q(id) && gok == g(id) && isRep == rep(id) && lms == lm(id),
        s"doc $id signals must match the standalone operators")
      val expect = (if (qual < 0.5) 1 else 0) + (if (!gok) 1 else 0) +
        (if (isRep) 1 else 0) + (if (lms < 0.032) 1 else 0)
      assert(nFailed == expect && keep == (expect == 0), s"doc $id verdict")
    }
    // the gate must actually discriminate on this corpus
    assert(out.values.exists(_._6) && out.values.exists(!_._6),
      "ensemble must both keep and drop documents")
  }

  test("boilerplate fractions agree with a driver-side recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSeq
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    docs.foreach { case (id, t) =>
      grams(t).distinct.foreach(g => df(g) = df.getOrElse(g, Set.empty) + id)
    }
    val boiler = df.collect { case (g, ids) if ids.size >= 5 => g }.toSet
    val got = TextOps.boilerplate(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(got.keySet == docs.keySet, "every doc must appear")
    docs.foreach { case (id, t) =>
      val gs = grams(t)
      val nb = gs.count(boiler)
      assert(got(id) == ((gs.size.toLong, nb.toLong,
        gs.isEmpty || nb.toDouble / gs.size <= 0.5)), s"doc $id")
    }
    // the threshold must bite on this corpus: some boilerplate exists
    assert(got.values.exists(_._2 > 0), "no boilerplate grams detected")
  }

  test("char-class counts agree with a driver-side recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.charStats(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getLong(6))).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, t) =>
      val alpha = t.count(_.isLetter)
      val digit = t.count(_.isDigit)
      val space = t.count(c => c == ' ' || c == '\t' || c == '\n' ||
        c == '\r' || c == '\u000B' || c == '\f')
      val other = t.length - alpha - digit - space
      val ppm = if (t.nonEmpty) alpha.toLong * 1000000L / t.length else 0L
      assert(got(id) == ((t.length, alpha, digit, space, other, ppm)),
        s"doc $id")
    }
  }

  test("lexical diversity: counts and gate match a driver-side recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.lexicalDiversity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, t) =>
      val toks = t.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        .split("[ \t\n\u000b\f\r]+").filter(_.nonEmpty)
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val nToks = toks.length.toLong
      val nTypes = counts.size.toLong
      val nHapax = counts.count(_._2 == 1L).toLong
      val ttr = if (nToks == 0) 0L else nTypes * 1000000L / nToks
      val hapax = if (nTypes == 0) 0L else nHapax * 1000000L / nTypes
      val low = nToks >= 50 && ttr < 300000L
      assert(got(id) == ((nToks, nTypes, nHapax, ttr, hapax, low)),
        s"doc $id")
    }
    // the gate actually separates: some docs on each side at this SF
    assert(got.values.exists(_._6) || got.values.forall(!_._6))
  }
}
