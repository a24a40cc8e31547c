package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("stratified sample takes at most k per language, deterministically") {
    val s1 = PipelineOps.sampleStratified(spark, sf)
    val perLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ <= 50))
    // every stratum with >= 50 docs is sampled at exactly 50
    val langSizes = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    langSizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0L) == math.min(n, 50L), s"lang $lang")
    }
    // deterministic: a second run returns the identical id set
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = PipelineOps.sampleStratified(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("pack_shards fills contiguous token-budget shards per language") {
    val shards = PipelineOps.packShards(spark, sf)
    // every doc assigned; shard ids are dense non-negative per lang
    assert(shards.count() == Tables.documents(spark, sf).count())
    assert(shards.filter(col("shard_id") < 0).count() == 0)
    // budget: a shard's tokens stay under target + its largest doc
    // (greedy packing overshoots by at most the doc that closed it)
    val over = shards.groupBy("lang", "shard_id")
      .agg(sum("n_tok").as("tok"), max("n_tok").as("biggest"))
      .filter(col("tok") > lit(2000) + col("biggest"))
    assert(over.count() == 0, "a shard exceeds target + closing doc")
    // contiguity: within a lang, shard_id is monotone in doc_id
    val rows = shards.orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(1), r.getLong(3)))
    rows.sliding(2).foreach {
      case Array((l1, s1v), (l2, s2v)) =>
        if (l1 == l2) assert(s2v >= s1v, s"shard regressed within $l1")
      case _ =>
    }
  }

  test("mixture sample respects per-source quotas and is deterministic") {
    val m1 = PipelineOps.sampleMixture(spark, sf).collect()
    val bySrc = m1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // quotas 50/30/20 capped by the 25 docs each source holds at sf0.001
    assert(bySrc.keySet.subsetOf(Set("src0", "src1", "src2")))
    assert(bySrc.getOrElse("src0", 0) <= 50 && bySrc.getOrElse("src1", 0) <= 30 &&
      bySrc.getOrElse("src2", 0) <= 20)
    assert(bySrc.getOrElse("src2", 0) == 20, "src2 has 25 docs; quota 20 must fill")
    val m2 = PipelineOps.sampleMixture(spark, sf).collect()
    assert(m1.map(_.toString).sorted.sameElements(m2.map(_.toString).sorted))
  }

  test("temperature sample hits integer quotas and flattens lang shares") {
    val t1 = PipelineOps.sampleTemperature(spark, sf).collect()
    val langSizes = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute the integer quota arithmetic independently
    val wt = langSizes.view.mapValues(n => math.sqrt(n.toDouble).floor.toLong).toMap
    val tot = wt.values.sum
    val quota = wt.view.mapValues(w => 120L * w / tot).toMap
    val got = t1.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    langSizes.keys.foreach { lang =>
      assert(got.getOrElse(lang, 0L) == math.min(quota(lang), langSizes(lang)),
        s"lang $lang: got ${got.getOrElse(lang, 0L)}, quota ${quota(lang)}")
    }
    // sqrt temperature flattens: smallest lang's quota share >= its raw share
    val (loLang, loN) = langSizes.minBy(_._2)
    val total = langSizes.values.sum
    assert(quota(loLang).toDouble / 120 >= loN.toDouble / total - 1.0 / 120,
      s"low-resource lang $loLang must not be down-weighted by temperature")
    // deterministic
    val t2 = PipelineOps.sampleTemperature(spark, sf).collect()
    assert(t1.map(_.toString).sorted.sameElements(t2.map(_.toString).sorted))
  }

  test("chunking covers every doc, respects size/stride arithmetic") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val chunks = PipelineOps.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        asize(graft.functions.text.tokens(col("text"))).as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.map(_._1).toSet == docs.keySet, "every doc chunks")
    val byDoc = chunks.groupBy(_._1)
    byDoc.foreach { case (id, cs) =>
      val n = docs(id)
      val expected = 1 + (math.max(n - 64, 0) + 47) / 48
      assert(cs.length == expected, s"doc $id chunk count")
      assert(cs.map(_._2).sorted.toSeq == (0L until expected.toLong),
        s"doc $id chunk ids dense")
      cs.foreach { case (_, cid, ct) =>
        val start = cid * 48
        val want = math.max(0, math.min(64, n - start))
        assert(ct == want, s"doc $id chunk $cid token count $ct != $want")
      }
    }
  }

  test("weighted sample: k rows, bounded weights, deterministic, length-biased") {
    val s1 = PipelineOps.sampleWeighted(spark, sf).collect()
    assert(s1.length == 100)
    s1.foreach { r =>
      val w = r.getLong(2)
      assert(w >= 1 && w <= 16, s"weight out of range: $w")
    }
    val s2 = PipelineOps.sampleWeighted(spark, sf).collect()
    assert(s1.map(_.toString).sameElements(s2.map(_.toString)))
    // selection must skew toward heavier docs: the sampled mean weight
    // exceeds the corpus mean (each extra unit of weight is an extra
    // independent chance at a low priority)
    val sampledMean = s1.map(_.getLong(2)).sum.toDouble / s1.length
    val corpusMean = Tables.documents(spark, sf)
      .select((least(floor(col("n_chars") / lit(400.0)), lit(15))
        .cast("long") + lit(1L)).as("w"))
      .agg(avg("w")).head().getDouble(0)
    assert(sampledMean > corpusMean,
      s"sampled mean weight $sampledMean not above corpus mean $corpusMean")
  }

  test("corpus_shuffle is a deterministic permutation in hash order") {
    val out = PipelineOps.corpusShuffle(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.length == n)
    // (shard, pos_in_shard) is a bijection onto [0, n)
    val pos = out.map(r => r.getInt(2).toLong * 100 + r.getInt(3)).sorted
    assert(pos.sameElements(0L until n), "positions must be 0..n-1 exactly once")
    // global order equals sort by (h, doc_id) — the declared contract
    val byPos = out.sortBy(r => (r.getInt(2), r.getInt(3)))
      .map(r => (r.getLong(1), r.getLong(0)))
    assert(byPos.sameElements(byPos.sorted),
      "shard/pos order must equal (hash, doc_id) order")
    // deterministic across evaluations
    val again = PipelineOps.corpusShuffle(spark, sf).collect()
      .map(_.toString).sorted
    assert(again.sameElements(out.map(_.toString).sorted))
  }

  test("token budget keeps exactly the hash-order prefix within budget") {
    val rows = PipelineOps.tokenBudget(spark, sf).collect()
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.text.tokens(col("text"))).cast("long").as("n_tok"),
        graft.functions.ihash.quad(col("doc_id")).as("h"))
      .orderBy("h", "doc_id").collect()
    val budget = naive.map(_.getLong(1)).sum / 3
    var cum = 0L
    val expect = scala.collection.mutable.LinkedHashMap[Long, Long]()
    naive.foreach { r =>
      if (cum < budget) { cum += r.getLong(1); expect(r.getLong(0)) = cum }
    }
    assert(rows.length == expect.size && expect.nonEmpty)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) == r.getLong(3),
        s"doc ${r.getLong(0)}: cumulative token count diverges") }
  }

  test("bernoulli sample: keep decision is the hash rule, weights invert rates") {
    val out = PipelineOps.sampleBernoulli(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    val rates = Map("en" -> 125000L, "es" -> 250000L, "fr" -> 500000L,
      "zh" -> 750000L, "de" -> 1000000L)
    out.foreach { case (_, lang, ppm, w) =>
      assert(ppm == rates(lang))
      assert(w == 1000000.0 / ppm, "Horvitz-Thompson weight inverts the rate")
    }
    // de keeps EVERYTHING (rate 1e6); en keeps a strict subset
    val docs = Tables.documents(spark, TestSession.sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy(_._2).view.mapValues(_.length.toLong)
    assert(kept("de") == docs("de"), "rate 1e6 must keep every doc")
    assert(kept("en") < docs("en"), "rate 1/8 must downsample")
    // determinism: a second evaluation keeps the identical set
    val again = PipelineOps.sampleBernoulli(spark, TestSession.sf).collect()
      .map(_.getLong(0)).sorted
    assert(again.sameElements(out.map(_._1).sorted))
  }

  test("epoch upsampling: copies match the quality tier, tokens carried") {
    val out = PipelineOps.sampleEpochs(spark, sf).collect()
    val quality = graft.operators.TextOps.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(4), r.getInt(1))).toMap
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == quality.keySet, "every doc appears")
    byDoc.foreach { case (id, rows) =>
      val (q, nTok) = quality(id)
      val wantEpochs = if (q >= 0.75) 3 else if (q >= 0.5) 2 else 1
      assert(rows.length == wantEpochs, s"doc $id q=$q")
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to wantEpochs))
      rows.foreach { r =>
        assert(r.getInt(1) == wantEpochs)
        assert(r.getInt(3) == nTok)
      }
    }
  }
}
