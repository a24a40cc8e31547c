package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, DedupOps}

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = TestSession.sf

  test("clusters equal a driver-side union-find over the same pairs") {
    val pairs = DedupOps.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    // reference union-find
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = docs.map(x => x -> find(x)).toMap
    val got = CorpusOps.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("distributed path converges on a diameter-299 chain (pointer doubling)") {
    // a path 1-2-...-300 has diameter 299: plain neighbor-min
    // propagation would need 299 rounds (far beyond any sane cap);
    // the pointer-doubling step must close it in ~O(log n) rounds
    // (driverMaxEdges=0 disables the driver union-find fast path)
    val docs = (1L to 302L).toDF("doc_id") // 301,302 isolated
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = CorpusOps.clustersFromPairs(docs, pairs, driverMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 300L).forall(got(_) == 1L))
    assert(got(301L) == 301L && got(302L) == 302L)
  }

  test("driver union-find survives a 100k-edge path graph (iterative find)") {
    // edges arrive in DESCENDING order, which builds a ~100k-deep
    // parent chain; the label-extraction pass then walks it from the
    // far end — the old recursive find overflowed the stack exactly
    // here, well under the 1M-edge fast-path threshold
    val n = 100000L
    val docs = spark.range(n + 1).toDF("doc_id")
    val pairs = spark.range(n)
      .select((lit(n - 1) - col("id")).as("doc_a"), (lit(n) - col("id")).as("doc_b"))
    val got = CorpusOps.clustersFromPairs(docs, pairs).collect()
    assert(got.length == n + 1)
    assert(got.forall(_.getLong(1) == 0L), "all nodes must collapse to cluster 0")
  }

  test("source overlap agrees with a driver-side shingle-set recount") {
    val got = CorpusOps.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // join output puts the USING key first: columns are (sh, doc_id)
    val sets = DedupOps.shingleSets(spark, sf).collect()
      .map(r => (srcOf(r.getLong(1)), r.getString(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val srcs = sets.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      val common = (sets(a) & sets(b)).size.toLong
      got.get((a, b)) match {
        case Some((c, na, nb, ppm)) =>
          assert(c == common, s"($a,$b) common")
          assert(na == sets(a).size.toLong && nb == sets(b).size.toLong)
          assert(ppm == 1000000L * common / (na + nb - common), s"($a,$b) ppm")
        case None => assert(common == 0L, s"($a,$b) missing but overlaps")
      }
    }
  }

  test("soft dedup weights are exact ppm reciprocals of cluster sizes") {
    val rows = CorpusOps.softDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every document appears exactly once
    val docs = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == docs && rows.length == docs.size)
    // cluster sizes and weights reconcile with the cluster relation
    val sizes = CorpusOps.clusters(spark, sf).collect()
      .map(_.getLong(1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (docId, cid, size, ppm) =>
      assert(size == sizes(cid), s"doc $docId cluster size")
      assert(ppm == 1000000L / size, s"doc $docId weight")
    }
    // each cluster contributes ~one document's worth of mass:
    // size * (10^6 div size) is within one truncation of 10^6
    sizes.foreach { case (cid, size) =>
      val mass = size * (1000000L / size)
      assert(mass > 1000000L - size && mass <= 1000000L, s"cluster $cid mass")
    }
  }

  test("clean corpus keeps one representative per cluster and passes quality") {
    val cc = CorpusOps.cleanCorpus(spark, sf)
    val n = cc.count()
    assert(n > 0 && n <= Tables.documents(spark, sf).count())
    assert(cc.filter(col("quality") < 0.5).count() == 0)
    // representatives only: doc_id == cluster_id is implied by keep
    val dupPairs = DedupOps.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = cc.select("doc_id").collect().map(_.getLong(0)).toSet
    dupPairs.foreach { case (a, b) =>
      assert(!(kept.contains(a) && kept.contains(b)),
        s"near-dup pair ($a,$b) both kept")
    }
  }

  test("corpus stats reconcile with direct counts") {
    val st = CorpusOps.corpusStats(spark, TestSession.sf).collect()
    val docs = Tables.documents(spark, TestSession.sf)
    assert(st.map(_.getLong(1)).sum == docs.count())
    st.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getDouble(4) > 0, "mean_tokens positive")
      assert(r.getLong(6) <= r.getLong(7), "min_chars <= max_chars")
    }
    val one = st.head
    val direct = docs.filter(col("source") === one.getString(0)).count()
    assert(direct == one.getLong(1))
  }

  test("assemble_corpus: clean_corpus rows, shuffled into dense shards") {
    val out = CorpusOps.assembleCorpus(spark, sf).collect()
    val clean = CorpusOps.cleanCorpus(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == clean,
      "assembled manifest must carry exactly the clean corpus")
    // (shard, pos) is a dense 0-based enumeration
    val pos = out.map(r => r.getInt(4).toLong * 100 + r.getInt(5)).sorted
    assert(pos.sameElements(0L until out.length.toLong))
    // deterministic across evaluations
    val again = CorpusOps.assembleCorpus(spark, sf).collect()
      .map(_.toString).sorted
    assert(again.sameElements(out.map(_.toString).sorted))
  }

  test("train/test split: near-dup clusters never straddle the boundary") {
    val out = CorpusOps.trainTestSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.length == Tables.documents(spark, sf).count().toInt,
      "every document gets exactly one split assignment")
    // THE leakage invariant: all members of a cluster share one split
    out.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cid straddles splits: ${members.map(_._3).distinct}")
    }
    val bySplit = out.groupBy(_._3).view.mapValues(_.length)
    assert(bySplit.keys.toSet.subsetOf(Set("train", "validation", "test")))
    assert(bySplit.getOrElse("train", 0) > out.length / 2,
      "the 80% bucket range must dominate")
    // deterministic across evaluations
    val again = CorpusOps.trainTestSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(again.sorted.sameElements(out.sorted))
  }

  test("balance chi2 matches a driver-side contingency recomputation") {
    val row = CorpusOps.balanceChi2(spark, sf).collect().head
    val cells = Tables.documents(spark, sf).groupBy("lang", "source").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val langs = cells.keys.map(_._1).toSeq.distinct.sorted
    val srcs = cells.keys.map(_._2).toSeq.distinct.sorted
    val n = cells.values.sum
    val rT = langs.map(l => l -> cells.filter(_._1._1 == l).values.sum).toMap
    val cT = srcs.map(c => c -> cells.filter(_._1._2 == c).values.sum).toMap
    val chi2ppb = (for { l <- langs; c <- srcs } yield {
      val o = cells.getOrElse((l, c), 0L)
      val num = (o * n - rT(l) * cT(c)).toDouble
      math.round(num * num / (n * rT(l) * cT(c)).toDouble * 1e9)
    }).sum
    assert(row.getAs[Long]("chi2_ppb") == chi2ppb)
    assert(row.getAs[Int]("dof") == (langs.size - 1) * (srcs.size - 1))
    assert(row.getAs[Long]("n_docs") == n)
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("cross-source matrix agrees with a driver-side recount") {
    val out = CorpusOps.crossSource(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val srcByDoc = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byCluster = CorpusOps.clusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster_id"), srcByDoc(r.getAs[Long]("doc_id"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val want = byCluster.values.toSeq
      .flatMap(ss => ss.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out == want)
    out.keys.foreach { case (a, b) => assert(a < b, "canonical pair order") }
  }

  test("diversity indices agree with a driver-side recount") {
    val langsBySrc = Tables.documents(spark, sf).select("source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = CorpusOps.diversity(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == langsBySrc.keySet)
    langsBySrc.foreach { case (src, langs) =>
      val n = langs.size.toDouble
      val sc2 = langs.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      val simpson = 1.0 - sc2 / (n * n)
      val (gn, gl, gs, ge) = got(src)
      assert(gn == langs.size && gl == langs.distinct.size)
      assert(math.abs(gs - simpson) < 1e-5, s"$src simpson")
      assert(math.abs(ge - n * n / sc2) < 1e-4, s"$src effective langs")
      assert(gs >= 0 && gs < 1 && ge >= 1 && ge <= gl)
    }
  }

  test("length histogram reconciles with a driver-side recount") {
    val docs = Tables.documents(spark, sf).select("source", "n_chars")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) 0L else r.getLong(1)))
    val want = docs.groupBy { case (s0, n) => (s0, (n / 100).toInt) }
      .view.mapValues(_.size.toLong).toMap
    val got = CorpusOps.lengthHist(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == want.keySet)
    val bySrc = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    got.foreach { case ((s0, b), (lo, n, ppm)) =>
      assert(lo == b * 100, s"$s0/$b bound")
      assert(n == want((s0, b)), s"$s0/$b count")
      assert(ppm == n * 1000000L / bySrc(s0), s"$s0/$b share")
    }
    // per-source shares recompose the whole source
    got.keys.map(_._1).toSeq.distinct.foreach { s0 =>
      assert(got.collect { case ((`s0`, _), v) => v._2 }.sum == bySrc(s0))
    }
  }

  test("contamination stats recompose from the per-doc decontaminate view") {
    val srcByDoc = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dec = CorpusOps.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Boolean]("is_benchmark"),
        r.getAs[Boolean]("is_contaminated")))
      .filter(!_._2)
    val want = dec.groupBy(t => srcByDoc(t._1)).view.mapValues { g =>
      (g.size.toLong, g.count(_._3).toLong)
    }.toMap
    val got = CorpusOps.contaminationStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (s0, (n, c, ppm)) =>
      assert((n, c) == want(s0), s"source $s0")
      assert(ppm == c * 1000000L / n, s"source $s0 share")
    }
  }

  test("dedup cascade: stages partition, attribution defers to smaller ids, " +
      "first-hit precedence recomposes from the stage operators") {
    val rows = CorpusOps.dedupCascade(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 500, "one verdict per document")
    rows.foreach { case (id, st, keep) =>
      if (st == "unique") assert(keep == -1L, s"doc $id unique keep")
      else assert(keep >= 0 && keep < id,
        s"doc $id ($st) must defer to a smaller id, got $keep")
    }
    // recompose precedence from the three stage operators directly
    val nearKeep = CorpusOps.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val semKeep = graft.operators.AnnOps.semanticDedup(spark, sf).collect()
      .filter(!_.getBoolean(3)).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("[ \t\n\u000B\f\r]+")
          .filter(_.nonEmpty).mkString(" ")))
    val exKeep = texts.groupBy(_._2).values
      .flatMap { g =>
        val m = g.map(_._1).min
        g.map(_._1).filter(_ > m).map(_ -> m)
      }.toMap
    rows.foreach { case (id, st, keep) =>
      val want =
        if (exKeep.contains(id)) ("exact", exKeep(id))
        else if (nearKeep.get(id).exists(_ < id)) ("near", nearKeep(id))
        else if (semKeep.contains(id)) ("semantic", semKeep(id))
        else ("unique", -1L)
      assert((st, keep) == want, s"doc $id: got ($st,$keep) want $want")
    }
  }
}
