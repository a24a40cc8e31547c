package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AnnOps

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.orderBy("query_id", "rank").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap

  private lazy val exact = asMap(AnnOps.bruteForce(spark, sf))

  test("brute force returns k ranked neighbors per query, no self-matches") {
    val bf = AnnOps.bruteForce(spark, sf)
    assert(bf.count() == 5 * 10)
    assert(bf.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // ranks are 1..10 per query
    val ranks = bf.groupBy("query_id").agg(collect_list("rank")).collect()
    ranks.foreach(r => assert(r.getSeq[Int](1).sorted == (1 to 10)))
  }

  test("lsh results rank true neighbors consistently and recall is reasonable") {
    val got = asMap(AnnOps.lsh(spark, sf))
    assert(got.keySet == exact.keySet)
    val recalls = exact.map { case (q, nbrs) =>
      got(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean lsh recall@10 = $mean")
  }

  test("mips: rank contract holds and recall vs exact inner-product top-k") {
    val got = AnnOps.mips(spark, sf)
    assert(got.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // ranks are a dense prefix 1..n with n <= 10 — NOT exactly 1..10:
    // a query whose LSH buckets are sparse at the test SF can
    // legitimately draw fewer than 10 candidates (round-11 ADVICE);
    // the recall assertion below remains the quality gate
    got.groupBy("query_id").agg(collect_list("rank")).collect()
      .foreach { r =>
        val ranks = r.getSeq[Int](1).sorted
        assert(ranks.nonEmpty && ranks.size <= 10 &&
          ranks == (1 to ranks.size),
          s"query ${r.get(0)}: ranks $ranks not a dense prefix of 1..10")
      }
    // exact MIPS ground truth: brute-force inner product top-10
    val e = graft.Tables.embeddings(spark, sf)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exactMips = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("ip", graft.functions.vector.dot(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("ip").desc, col("vec_id"))))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
    val truth = asMap(exactMips)
    val gotMap = asMap(got)
    assert(gotMap.keySet == truth.keySet)
    val recalls = truth.map { case (q, nbrs) =>
      gotMap(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean mips recall@10 = $mean")
  }

  test("ivf auto-sized (~sqrt N cells) recall is reasonable") {
    val got = asMap(AnnOps.ivf(spark, sf))
    assert(got.keySet == exact.keySet)
    val recalls = exact.map { case (q, nbrs) =>
      got(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean ivf recall@10 = $mean")
  }

  private def queriesDf = {
    val e = Tables.embeddings(spark, sf)
    e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
  }

  test("ivf at explicit (cells=16, probe=4) keeps recall; probe-all is exact") {
    val e = Tables.embeddings(spark, sf)
    val partial = asMap(AnnOps.ivfImpl(e, queriesDf, nCells = 16, nProbe = 4))
    val recalls = exact.map { case (q, nbrs) =>
      partial(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    assert(recalls.sum / recalls.size >= 0.2,
      s"ivf(16,4) recall = ${recalls.sum / recalls.size}")
    // probing EVERY cell degenerates to brute force — results must be
    // identical to the exact baseline, rank for rank
    val full = asMap(AnnOps.ivfImpl(e, queriesDf, nCells = 16, nProbe = 16))
    assert(full == exact, "probe-all IVF must equal brute force exactly")
  }

  test("sampled training regime (trainPerCell bounds the k-means input)") {
    val e = Tables.embeddings(spark, sf)
    // trainPerCell=4 with 16 cells caps training at ~64 of the corpus's
    // vectors — the 100 TB regime where the quantizer NEVER sees the
    // whole corpus. Probe-all must still equal brute force (the search
    // is exhaustive whatever the centroids), and partial probing must
    // still return full result sets with sane recall.
    val full = asMap(AnnOps.ivfImpl(e, queriesDf, nCells = 16, nProbe = 16,
      trainPerCell = 4))
    assert(full == exact, "probe-all IVF must stay exact under sampled training")
    val partial = asMap(AnnOps.ivfImpl(e, queriesDf, nCells = 16, nProbe = 4,
      trainPerCell = 4))
    assert(partial.keySet == exact.keySet)
    assert(partial.values.forall(_.size == 10))
    val recalls = exact.map { case (q, nbrs) =>
      partial(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    assert(recalls.sum / recalls.size >= 0.2,
      s"sampled-training ivf recall = ${recalls.sum / recalls.size}")
  }

  test("pq: shortlist covering the corpus degenerates to brute force; default recall sane") {
    val e = Tables.embeddings(spark, sf)
    // shortlist >= N => the exact re-score covers every vector and the
    // ADC ordering is irrelevant: output must equal brute force
    val full = asMap(AnnOps.pqImpl(e, queriesDf, shortK = 100000))
    assert(full == exact, "pq with corpus-wide shortlist must equal brute force")
    val got = asMap(AnnOps.pq(spark, sf))
    assert(got.keySet == exact.keySet)
    assert(got.values.forall(_.size == 10))
    val recalls = exact.map { case (q, nbrs) =>
      got(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean pq recall@10 = $mean")
  }

  test("ivfpq: probe-all + corpus-wide shortlist is exact; default recall sane") {
    val e = Tables.embeddings(spark, sf)
    // probing every cell makes the candidate set the whole corpus and
    // shortlist >= N makes the exact re-score cover it: brute force
    val full = asMap(AnnOps.ivfpqImpl(e, queriesDf, nCells = 16,
      nProbe = 16, shortK = 100000))
    assert(full == exact, "probe-all ivfpq with corpus shortlist must be exact")
    val got = asMap(AnnOps.ivfpq(spark, sf))
    assert(got.keySet == exact.keySet)
    assert(got.values.forall(_.size == 10))
    val recalls = exact.map { case (q, nbrs) =>
      got(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.15, s"mean ivfpq recall@10 = $mean")
  }

  test("ivfpq residual codes beat raw-vector codes at equal code bytes") {
    val e = Tables.embeddings(spark, sf)
    // probe ALL cells so the candidate set is identical for both
    // encodings — any recall difference is purely ADC code quality
    def recall(residual: Boolean, shortK: Int): Double = {
      val got = asMap(AnnOps.ivfpqImpl(e, queriesDf, nCells = 16,
        nProbe = 16, shortK = shortK, residual = residual))
      val rs = exact.map { case (q, nbrs) =>
        got.getOrElse(q, Nil).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
      }
      rs.sum / rs.size
    }
    // tight shortlist (= K): the ADC ranking IS the answer; and the
    // production shortlist: re-score can only recover what ADC kept
    Seq(10, 50).foreach { shortK =>
      val (raw, res) = (recall(residual = false, shortK),
        recall(residual = true, shortK))
      assert(res >= raw,
        s"residual recall@10 ($res) must be >= raw ($raw) at shortK=$shortK")
    }
  }

  test("knn join: every vector gets k ranked neighbors; recall vs exact top-5") {
    val knn = AnnOps.knnJoin(spark, sf).collect()
    val byVec = knn.groupBy(_.getLong(0))
    val n = Tables.embeddings(spark, sf).count()
    assert(byVec.size == n, "every corpus vector must appear")
    byVec.values.foreach { rows =>
      assert(rows.length <= 5)
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-match")
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.sameElements(1 to rows.length))
    }
    // exact top-5 per vector by brute force on the driver (500×500 ok here)
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val ids = embs.keys.toArray
    val recalls = ids.map { v =>
      val top = ids.filter(_ != v)
        .map(u => (u, cos(embs(v), embs(u))))
        .sortBy { case (u, c) => (-c, u) }.take(5).map(_._1).toSet
      val got = byVec(v).map(_.getLong(1)).toSet
      got.intersect(top).size.toDouble / 5.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.3, s"knn-join mean recall vs exact = $mean")
  }

  test("emb_kmeans: every vector lands in exactly one cluster") {
    val out = AnnOps.kmeansClusters(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == n,
      "cluster sizes must partition the corpus")
    val cells = math.max(4, math.sqrt(n.toDouble).toInt)
    assert(out.length <= cells)
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) < cells))
    assert(out.forall(_.getDouble(3) > 0.0), "centroid norms must be positive")
  }

  test("emb_int8_quantize: codes bounded, reconstruction within half-step") {
    val out = AnnOps.int8Quantize(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length == n)
    out.foreach { r =>
      val head = r.getLong(1); val sum = r.getLong(2); val err = r.getDouble(3)
      assert(head >= 0 && head <= 255)
      assert(sum >= 0 && sum <= 255L * 64)
      assert(err >= 0.0)
    }
    // quantization error per dim is at most half a step = (max-min)/510
    // (+ rounding slack on the 6-dp digest)
    val mm = Tables.embeddings(spark, sf)
      .select(explode(col("embedding")).as("v"))
      .agg(min("v"), max("v")).head()
    val bound = 64.0 * (mm.getFloat(1) - mm.getFloat(0)) / 510.0 + 1e-5
    out.foreach(r => assert(r.getDouble(3) <= bound,
      s"recon_err ${r.getDouble(3)} above half-step bound $bound"))
  }

  test("emb_knn_classify: one majority-vote prediction per query") {
    val out = AnnOps.knnClassify(spark, sf).collect()
    assert(out.length == 50, "one prediction per query vector")
    assert(out.map(_.getLong(0)).distinct.length == 50)
    out.foreach { r =>
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 5, s"votes $votes outside [1, k]")
    }
    // label domain closure: predictions are real labels
    val labels = Tables.embeddings(spark, sf)
      .select("label").distinct().collect().map(_.get(0)).toSet
    assert(out.forall(r => labels.contains(r.get(2))))
    // a 3+-vote majority among 5 exact neighbors of a labeled corpus
    // should recover the query's own label more often than chance
    val majority = out.count(r => r.getLong(3) >= 3)
    assert(majority > 0, "no query had a >=3 vote majority")
  }

  test("sample_diverse: min(k, cluster size) lowest-hash picks per cluster") {
    val out = AnnOps.sampleDiverse(spark, sf).collect()
    val sizes = AnnOps.kmeansClusters(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val byCluster = out.groupBy(_.getInt(0))
    assert(byCluster.keySet == sizes.keySet, "every nonempty cluster sampled")
    byCluster.foreach { case (c, rows) =>
      assert(rows.length == math.min(3L, sizes(c)),
        s"cluster $c: ${rows.length} picks for size ${sizes(c)}")
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length))
    }
    val again = AnnOps.sampleDiverse(spark, sf).collect().map(_.toString).sorted
    assert(again.sameElements(out.map(_.toString).sorted))
  }

  test("label centroids: digests match a driver-side mean recompute") {
    val out = AnnOps.centroidPerLabel(spark, sf).collect()
    assert(out.nonEmpty)
    val embs = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => r.get(0) -> r.getSeq[Float](1).toArray)
    val one = out.head
    val label = one.get(0)
    val vecs = embs.filter(_._1 == label).map(_._2)
    assert(one.getLong(1) == vecs.length)
    val dim0 = vecs.map(_(0).toDouble).sorted.sum / vecs.length
    assert(math.abs(one.getDouble(2) - dim0) < 1e-5,
      s"centroid head ${one.getDouble(2)} vs recomputed $dim0")
  }

  test("dim stats: one row per dimension, agrees with a driver recount") {
    val out = AnnOps.dimStats(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getFloat(2), r.getFloat(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    assert(out.keySet == (0 until 64).toSet)
    Seq(0, 31, 63).foreach { dim =>
      val vs = vecs.map(_(dim))
      val qs = vs.map(v => math.round(v.toDouble * 1e6))
      val (n, mn, mx, mean, variance) = out(dim)
      assert(n == vs.length.toLong)
      assert(mn == vs.min && mx == vs.max)
      val wantMean = qs.sum.toDouble / 1e6 / n
      assert(math.abs(mean - wantMean) < 1e-6, s"dim $dim mean")
      val sq = qs.sum; val sq2 = qs.map(q => q * q).sum
      val wantVar = (sq2.toDouble * n - sq.toDouble * sq.toDouble) / n / n / 1e12
      assert(math.abs(variance - wantVar) < 1e-6, s"dim $dim variance")
      assert(variance >= 0.0, "variance can't be negative")
    }
  }

  test("covariance: symmetric PSD-consistent matrix; power iteration finds PC1") {
    val rows = AnnOps.covariance(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(4))).toMap
    val dim = 64
    assert(rows.size == dim * (dim + 1) / 2, "upper triangle complete")
    // diagonal entries are variances — must be non-negative and agree
    // with emb_dim_stats' variance column
    val variances = AnnOps.dimStats(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(5)).toMap
    (0 until dim).foreach { i =>
      assert(rows((i, i)) >= 0.0, s"var($i) >= 0")
      assert(math.abs(rows((i, i)) - variances(i)) <= 1e-6, s"var($i) matches dim stats")
    }
    // driver-side power iteration on the collected matrix: the
    // dominant eigenvalue must dominate every single-dim variance,
    // and the residual ||Cv - lambda v|| must be tiny
    val c = Array.tabulate(dim, dim)((i, j) =>
      if (i <= j) rows((i, j)) else rows((j, i)))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    (1 to 300).foreach { _ =>
      val y = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val norm = math.sqrt(y.map(x => x * x).sum)
      v = y.map(_ / norm)
      lambda = norm
    }
    assert(lambda >= variances.values.max - 1e-9,
      "dominant eigenvalue >= max per-dim variance")
    // each cov entry is rounded to 1e-6, so the matrix carries an
    // O(sqrt(d)*5e-7) perturbation — the residual floor is ~1e-4,
    // independent of iteration count
    val resid = math.sqrt(Array.tabulate(dim) { i =>
      val cv = (0 until dim).map(j => c(i)(j) * v(j)).sum
      val r0 = cv - lambda * v(i)
      r0 * r0
    }.sum)
    assert(resid <= 5e-4, s"power iteration converged (resid $resid)")
  }

  test("standardize: z-scored dims have ~0 mean and ~unit variance") {
    val rows = AnnOps.standardizeVectors(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val n = rows.length
    assert(rows.forall(_._2.length == 64), "64 z-dims per vector")
    val variances = AnnOps.dimStats(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(5)).toMap
    (0 until 64).foreach { dim =>
      val zs = rows.map(_._2(dim))
      val mean = zs.sum / n
      val varz = zs.map(z => (z - mean) * (z - mean)).sum / n
      if (variances(dim) > 0) {
        // stats are 6-dp rounded, so mean/variance land near, not at,
        // the ideal 0/1
        assert(math.abs(mean) <= 1e-3, s"dim $dim mean $mean")
        assert(math.abs(varz - 1.0) <= 1e-2, s"dim $dim variance $varz")
      } else {
        assert(zs.forall(_ == 0.0), s"dead dim $dim maps to 0")
      }
    }
  }

  test("range search: exactly the tau-neighbors within probed cells") {
    import graft.functions.vector
    val got = AnnOps.rangeSearch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every reported neighbor clears the threshold (post-round check
    // with a 6-dp guard band)
    AnnOps.rangeSearch(spark, sf).collect()
      .foreach(r => assert(r.getDouble(2) >= 0.3 - 5e-7))
    // result is a subset of the exact radius set (no false positives)
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exactRadius = e.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", vector.cosine(col("embedding"), col("q_emb")))
      .filter(col("cos") >= 0.3)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exactRadius))
    // ...and the top-1 exact neighbor that clears tau is found when
    // IVF's top-k finds it too (same probed cells)
    val ivfPairs = AnnOps.ivf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfAboveTau = AnnOps.ivf(spark, sf)
      .filter(col("cosine") >= 0.3 + 5e-7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAboveTau.subsetOf(got))
    assert(ivfPairs.nonEmpty)
  }

  test("recall eval: agrees with a direct intersection recount") {
    val rows = AnnOps.recallEval(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == exact.keySet)
    val ivfGot = asMap(AnnOps.ivf(spark, sf))
    rows.foreach { r =>
      val (q, nHit, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val want = exact(q).toSet.intersect(ivfGot(q).toSet).size.toLong
      assert(nHit == want, s"query $q")
      assert(ppm == nHit * 1000000L / 10)
      assert(nHit >= 0 && nHit <= 10)
    }
  }

  test("pca: eigenpair matches an exact driver-side recount") {
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = 64
    val n = embs.length.toLong
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // replicate the operator's exact-integer covariance (1e-6
    // quantization, floor-quantized like covarianceQ — the pca input)
    // independently of its Spark plan
    val q = embs.map { case (_, v) => v.map(x => math.round(x * 1e6)) }
    val m = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      var sqq = 0L; var si = 0L; var sj = 0L
      q.foreach { qv => sqq += qv(i) * qv(j); si += qv(i); sj += qv(j) }
      val c = math.floor((sqq.toDouble * n.toDouble - si.toDouble * sj.toDouble)
        / n.toDouble / n.toDouble / 1e12 * 1e6) / 1e6
      m(i)(j) = c; m(j)(i) = c
    }
    val (v, lambda) = graft.operators.AnnOps.powerIterate(m)
    val got = graft.operators.AnnOps.pca(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == embs.map(_._1).toSet)
    assert(got.values.map(_._2).toSet == Set(round6(lambda)),
      "eigenvalue must match the recount exactly")
    embs.take(50).foreach { case (id, e) =>
      var acc = 0.0
      var i = 0
      while (i < dim) { acc = acc + e(i) * v(i); i += 1 }
      assert(math.abs(got(id)._1 - round6(acc)) < 1e-9, s"vec $id pc1")
    }
    // the Rayleigh quotient is a genuine eigen-estimate: it must
    // dominate every single-dimension variance and stay under the
    // trace (total variance)
    val diag = (0 until dim).map(i => m(i)(i))
    assert(lambda >= diag.max - 1e-9)
    assert(lambda <= diag.sum + 1e-9)
    // v is unit up to fp rounding
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("outliers: distances and flags agree with a driver-side recount") {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val byLabel = embs.groupBy(_._3)
    val centroids = byLabel.map { case (l, g) =>
      l -> (0 until 64).map { dim =>
        val sq = g.map(t => math.round(t._2(dim) * 1e6)).sum
        sq.toDouble / 1e6 / g.size
      }.toArray
    }
    val dists = embs.map { case (id, e, l) =>
      val m = centroids(l)
      var acc = 0.0
      var i = 0
      while (i < 64) { acc = acc + (e(i) - m(i)) * (e(i) - m(i)); i += 1 }
      (id, l, math.sqrt(acc))
    }
    val thresh = dists.groupBy(_._2).map { case (l, g) =>
      val dq = g.map(t => math.floor(t._3 * 1e6).toLong)
      val (n, sd) = (dq.length.toDouble, dq.sum.toDouble)
      val sd2 = dq.map(x => x * x).sum.toDouble
      l -> (sd / n / 1e6
        + 2.0 * math.sqrt((sd2 * n - sd * sd) / n / n / 1e12))
    }
    val got = graft.operators.AnnOps.outliers(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got.keySet == embs.map(_._1).toSet)
    dists.foreach { case (id, l, raw) =>
      val (gd, gt, gf) = got(id)
      assert(math.abs(gd - math.floor(raw * 1e6) / 1e6) < 1e-9, s"vec $id dist")
      assert(math.abs(gt - math.floor(thresh(l) * 1e6) / 1e6) < 1e-9,
        s"label $l thresh")
      assert(gf == (raw > thresh(l)), s"vec $id flag")
    }
    // 2-sigma must flag a small minority, not nothing and not half
    val frac = got.values.count(_._3).toDouble / got.size
    assert(frac > 0 && frac < 0.2, s"outlier fraction $frac")
  }

  test("cell stats reconcile with the corpus and stay internally consistent") {
    val row = graft.operators.AnnOps.cellStats(spark, sf).collect().head
    val (nc, nv, mn, mx, avg100, imb) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(nv == Tables.embeddings(spark, sf).count(), "every vector assigned")
    assert(mn >= 1 && mn <= mx && mx <= nv)
    assert(avg100 == nv * 100L / nc)
    assert(imb == mx * nc * 1000000L / nv)
    assert(imb >= 1000000L, "max cell is at least the average")
  }

  test("clip stats agree with a driver-side recount") {
    val embs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val n = embs.length
    val got = graft.operators.AnnOps.clipStats(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == (0 until 64).toSet)
    (0 until 64).foreach { dim =>
      val vs = embs.map(_(dim))
      val q = vs.map(v => math.round(v.toDouble * 1e6))
      val (sq, sq2) = (q.sum.toDouble, q.map(x => x * x).sum.toDouble)
      val mean = sq / 1e6 / n
      val sigma = math.sqrt((sq2 * n - sq * sq) / n.toDouble / n / 1e12)
      val (lo, hi) = (mean - 3.0 * sigma, mean + 3.0 * sigma)
      val (gn, gl, gh, glb, ghb) = got(dim)
      assert(gn == n)
      assert(gl == vs.count(_.toDouble < lo).toLong, s"dim $dim lo")
      assert(gh == vs.count(_.toDouble > hi).toLong, s"dim $dim hi")
      assert(math.abs(glb - math.floor(lo * 1e6) / 1e6) < 1e-9)
      assert(math.abs(ghb - math.floor(hi * 1e6) / 1e6) < 1e-9)
      // 3-sigma tails of anything vaguely bell-shaped are small
      assert((gl + gh).toDouble / n < 0.05, s"dim $dim tail mass")
    }
  }

  test("hard negatives: cross-label top-k agrees with a brute recount") {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += (a(i) * b(i)).toDouble
        na += (a(i) * a(i)).toDouble; nb += (b(i) * b(i)).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = graft.operators.AnnOps.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))
    val byQ = got.groupBy(_._1)
    embs.filter(_._1 < 5).foreach { case (qid, qe, ql) =>
      val want = embs
        .filter(t => t._1 != qid && t._3 != ql)
        .map(t => (t._1, cos(qe, t._2)))
        .sortBy { case (id, c) => (-c, id) }.take(10)
      val rows = byQ(qid).sortBy(_._5)
      assert(rows.map(_._3).toSeq == want.map(_._1).toSeq, s"query $qid ids")
      rows.foreach { case (_, gql, _, nl, _, _) =>
        assert(gql == ql && nl != ql, s"query $qid labels")
      }
      rows.map(_._6).zip(want.map(_._2)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-5, s"query $qid cosine")
      }
    }
  }

  test("sq8 search: structural contract + near-exact recall after re-rank") {
    val got = AnnOps.sq8Search(spark, sf)
    assert(got.count() == 5 * 10)
    assert(got.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val ranks = got.groupBy("query_id").agg(collect_list("rank")).collect()
    ranks.foreach(r => assert(r.getSeq[Int](1).sorted == (1 to 10)))
    // 8-bit/dim quantization + a 50-deep exact re-rank: the ADC
    // shortlist should almost never lose a true top-10 neighbor
    val gotMap = asMap(got)
    val recalls = exact.map { case (q, nbrs) =>
      gotMap(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean sq8 recall@10 = $mean")
  }

  test("filtered search: every hit carries the query's label and " +
    "matches a label-restricted recount within probed cells") {
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = AnnOps.filteredSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, n, _) =>
      assert(labels(n) == labels(q), s"query $q neighbor $n label")
      assert(q != n)
    }
    // per query: ranked 1..k prefix, k ≤ 10
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"query $q")
      assert(rows.length <= 10)
    }
    // pre-filtering can only help: the filtered result holds at least
    // as many same-label true neighbors as the unfiltered IVF result
    val sameLabelExact = exact.map { case (q, _) => q ->
      AnnSpecHelpers.bruteSameLabel(spark, sf, q, labels) }
    val ivfGot = asMap(AnnOps.ivf(spark, sf))
    got.groupBy(_._1).foreach { case (q, rows) =>
      val hits = rows.map(_._2).toSet.intersect(sameLabelExact(q))
      val ivfHits = ivfGot(q).toSet.intersect(sameLabelExact(q))
      assert(hits.size >= ivfHits.size, s"query $q filtered < post-filter")
    }
  }

  test("binary search: structural contract + sign-bit recall in range") {
    val got = AnnOps.binarySearch(spark, sf)
    assert(got.count() == 5 * 10)
    assert(got.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val ranks = got.groupBy("query_id").agg(collect_list("rank")).collect()
    ranks.foreach(r => assert(r.getSeq[Int](1).sorted == (1 to 10)))
    // 64 sign bits + a 50-deep exact re-rank: lossier than SQ8 by
    // design (8 B vs 64 B per vector) but far better than chance —
    // measured 0.68 at sf0.001, pin a margin below
    val gotMap = asMap(got)
    val recalls = exact.map { case (q, nbrs) =>
      gotMap(q).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean binary recall@10 = $mean")
  }

  test("matryoshka eval: full-dim row is exact; shapes and ppm consistent") {
    val rows = AnnOps.matryoshkaEval(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 4 * 5)
    assert(rows.map(_._1).toSet == Set(8, 16, 32, 64))
    rows.foreach { case (dim, q, nHit, ppm) =>
      assert(nHit >= 0 && nHit <= 10, s"dim $dim query $q")
      assert(ppm == nHit * 1000000L / 10, s"dim $dim query $q ppm")
    }
    // prefix = full vector at d=64 → identical ranking → recall 100%
    rows.filter(_._1 == 64).foreach { case (_, q, nHit, _) =>
      assert(nHit == 10, s"query $q full-dim recall")
    }
  }

  test("probe curve: monotone in budget, agrees with recall_eval at its probe") {
    val curve = AnnOps.probeCurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1, 2, 4, 8))
    // a bigger probe budget scans a superset of cells, so pooled
    // recall can never decrease
    assert(curve.map(_._2).toSeq == curve.map(_._2).sorted.toSeq,
      s"recall must be monotone in probe budget: $curve")
    // consistency: the curve's n_probe=4 row must pool exactly what
    // ann_recall_eval (nProbe=4) reports per query
    val evalHits = AnnOps.recallEval(spark, sf).collect()
      .map(_.getLong(1)).sum
    val at4 = curve.find(_._1 == 4).get
    assert(at4._2 == evalHits,
      s"curve@4 (${at4._2}) must equal pooled recall_eval ($evalHits)")
    // ppm arithmetic is exact: hits * 1e6 div (Q*K)
    val truth = 50L // 5 queries x K=10 ground-truth pairs
    curve.foreach { case (_, h, ppm) => assert(ppm == h * 1000000L / truth) }
  }

  test("semantic dedup: keeper discipline, cell-local dups, cosine >= tau") {
    val rows = AnnOps.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n, "one verdict row per corpus vector")
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (vid, cell, dupOf, kept) =>
      assert(kept == (dupOf == -1L), s"vec $vid kept/dup_of disagree")
      if (dupOf >= 0) {
        assert(dupOf < vid, s"vec $vid dups to a LARGER id $dupOf")
        assert(cellOf(dupOf) == cell,
          s"vec $vid dups across cells ${cellOf(dupOf)} != $cell")
      }
    }
    // the min-id vector of every cell can never be anyone's vec_b
    // duplicate target's superior... i.e. it is always kept
    rows.groupBy(_._2).values.foreach { cell =>
      val minId = cell.map(_._1).min
      assert(cell.find(_._1 == minId).get._4, s"cell min id $minId removed")
    }
    // every recorded dup pair really clears the cosine threshold
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(_._3 >= 0).foreach { case (vid, _, dupOf, _) =>
      assert(cos(embs(vid), embs(dupOf)) >= 0.4 - 1e-9,
        s"dup pair ($dupOf, $vid) below tau")
    }
  }
}

private object AnnSpecHelpers {
  /** Exact same-label top-10 of a query, driver-side. */
  def bruteSameLabel(spark: org.apache.spark.sql.SparkSession, sf: String,
                     qid: Long, labels: Map[Long, Int]): Set[Long] = {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += (a(i) * b(i)).toDouble
        na += (a(i) * a(i)).toDouble; nb += (b(i) * b(i)).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qe = embs(qid)
    embs.keys.filter(id => id != qid && labels(id) == labels(qid)).toSeq
      .map(id => (id, cos(qe, embs(id))))
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
  }
}
