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

  test("incremental dedup: exact layer recounted, near layer consistent " +
       "with the all-pairs operator") {
    val docs = Tables.documents(spark, sf)
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    def isBatch(id: Long) = id * 10 > mx * 9
    val rows = DedupOps.incrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == allIds.filter(isBatch),
      "one verdict per batch doc, batch = top decile by id")
    // exact layer: recount with the operator's own normalization
    val norm = docs.select(col("doc_id"),
      trim(regexp_replace(text.asciiLower(col("text")),
        text.WsClass + "+", " ")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseByNt = norm.filter(kv => !isBatch(kv._1)).toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    rows.foreach { case (id, status, hit, jacc) =>
      val wantExact = baseByNt.get(norm(id))
      if (wantExact.isDefined) {
        assert(status == "exact_dup" && hit == wantExact.get,
          s"doc $id: want exact_dup@${wantExact.get}, got $status@$hit")
        assert(jacc.isEmpty, s"doc $id exact_dup carries a jaccard")
      } else assert(status != "exact_dup", s"doc $id spurious exact_dup")
      status match {
        case "new" =>
          assert(hit == -1L && jacc.isEmpty, s"doc $id new with hit/jacc")
        case "near_dup" =>
          assert(!isBatch(hit) && allIds.contains(hit),
            s"doc $id near hit $hit not a base doc")
          assert(jacc.exists(j => j >= 0.2 && j <= 1.0),
            s"doc $id near jaccard $jacc out of range")
        case "exact_dup" =>
          assert(!isBatch(hit), s"doc $id exact hit $hit not a base doc")
        case other => fail(s"doc $id unknown status $other")
      }
    }
    // every base-batch pair the ALL-PAIRS operator verifies must be
    // caught incrementally (same bands, base side capped the same)
    val verdicts = rows.map(r => r._1 -> r._2).toMap
    DedupOps.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => !isBatch(a) && isBatch(b) }
      .foreach { case (a, b) =>
        assert(verdicts(b) != "new",
          s"all-pairs found ($a,$b) but incremental calls $b new")
      }
    assert(rows.exists(_._2 != "new"), "test data lost its planted dups")
  }

  test("simhash blocking is exhaustive for hamming <= 3 (pigeonhole)") {
    val out = DedupOps.simhash(spark, sf)
    assert(out.filter(col("hamming") > 3).count() == 0)
    // every reported pair is symmetric-free and distinct
    val n = out.count()
    assert(out.distinct().count() == n)
  }

  test("simhash bucket cap bounds candidates on a pathological identical corpus") {
    import spark.implicits._
    // 300 byte-identical documents: every signature equal, so all 4
    // chunk buckets hold all 300 docs — the uncapped self-join would
    // emit 300*299/2 = 44,850 pairs; the representative cap bounds it
    // to O(docs * cap) while keeping the component CONNECTED (every
    // doc pairs with the lowest-id representatives)
    val nDocs = 300
    val cap = 8
    val docs = (0 until nDocs)
      .map(i => (i.toLong, "the same exact text repeated for every document"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashFromDocs(docs, cap)
    val rows = pairs.collect()
    assert(rows.forall(_.getInt(2) == 0), "identical docs must be hamming 0")
    assert(rows.length <= nDocs.toLong * cap,
      s"candidate count ${rows.length} exceeds docs*cap bound")
    assert(rows.length < nDocs * (nDocs - 1) / 2, "cap did not bound the blow-up")
    // connectivity: union-find over the capped pairs yields ONE cluster
    val clustered = graft.operators.CorpusOps.clustersFromPairs(
      docs.select("doc_id"), pairs.select("doc_a", "doc_b")).collect()
    assert(clustered.forall(_.getLong(1) == 0L),
      "capped pairs must still connect the whole duplicate group")
  }

  test("bucket candidate generation is capped and keeps the bucket connected") {
    import spark.implicits._
    // one bucket holding 1000 members: uncapped would emit 499,500
    // pairs; with cap=16 exactly sum_{i<16}(999-i) = 15,864 pairs, and
    // the pair graph still connects every member (all pair to the
    // 16 lowest ids)
    val n = 1000
    val cap = 16
    val banded = (0 until n).map(i => (0, 7L, i.toLong)).toDF("tbl", "bv", "vec_id")
    val cand = DedupOps.bucketCandidates(banded, Seq("tbl", "bv"), "vec_id", cap)
    val expected = (0 until cap).map(i => n - 1 - i).sum
    assert(cand.count() == expected)
    val clustered = graft.operators.CorpusOps.clustersFromPairs(
      spark.range(n).toDF("doc_id"),
      cand.select(col("cand_a").as("doc_a"), col("cand_b").as("doc_b"))).collect()
    assert(clustered.forall(_.getLong(1) == 0L), "capped pairs must stay connected")
  }

  test("simhash cap is a no-op when every bucket fits (identity in the capped regime)") {
    val capped = DedupOps.simhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = DedupOps.simhashFromDocs(
        graft.operators.DedupOps.docsParallel(spark, sf), Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped,
      "default cap must not change results on the test corpus (buckets < cap)")
  }

  test("embedding near-dup reports pairs at-or-above threshold, non-empty") {
    val out = DedupOps.embeddingNearDup(spark, sf)
    assert(out.filter(col("cosine") < 0.4).count() == 0)
    assert(out.count() > 0, "no pairs found at tau=0.4")
  }

  test("embedding near-dup finds planted duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]) = v.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
    val base = (0 until 40).map(_ => vec())
    // vecs 100..139 are near-copies of 0..39; the rest are independent
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      base.zipWithIndex.map { case (v, i) => (100L + i, jitter(v).toSeq) } ++
      (200 until 260).map(i => (i.toLong, vec().toSeq))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val found = DedupOps.embeddingNearDupImpl(df, tau = 0.9, tables = 6, bits = 12)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 40).map(i => (i.toLong, 100L + i)).toSet
    val recall = found.intersect(planted).size.toDouble / planted.size
    assert(recall >= 0.5, s"planted-duplicate recall $recall")
    // no false positives among independent vectors
    assert(found.forall { case (a, b) => planted.contains((a, b)) || b - a == 100 },
      s"unexpected pairs: ${found.filterNot { case (a, b) => b - a == 100 }}")
  }

  test("embedding rep-collapse: byte-twin corpus matches the uncollapsed " +
      "pipeline pair-for-pair; zero-norm twins stay unpaired") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 30).map(_ => vec())
    // byte-identical replicas with interleaved ids (the GenScale
    // shape): vec i gets copies at i+100 and i+200; 20 independents
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, v.toSeq), (100L + i, v.toSeq), (200L + i, v.toSeq)) } ++
      (300 until 320).map(i => (i.toLong, vec().toSeq))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .cache()
    def pairs(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // buckets stay far below the 256 rep cap (110 vectors), so the
    // uncollapsed pipeline is pair-complete over shared buckets and
    // the collapsed output must reproduce it EXACTLY — including the
    // twin pairs at rounded cosine 1.0
    val old = pairs(DedupOps.embeddingNearDupImpl(df, tau = 0.4,
      tables = 8, bits = 6).withColumn("cosine", round(col("cosine"), 6)))
    val neu = pairs(DedupOps.embeddingNearDupCollapsed(df, tau = 0.4,
      tables = 8, bits = 6))
    assert(neu.keySet == old.keySet,
      s"pair sets differ: only-old=${old.keySet -- neu.keySet} " +
        s"only-new=${neu.keySet -- old.keySet}")
    neu.foreach { case (k, c) => assert(c == old(k), s"cosine differs at $k") }
    // twins must be present at exactly 1.0 (rounding fixes the
    // ~1±2^-52 the uncollapsed fold computes)
    assert(neu((0L, 100L)) == 1.0 && neu((100L, 200L)) == 1.0)
    // zero-norm twins: cosine undefined -> no within pair emitted
    val withZero = (rows ++ Seq((400L, Seq.fill(64)(0.0f).map(_.toFloat)),
      (401L, Seq.fill(64)(0.0f).map(_.toFloat))))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val z = DedupOps.embeddingNearDupCollapsed(withZero, tau = 0.4,
      tables = 8, bits = 6)
      .filter(col("vec_a") === 400L && col("vec_b") === 401L).count()
    assert(z == 0, "zero-norm twins must not pair")
    df.unpersist()
  }

  test("passage dedup: every reported passage spans >1 doc; exact dup docs share all chunks") {
    val out = DedupOps.passageDedup(spark, sf).collect()
    assert(out.nonEmpty, "corpus has exact dups, so shared passages must exist")
    out.foreach { r =>
      assert(r.getLong(1) > 1)                     // n_docs
      assert(r.getLong(2) >= r.getLong(1))         // occurrences >= docs
    }
    // exact-duplicate doc pairs (same text) must share every full
    // 8-token chunk: pick one duplicate pair from the exact-dedup op
    val dups = DedupOps.exact(spark, sf)
      .filter(col("n_copies") > 1).limit(1).collect()
    if (dups.nonEmpty) {
      val fps = out.map(_.getLong(0)).toSet
      val docText = Tables.documents(spark, sf)
        .filter(col("doc_id") === dups(0).getAs[Long]("keep_id"))
        .select("text").as[String](org.apache.spark.sql.Encoders.STRING)
        .head()
      val toks = docText.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= 8) {
        val chunk = toks.take(8).mkString(" ")
        val fp = chunk.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
        assert(fps.contains(fp), "first chunk of a duplicated doc not reported")
      }
    }
  }

  test("dedup eval: counts match direct recomputation from the two pair sets") {
    val r = DedupOps.dedupEval(spark, sf).collect().head
    val truth = DedupOps.ngramJaccard(spark, sf).select("doc_a", "doc_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.getString(0) == "minhash_lsh")
    assert(r.getAs[Long]("n_truth") == truth.size.toLong)
    val nc = r.getAs[Long]("n_candidates")
    val nf = r.getAs[Long]("n_found")
    assert(nf <= nc && nf <= truth.size)
    // verified minhash output = truth ∩ candidates, so n_found must
    // equal the minhash pair count
    assert(nf == DedupOps.minhashLsh(spark, sf).count())
    assert(r.getAs[Long]("precision_ppm") == nf * 1000000L / nc)
    assert(r.getAs[Long]("recall_ppm") == nf * 1000000L / truth.size)
  }

  test("dedup stats histogram conserves docs and clusters") {
    val out = DedupOps.dedupStats(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    val clusters = graft.operators.CorpusOps.clusters(spark, sf)
      .select("cluster_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_docs_in_size")).sum == docs)
    assert(out.map(_.getAs[Long]("n_clusters_of_size")).sum == clusters)
    out.foreach { r =>
      val (cs, nc) = (r.getAs[Long]("csize"), r.getAs[Long]("n_clusters_of_size"))
      assert(cs >= 1 && nc >= 1)
      assert(r.getAs[Long]("n_docs_in_size") == cs * nc)
      // removed share = docs minus one representative per cluster
      assert(r.getAs[Long]("corpus_share_ppm") == cs * nc * 1000000L / docs)
      assert(r.getAs[Long]("removed_share_ppm") == (cs - 1) * nc * 1000000L / docs)
    }
  }

  test("lsh curve matches the closed form and behaves like an S-curve") {
    val got = DedupOps.lshCurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 3 * 39)
    got.groupBy(b => (b._1, b._2)).foreach { case ((b, r), cells) =>
      assert(b * r == 64, "configs partition the 64 minhashes")
      val byS = cells.sortBy(_._3)
      // monotone nondecreasing in s, pinned near 0 and 1 at the ends
      byS.sliding(2).foreach {
        case Array(x, y) => assert(y._4 >= x._4 - 1e-9, s"b=$b monotone")
        case _ =>
      }
      assert(byS.head._4 < 0.1 && byS.last._4 > 0.9, s"b=$b S-shape")
      byS.foreach { case (_, _, s0, p) =>
        val want = 1.0 - math.pow(1.0 - math.pow(s0, r), b)
        assert(math.abs(p - want) < 1e-6, s"b=$b s=$s0")
      }
      // the candidate threshold sits near (1/b)^(1/r)
      val t = math.pow(1.0 / b, 1.0 / r)
      val below = byS.filter(_._3 < t - 0.1).map(_._4)
      val above = byS.filter(_._3 > t + 0.1).map(_._4)
      assert(below.isEmpty || below.max < 0.95)
      assert(above.isEmpty || above.min > 0.2, s"b=$b cliff location")
    }
  }

  test("substring coverage matches a driver-side exact recompute") {
    val k = 8
    // the spec-side tokenizer mirror: ASCII-range lowercase +
    // whitespace split, empties dropped (the text.tokens contract)
    def tok(s: String): Array[String] =
      s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        .mkString.split("[ \t\n\\x0B\f\r]+").filter(_.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), tok(r.getString(1))))
    val gramDocs = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[Long]]
    for ((id, t) <- docs; i <- 0 to t.length - k)
      gramDocs.getOrElseUpdate(t.slice(i, i + k).mkString(" "),
        scala.collection.mutable.Set.empty) += id
    val expected = docs.flatMap { case (id, t) =>
      val pos = (0 to t.length - k).filter { i =>
        gramDocs(t.slice(i, i + k).mkString(" ")).size > 1
      }
      if (pos.isEmpty) None
      else {
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        for (p <- pos) {
          if (runs.nonEmpty && p - runs.last._2 <= k)
            runs(runs.length - 1) = (runs.last._1, p)
          else runs += ((p, p))
        }
        val lens = runs.map { case (f, l) => l - f + k }
        val covered = lens.map(_.toLong).sum
        Some((id, t.length.toLong, pos.size.toLong, covered,
          covered * 1000000L / t.length, lens.max.toLong, runs.size.toLong))
      }
    }.toSet
    assert(expected.nonEmpty, "corpus lost its planted duplicated spans")
    val got = DedupOps.substringDedup(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // coverage invariants hold row-by-row
    got.foreach { case (_, ntok, starts, covered, ppm, maxRun, nRuns) =>
      assert(covered <= ntok && maxRun <= covered && ppm <= 1000000L &&
        starts >= nRuns && nRuns >= 1)
    }
  }

  test("ingest fold: step 2 is exactly dedup_incremental; splits and hits bounded") {
    val mx = Tables.documents(spark, sf).agg(max(col("doc_id")))
      .collect().head.getLong(0)
    val fold = DedupOps.ingestFold(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // split discipline: step 1 = (80%, 90%], step 2 = (90%, 100%];
    // every hit defers to a doc in the step's BASE (ids <= lo bound)
    fold.foreach { case (st, id, status, hit) =>
      val (lo, hi) = if (st == 1) (8L, 9L) else (9L, 10L)
      assert(id * 10 > mx * lo && id * 10 <= mx * hi, s"doc $id in step $st")
      if (status == "new") assert(hit == -1L)
      else assert(hit * 10 <= mx * lo, s"step $st hit $hit must be in-base")
    }
    // step 2's (batch, base) split IS dedup_incremental's — the fold
    // must reproduce it verbatim (same memoized relations, same core)
    val inc = DedupOps.incrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val step2 = fold.filter(_._1 == 2).map(t => (t._2, t._3, t._4)).toSet
    assert(step2 == inc, "fold step 2 == dedup_incremental")
  }

  test("containment: scores match a driver recompute over the shingle space; " +
      "exact dups score 1.0; asymmetric containment is jaccard-invisible") {
    // driver ground truth over the SAME df-capped shingle universe
    val sh = DedupOps.shingleSets(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sh")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      inter = (sa & sb).size
      if inter > 0 && inter.toLong * 1000000 / math.min(sa.size, sb.size) >= 800000
    } yield (a, b) -> (inter.toLong * 1000000 / math.min(sa.size, sb.size))).toMap
    val got = DedupOps.containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(got == want, "containment pair set + ppm scores")
    assert(got.nonEmpty, "planted dups must produce containment pairs")
    // an asymmetric pair (small ⊂ big, sizes far apart) is exactly the
    // case the symmetric jaccard threshold is blind to — prove the two
    // operators disagree somewhere whenever such a pair exists
    val jac = DedupOps.ngramJaccard(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // STRICT inequality: at exactly nb = 5·na with full containment,
    // jaccard = na/(na+5na−na) = 0.2 passes the inclusive >= 0.2
    // filter, so that boundary pair CAN legitimately appear in both
    // operators (round-12 ADVICE) — only >5x skew is jaccard-blind
    val asymmetric = want.keySet.filter { case (a, b) =>
      val (na, nb) = (sh(a).size, sh(b).size)
      math.max(na, nb) > 5 * math.min(na, nb)
    }
    asymmetric.foreach(p => assert(!jac.contains(p),
      s"pair $p: >5x size skew cannot clear jaccard 0.2"))
  }

  test("ngram novelty: ppm matches a driver first-occurrence recompute; " +
      "the corpus's first doc with shingles is fully novel") {
    val sh = DedupOps.shingleSets(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sh")))
    val firstDoc = sh.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val want = sh.groupBy(_._1).map { case (d, rows) =>
      val n = rows.size.toLong
      val novel = rows.count { case (_, s) => firstDoc(s) == d }.toLong
      d -> ((n, novel, novel * 1000000 / n))
    }
    val got = graft.operators.TextOps.ngramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want, "per-doc (n_sh, n_novel, novelty_ppm)")
    val minDoc = sh.map(_._1).min
    assert(got(minDoc)._3 == 1000000L,
      "the lowest doc_id owning shingles debuts every one of them")
  }
}
