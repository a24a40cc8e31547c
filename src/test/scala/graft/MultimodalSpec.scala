package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("typed decode boundary reproduces the expression-based feature path") {
    // binaryMeta's hot path is pure codegen; decodeWithCodec is the
    // mapPartitions boundary a real codec plugs into — for the fake
    // codec the two must agree row for row, so a codec swap changes
    // exactly one function
    val expr = MultimodalOps.binaryMeta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5))).toSet
    val typed = MultimodalOps.decodeWithCodec(spark, sf)(MultimodalOps.fakeCodec)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5))).toSet
    assert(typed == expr)
  }

  test("real codec: javax.imageio decodes genuine PNG/GIF bytes at the seam") {
    // a REAL decode through the SAME mapPartitions boundary the stub
    // uses — the payloads are actual encoded images built in-memory,
    // not text stand-ins, so this is the non-simulated half of the
    // codec contract (round-11 verdict item 5)
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", bos)
      bos.toByteArray
    }
    val s = spark
    import s.implicits._
    val media = Seq(
      (1L, png(37, 23), "img", 0L),
      (2L, gif(5, 9), "img", 0L),
      (3L, "not an image at all".getBytes("UTF-8"), "txt", 0L))
      .toDF("doc_id", "payload", "lang", "n_chars")
    val out = MultimodalOps.decodeMedia(media)(MultimodalOps.imageioCodec)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    assert(out(1L) == ((37, 23, 1, "png")),
      "true pixel dims + container format read from real PNG bytes")
    assert(out(2L) == ((5, 9, 1, "gif")))
    assert(out(3L) == ((0, 0, 0, "unknown")),
      "unrecognized container degrades to the quarantine row")
    // and the stub codec runs through the IDENTICAL seam — the swap
    // is one function value
    val stub = MultimodalOps.decodeMedia(
        media.withColumn("payload",
          org.apache.spark.sql.functions.encode(
            org.apache.spark.sql.functions.lit("abcdefgh"), "UTF-8")))(
        MultimodalOps.fakeCodec)
      .collect().map(r => r.getInt(1)).toSet
    assert(stub == Set(8), "stub decode of the planted 8-byte payloads")
  }

  test("payload dedup: planted binary duplicates collapse to min id") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (10L, "same payload bytes"),
      (3L, "same payload bytes"),
      (7L, "unique payload")).toDF("doc_id", "text")
    val out = MultimodalOps.payloadDedupFromDocs(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(3L -> 2L, 7L -> 1L),
      "duplicate payloads must collapse to the min doc_id with count 2")
    // corpus path: every doc accounted for exactly once
    val total = MultimodalOps.payloadDedup(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_copies")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("shard manifest: offsets tile the byte stream densely, shards bounded") {
    val rows = MultimodalOps.shardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs.toInt, "every payload gets a manifest row")
    val shardBytes = 65536L
    // reconstruct absolute start offsets; sorted they must tile the
    // stream with no gaps or overlaps
    val starts = rows.map { case (_, n, shard, off) =>
      (shard.toLong * shardBytes + off, n)
    }.sortBy(_._1)
    var expect = 0L
    starts.foreach { case (start, n) =>
      assert(start == expect, s"payload at $start leaves a gap (want $expect)")
      expect = start + n
    }
    assert(expect == rows.map(_._2).sum, "stream length = total bytes")
    rows.foreach { case (_, _, _, off) =>
      assert(off >= 0 && off < shardBytes, "offset stays inside its shard")
    }
    // the manifest must actually span multiple shards at test scale
    assert(rows.map(_._3).distinct.length > 1)
  }

  test("resize plan: aspect preserved within floor rounding, never upscaled") {
    val rows = MultimodalOps.resizePlan(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (w, h, ow, oh, b) =
        (r.getLong(1), r.getLong(2), r.getInt(3).toLong, r.getInt(4).toLong,
          r.getInt(5))
      val (ss, ls) = (math.min(w, h), math.max(w, h))
      if (ss > 224) {
        // scaled: short side lands exactly on 224, long side floors
        assert(math.min(ow, oh) == 224)
        assert(math.max(ow, oh) == ls * 224 / ss)
      } else {
        assert((ow, oh) == (w, h), "small images pass through")
      }
      assert(ow <= w && oh <= h, "never upscale")
      assert(b == math.min(ls * 4 / ss, 8))
      assert(b >= 4 && b <= 8, "long/short >= 1 so bucket >= 4")
    }
  }

  test("audio chunks: zero-length payloads emit no chunks instead of throwing") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "x" * 200)).toDF("doc_id", "text")
    val got = graft.operators.MultimodalOps.audioChunksImpl(docs).collect()
    assert(!got.exists(_.getLong(0) == 1L),
      "empty doc must vanish (sequence(0,-1) used to throw here)")
    assert(got.count(_.getLong(0) == 2L) > 0, "non-empty doc still chunks")
  }

  test("audio chunks tile every payload with clipped overlap windows") {
    val durations = Tables.documents(spark, sf)
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) * 10L as dur")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = MultimodalOps.audioChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byDoc = got.groupBy(_._1)
    durations.foreach { case (id, dur) =>
      val chunks = byDoc.getOrElse(id, Array.empty).sortBy(_._2)
      if (dur == 0) assert(chunks.isEmpty, s"doc $id: zero duration")
      else {
        // the expected grid: starts at every 1500ms below the duration
        val starts = 0L.until(dur, 1500L).toSeq
        assert(chunks.map(_._3).toSeq == starts, s"doc $id starts")
        chunks.foreach { case (_, idx, start, end, d) =>
          assert(d == dur && start == idx * 1500L)
          assert(end == math.min(start + 2000L, dur), s"doc $id chunk $idx")
          assert(end > start, "windows are non-empty")
        }
        // full coverage: consecutive windows overlap or touch
        chunks.sliding(2).foreach {
          case Array(a, b) => assert(b._3 <= a._4, "no gap between windows")
          case _ =>
        }
        assert(chunks.last._4 == dur, "last window reaches the end")
      }
    }
  }

  test("caption pairs: caption is the token prefix, gate matches a recount") {
    val docs = Tables.documents(TestSession.spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = MultimodalOps.captionPairs(TestSession.spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.length == docs.size)
    got.foreach { case (id, caption, capToks, nBytes, keep) =>
      // ASCII-range lowering + the tokenizer's whitespace class
      val toks = docs(id)
        .map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        .split("[ \t\n\u000b\f\r]+").filter(_.nonEmpty)
      assert(caption == toks.take(12).mkString(" "), s"doc $id caption")
      assert(capToks == math.min(toks.length, 12), s"doc $id cap_toks")
      assert(nBytes == docs(id).getBytes("UTF-8").length, s"doc $id bytes")
      assert(keep == (capToks >= 3 && nBytes >= 64 && nBytes <= 20000),
        s"doc $id keep")
    }
  }

  test("modality stats: rows partition the corpus, shares sum to ~1e6") {
    val nDocs = Tables.documents(TestSession.spark, sf).count()
    val rows = MultimodalOps.modalityStats(TestSession.spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSet.subsetOf(Set("image", "audio", "video")))
    assert(rows.map(_._2).sum == nDocs, "docs partition the corpus")
    rows.foreach { case (m, n, tot, avg, mx, _) =>
      assert(avg == tot / n, s"$m avg")
      assert(mx >= avg, s"$m max >= avg")
    }
    val shareSum = rows.map(_._6).sum
    assert(shareSum >= 1000000L - rows.length && shareSum <= 1000000L,
      s"byte shares sum to ~1e6 ppm (got $shareSum)")
  }

  test("phash: transcoded near-twins pair, unrelated payloads do not") {
    import spark.implicits._
    // a "media" payload with realistic local structure: repeated
    // phrase blocks (so trigram mass concentrates in stable buckets)
    val base = Seq.tabulate(60)(i =>
      s"frame $i tone ${(i * 7) % 13} sample block payload").mkString(" ")
    // transcode 1: re-encoder rewrites a short metadata run mid-stream
    val transcoded = base.replace("frame 30", "FRAME-30x")
    // transcode 2: container prepends a header (pure INSERTION — the
    // edit class that shears positional cell hashes; histogram
    // features must shrug it off)
    val headered = "RIFF0001 " + base
    // unrelated content of similar length
    val other = Seq.tabulate(60)(i =>
      s"lorem ${i * 31} ipsum dolor sit amet consectetur").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, transcoded), (3L, headered), (4L, other),
      (5L, base) // exact byte copy
    ).toDF("doc_id", "text")
    val pairs = MultimodalOps.phashPairsFromDocs(docs, cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 5L)).contains(0), "exact copy at hamming 0")
    assert(pairs.contains((1L, 2L)), "rewrite-transcode found as near-dup")
    assert(pairs.contains((1L, 3L)), "header-insertion transcode found")
    assert(pairs((1L, 2L)) <= 3 && pairs((1L, 3L)) <= 3)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated payload pairs with nothing")
  }

  test("phash clusters: a transcode family collapses to one keeper") {
    import spark.implicits._
    val base = Seq.tabulate(60)(i =>
      s"frame $i tone ${(i * 7) % 13} sample block payload").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("frame 30", "FRAME-30x")), // re-encode rewrite
      (3L, "RIFF0001 " + base),                    // container header
      (4L, Seq.tabulate(60)(i =>
        s"lorem ${i * 31} ipsum dolor sit amet consectetur").mkString(" ")),
      (5L, base)                                   // exact byte copy
    ).toDF("doc_id", "text")
    val got = graft.operators.CorpusOps.clustersFromPairs(
        docs.select("doc_id"),
        MultimodalOps.phashPairsFromDocs(docs, cap = 64)
          .select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // the whole transcode family defers to doc 1; only it is kept
    Seq(1L, 2L, 3L, 5L).foreach { id =>
      assert(got(id) == ((1L, id == 1L)), s"doc $id cluster verdict") }
    assert(got(4L) == ((4L, true)), "unrelated payload is its own keeper")
  }

  test("phash rep-collapsed edges reproduce the full pair graph's clusters") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Seq.tabulate(60)(i =>
      s"frame $i tone ${(i * 7) % 13} sample block payload").mkString(" ")
    // equal-signature twins (byte copies), a near twin, an unrelated
    // doc — with interleaved ids so twin edges point min->max
    val docs = Seq(
      (1L, base), (9L, base), (4L, base),           // sig-equal family
      (2L, base.replace("frame 30", "FRAME-30x")),  // near twin of 1
      (7L, Seq.tabulate(60)(i =>
        s"lorem ${i * 31} ipsum dolor sit amet consectetur").mkString(" "))
    ).toDF("doc_id", "text")
    val sigs = graft.Checkpoints.eager(
      MultimodalOps.phashSigsFromDocs(docs))
    def labels(pairs: org.apache.spark.sql.DataFrame) =
      graft.operators.CorpusOps.clustersFromPairs(docs.select("doc_id"), pairs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap
    val full = labels(MultimodalOps.phashPairsFromDocs(docs, cap = 64)
      .select("doc_a", "doc_b"))
    val collapsed = labels(MultimodalOps.phashRepEdges(sigs, 64))
    assert(collapsed == full,
      s"rep-collapsed components must equal the full pair graph's: " +
        s"full=$full collapsed=$collapsed")
    // and the family did collapse onto one keeper
    assert(collapsed(9L)._1 == 1L && !collapsed(9L)._2 && collapsed(1L)._2)
  }

  test("mm semantic: an aggressive re-encode that phash MISSES is caught") {
    import spark.implicits._
    val base = Seq.tabulate(60)(i =>
      s"frame $i tone ${(i * 7) % 13} sample block payload").mkString(" ")
    // aggressive re-encode: case remap + whitespace renormalization
    // rewrites essentially EVERY byte trigram (the phash feature
    // space) while the decoded content — the token stream — is
    // unchanged (text.tokens case-folds and collapses whitespace)
    val reencoded = base.toUpperCase.replace(" ", "  ")
    val other = Seq.tabulate(60)(i =>
      s"lorem ${i * 31} ipsum dolor sit amet consectetur").mkString(" ")
    val docs = Seq((1L, base), (2L, reencoded), (3L, other))
      .toDF("doc_id", "text")
    // byte-level pass provably misses it…
    val phash = MultimodalOps.phashPairsFromDocs(docs, cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!phash.contains((1L, 2L)),
      "the re-encode must escape the byte-trigram signature (hamming > 3)")
    // …the semantic pass catches it through the decoded embedding
    val sem = MultimodalOps.mmSemanticFromDocs(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(sem(1L) == ((-1L, true)), "min-id representative kept")
    assert(sem(2L) == ((1L, false)),
      "re-encode caught as a semantic dup of the original")
    assert(sem(3L) == ((-1L, true)), "unrelated payload kept")
  }

  test("mm semantic: stub encoder (driver-side) equals the expression-path embedding") {
    // mediaVecOf is where a real CLIP-style encoder plugs in; the
    // query path computes the same embedding as expressions — the
    // two must agree bit-for-bit on the corpus (the binaryMeta /
    // phashOf boundary-equivalence discipline)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val want = docs.collect().map { r =>
      (r.getLong(0),
        MultimodalOps.mediaVecOf(r.getString(1).getBytes("UTF-8")).toSeq)
    }.toSet
    val got = MultimodalOps.mediaVectorsFromDocs(docs)
      .collect().map { r =>
        (r.getLong(0),
          r.getSeq[Double](1).map(_.toLong).toSeq)
      }.toSet
    assert(got == want)
  }

  test("mm decode sweep: one-pass feats equal independent expression recomputes") {
    // production decodes each payload ONCE (mediaFeatsFromDocs) and
    // lands sig + vec + norm² + LSH buckets in that sweep; every
    // feature must agree bit-for-bit with its expression-path twin
    // (the mirror's shape), or the one-pass fusion silently drifts
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val feats = MultimodalOps.mediaFeatsFromDocs(docs).collect().map { r =>
      r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getSeq[Long](3).toSeq,
          r.getLong(4), r.getSeq[Long](5).toSeq))
    }.toMap
    val exprVec = MultimodalOps.mediaVectorsFromDocs(docs).collect().map { r =>
      r.getLong(0) ->
        ((r.getSeq[Double](1).map(_.toLong).toSeq, r.getLong(2)))
    }.toMap
    assert(feats.keySet == exprVec.keySet, "every doc crosses the sweep")
    feats.foreach { case (id, (_, _, vec, n2, _)) =>
      assert((vec, n2) == exprVec(id), s"doc $id vec/norm2") }
    val exprB = MultimodalOps.mediaBandedExprFromDocs(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    feats.foreach { case (id, (_, _, _, _, bvs)) =>
      bvs.zipWithIndex.foreach { case (bv, t) =>
        assert(exprB((id, t)) == bv, s"doc $id table $t bucket") } }
    val leanSig = MultimodalOps.phashSigsFromDocs(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sweepSig = feats.collect { case (id, (ok, sig, _, _, _)) if ok =>
      id -> sig }
    assert(sweepSig == leanSig, "sig + sig_ok match the lean phash seam")
    // the sweep's payload sha (the rep-collapse grouping key) equals
    // the expression-path sha2 — the boundary-equivalence discipline
    // for the round-12 addition
    val exprSha = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.encode(
            org.apache.spark.sql.functions.col("text"), "UTF-8"), 256))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sweepSha = MultimodalOps.mediaFeatsFromDocs(docs).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(sweepSha == exprSha, "sweep sha matches sha2 expression path")
  }

  test("mm semantic rep-collapse: members inherit the rep verdict; zero vectors stay kept") {
    import spark.implicits._
    val base = Seq.tabulate(60)(i =>
      s"frame $i tone ${(i * 7) % 13} sample block payload").mkString(" ")
    val reencoded = base.toUpperCase.replace(" ", "  ")
    val other = Seq.tabulate(60)(i =>
      s"lorem ${i * 31} ipsum dolor sit amet consectetur").mkString(" ")
    val blank = "   " // tokenless: zero embedding, norm² = 0
    val docs = Seq(
      (1L, base), (2L, base), (5L, base),  // byte-identical family, rep 1
      (3L, reencoded),                     // distinct bytes, cosine 1.0 vs 1
      (4L, other),                         // unrelated
      (6L, blank), (7L, blank))            // zero-norm byte twins
      .toDF("doc_id", "text")
    val sem = MultimodalOps.mmSemanticFromDocs(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(sem(1L) == ((-1L, true)), "group rep (min id) kept")
    assert(sem(2L) == ((1L, false)) && sem(5L) == ((1L, false)),
      "byte twins inherit the rep as dup_of without entering the pair stream")
    assert(sem(3L) == ((1L, false)),
      "cross-group near-dup verified in rep space, attributed to the rep")
    assert(sem(4L) == ((-1L, true)), "unrelated payload kept")
    assert(sem(6L) == ((-1L, true)) && sem(7L) == ((-1L, true)),
      "zero-norm byte twins can never verify (dot > 0 unsatisfiable) — kept")
  }

  test("mm cascade: verdicts recompose from the three stage operators") {
    import org.apache.spark.sql.functions.col
    val d = sf
    val got = MultimodalOps.mmCascade(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // recompose: exact beats perceptual beats semantic beats unique
    val exact = MultimodalOps.payloadDedup(spark, d)
      .filter(col("n_copies") > 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shaOf = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.encode(col("text"), "UTF-8"), 256))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perc = MultimodalOps.phashClusters(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sem = MultimodalOps.mmSemantic(spark, d)
      .filter(!col("kept")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, (stage, keep)) =>
      val exactKeep = exact.get(shaOf(id)).filter(_ < id)
      val percKeep = perc.get(id).filter(_ < id)
      val semKeep = sem.get(id)
      val want = exactKeep.map(("exact", _))
        .orElse(percKeep.map(("perceptual", _)))
        .orElse(semKeep.map(("semantic", _)))
        .getOrElse(("unique", -1L))
      assert((stage, keep) == want, s"doc $id")
    }
  }

  test("phash: typed boundary signatures equal a driver-side recompute") {
    // the mapPartitions codec path (encode -> bytes -> phashOf) must
    // agree with hashing the UTF-8 bytes directly on the driver —
    // proves the boundary plumbing (binary encode, typed rows, no
    // repartition) is value-neutral
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.filter(_._2.getBytes("UTF-8").length >= 3)
      .map { case (id, t) =>
        (id, MultimodalOps.phashOf(t.getBytes("UTF-8"))) }.toSet
    val got = MultimodalOps.phashSigsFromDocs(
        graft.Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
