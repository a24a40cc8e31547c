package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.topk
import graft.operators.{CorpusOps, DedupOps}

/** Skew robustness for the custom operators whose scale claims rest
  * on per-key or per-bucket bounds: a 100 TB corpus WILL hand them a
  * pathological key (one viral document duplicated millions of
  * times, one hub entity touching everything). These tests feed a
  * deliberately skewed small-scale version of each pathology and
  * assert (a) results stay exactly correct and (b) the candidate /
  * state bounds that make the operator scale actually hold. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("bounded-heap top-k is exact when 99% of rows share one key") {
    val n = 100000
    // key 0 holds ~99% of rows; values interleave so every partition
    // sees candidates for every key
    val rows = (0 until n).map { i =>
      val k = if (i % 100 == 0) (i / 100) % 7 + 1 else 0
      (k.toLong, (i * 2654435761L) % 1000003L, i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(13)
    val got = topk.perKey(df, Seq("k"),
      Seq(topk.Order("v", ascending = false), topk.Order("id")), 5)
      .select("k", "v", "id", "rank").as[(Long, Long, Long, Int)]
      .collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (k, g) =>
      g.sortBy { case (_, v, id) => (-v, id) }.take(5).zipWithIndex
        .map { case ((_, v, id), r) => (k, v, id, r + 1) }
    }.toSet
    assert(got == want)
  }

  test("label propagation resolves a skewed star graph (one hub, 3k leaves)") {
    val leaves = 3000L
    val docs = (0L to leaves).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (1L to leaves).map(i => (0L, i)).toDF("doc_a", "doc_b")
    // driverMaxEdges = 0 forces the DISTRIBUTED min-label path: the
    // hub's degree concentrates a full round's messages on one key —
    // the exact shape AQE/partial aggregation must absorb
    val got = CorpusOps.clustersFromPairs(docs, pairs, driverMaxEdges = 0)
      .collect()
    assert(got.length == leaves + 1)
    val clusterIds = got.map(_.getLong(1)).distinct
    assert(clusterIds.length == 1,
      s"star graph must collapse to ONE cluster, got ${clusterIds.length}")
  }

  test("simhash bucket cap keeps a 2k-duplicate corpus subquadratic") {
    val dups = 2000
    val cap = 64
    val docs = ((0 until dups).map(i => (i.toLong, "the same viral text body"))
      ++ Seq((90001L, "completely different content here"),
        (90002L, "another unrelated document text")))
      .toDF("doc_id", "text").repartition(7)
    val pairs = DedupOps.simhashFromDocs(docs, bucketCap = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    // all emitted pairs are within the duplicate block (identical
    // signatures), none across the unrelated docs
    assert(pairs.forall { case (a, b) => a < dups && b < dups && a < b })
    // the representative cap bounds candidates at O(B·cap), not B²/2
    val quadratic = dups.toLong * (dups - 1) / 2
    assert(pairs.length.toLong <= dups.toLong * cap,
      s"pair count ${pairs.length} exceeds the B·cap bound")
    assert(pairs.length.toLong < quadratic / 10,
      "cap failed to prevent a quadratic pair explosion")
    // every duplicate doc is COVERED (appears in at least one pair) —
    // the cap must not orphan cluster members
    val covered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert((0L until dups.toLong).forall(covered.contains),
      "bucket cap orphaned duplicate docs from their cluster")
  }
}
