package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("pagerank: mass conserved up to integer dust, degree correlates with rank") {
    val pr = GraphOps.pagerankSupplier(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(pr.nonEmpty)
    assert(pr.forall(_._2 > 0), "every reachable supplier keeps positive rank")
    // supplier mass is a fraction of total unit mass; integer division
    // only ever LOSES dust, so the full-graph sum stays <= 1e9
    val edges = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s")).distinct()
    val degBySupp = edges.groupBy("s").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val suppMass = pr.map(_._2).sum
    assert(suppMass <= 1000000000L, s"supplier mass $suppMass exceeds unit")
    // rank should order with degree on the extremes: the mean rank of
    // the top-degree decile must exceed the bottom decile's
    val byDeg = pr.sortBy { case (k, _) => degBySupp.getOrElse(k, 0L) }
    val k = math.max(1, pr.length / 10)
    val lo = byDeg.take(k).map(_._2.toDouble).sum / k
    val hi = byDeg.takeRight(k).map(_._2.toDouble).sum / k
    assert(hi > lo, s"high-degree suppliers must outrank low-degree ($hi vs $lo)")
  }

  test("pagerank is invariant to input partitioning") {
    val a = GraphOps.pagerankSupplier(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val b = GraphOps.pagerankSupplier(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
      assert(a == b, "nanorank arithmetic must not depend on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("bfs hops: histogram matches a driver-side BFS over the same graph") {
    val got = GraphOps.bfsHops(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver BFS
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, a) => k -> a.map(_._2) }
    val seed = adj.keys.min
    val dist = collection.mutable.Map(seed -> 0L)
    var frontier = Seq(seed)
    (1 to 4).foreach { h =>
      frontier = frontier.flatMap(adj(_)).distinct.filterNot(dist.contains)
      frontier.foreach(dist(_) = h.toLong)
    }
    val expected = adj.keys.toSeq
      .map(n => dist.getOrElse(n, -1L))
      .groupBy(identity).map { case (h, a) => h -> a.length.toLong }
    assert(got == expected)
    assert(got.keys.exists(_ >= 1), "the seed must reach beyond itself")
    assert(got.values.sum == adj.size, "every node appears exactly once")
  }

  test("triangle count matches a driver-side brute force") {
    val row = GraphOps.triangleCount(spark, sf).collect().head
    val (nNodes, nEdges, nWedges, nTri) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // brute force on the driver: same weighted top-8 kNN construction
    val os = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cow = collection.mutable.Map[(Long, Long), Long]()
    os.groupBy(_._1).values.foreach { grp =>
      val sks = grp.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- i + 1 until sks.length) {
        val k = (sks(i), sks(j))
        cow(k) = cow.getOrElse(k, 0L) + 1
      }
    }
    val dir = cow.toSeq.flatMap { case ((u, v), w) =>
      Seq((u, v, w), (v, u, w)) }
    val edges = dir.groupBy(_._1).values.flatMap { grp =>
      grp.sortBy { case (_, dst, w) => (-w, dst) }.take(8)
        .map { case (src, dst, _) =>
          (math.min(src, dst), math.max(src, dst)) }
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(n => n -> edges.collect {
      case (a, b) if a == n => b
      case (a, b) if b == n => a
    }).toMap
    val bruteTri = edges.toSeq.map { case (u, v) =>
      (adj(u) intersect adj(v)).count(w => w > v)
    }.sum
    val bruteWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(nNodes == nodes.size.toLong)
    assert(nEdges == edges.size.toLong)
    assert(nWedges == bruteWedges)
    assert(nTri == bruteTri.toLong, s"triangles $nTri vs brute $bruteTri")
    assert(nTri > 0, "test corpus must contain at least one triangle")
  }

  test("degree distribution reconciles with the edge set and triangle stats") {
    val edges = GraphOps.assocEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degs = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = degs.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphOps.degreeDist(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == want.keySet)
    val total = degs.size.toLong
    got.foreach { case (deg, (n, ppm)) =>
      assert(n == want(deg), s"degree $deg")
      assert(ppm == n * 1000000L / total, s"degree $deg share")
    }
    // node/edge totals must reconcile with the triangle stats row
    val tri = GraphOps.triangleCount(spark, sf).collect().head
    assert(got.values.map(_._1).sum == tri.getAs[Long]("n_nodes"))
    assert(got.map { case (d, (n, _)) => d * n }.sum == 2 * tri.getAs[Long]("n_edges"))
    // top-K construction bounds degree at 2K after symmetrization...
    assert(got.keys.max <= 16, "degree must respect the top-K bound")
  }
}
