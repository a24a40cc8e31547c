package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: q_bfs_hops round-by-round cost at a given SF — edge /
  * node / frontier cardinalities and per-round wall, to localize
  * where its CPU goes (r12: 74 task-CPU-seconds at sf0.1 looked far
  * too high for a ~16k-node bipartite graph). */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.get(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bfsprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val pairs = t("fill bipartite_pairs") {
      val p = graft.operators.GraphOps.bipartitePairs(spark, d); p.count(); p
    }
    println(s"[bfsprobe] pairs=${pairs.count()}")
    val edges = pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
      .union(pairs.select(col("supp_node").as("src"), col("cust_node").as("dst")))
    val nodes = edges.select(col("src").as("node")).distinct()
    println(s"[bfsprobe] nodes=${nodes.count()} edges=${edges.count()}")
    t("whole q_bfs_hops") {
      graft.SparkEntry.queries("q_bfs_hops")(spark, d).count()
    }
    t("whole q_bfs_hops (2nd)") {
      graft.SparkEntry.queries("q_bfs_hops")(spark, d).count()
    }
    spark.stop()
  }
}
