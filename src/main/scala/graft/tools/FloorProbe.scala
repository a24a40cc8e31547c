package graft.tools

import graft.SparkEntry

/** Dev probe for the toy-SF per-query scheduling floor: times a
  * representative light-query slice of the inventory twice (cold,
  * warm) under configurable session knobs, so config levers (AQE,
  * shuffle partitions) can be A/B'd for fixed overhead WITHOUT
  * touching plan shape at scale. Env:
  *   SPARK_GRAFT_AQE=0        disable adaptive execution
  *   SPARK_GRAFT_PROBE_N=40   how many queries (alphabetical prefix)
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "40").toInt
    val aqe = !sys.env.get("SPARK_GRAFT_AQE").contains("0")
    val codegen = !sys.env.get("SPARK_GRAFT_CODEGEN").contains("0")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.codegen.wholeStage", codegen.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cheap, memo-free relational/etl queries only: the floor is the
    // per-query fixed cost, not fill or heavy-operator work
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(q => q.startsWith("q") || q.startsWith("etl_"))
      .take(n)
    // warmup scans
    graft.Tables.lineitem(spark, sfDir).count()
    graft.Tables.events(spark, sfDir).count()
    def pass(tag: String): Unit = {
      val t0 = System.nanoTime()
      val per = names.map { q =>
        val s0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - s0) / 1e9
      }
      val tot = (System.nanoTime() - t0) / 1e9
      val sortedT = per.sorted
      println(f"[floor] $tag aqe=$aqe cg=$codegen n=${names.size} total=$tot%7.2fs " +
        f"median=${sortedT(per.size / 2)}%6.3fs max=${sortedT.last}%6.3fs")
    }
    pass("cold")
    pass("warm")
    // raw scheduler floor: an empty-ish job with no IO or codegen
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      spark.range(1000).repartition(cpus).count()
      println(f"[floor] raw 1-shuffle job $i: ${(System.nanoTime() - t0) / 1e9}%6.3fs")
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_DETAIL")) {
      // per-query cold/warm detail for the floor slice, slowest first
      val detail = names.map { q =>
        val c0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        val cold = (System.nanoTime() - c0) / 1e9
        val w0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        val warm = (System.nanoTime() - w0) / 1e9
        (q, cold, warm)
      }
      detail.sortBy(-_._3).foreach { case (q, c, w) =>
        println(f"[floor]   $q%-26s cold=$c%6.3f warm=$w%6.3f") }
    }
    spark.stop()
  }
}
