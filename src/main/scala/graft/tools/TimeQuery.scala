package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev profiling aid: time named SparkEntry queries in one JVM.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.TimeQuery q7_volume_shipping q5_local_supplier"
  *
  * Each query is timed cold-in-session (first run) and again warm, so
  * plan-shape cost separates from scan/codegen warmup. No args → the
  * 10 slowest from a full pass.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.forData(s"local[$cpus]", cpus, sfDir)
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    if (args.nonEmpty) {
      val showPlan = sys.env.contains("SPARK_GRAFT_FINAL_PLAN")
      args.foreach { q =>
        val cold = time(q)
        // keep the warm run's DataFrame so plan mode reads ITS
        // executed plan instead of running the query a third time
        val warmDf = SparkEntry.queries(q)(spark, sfDir)
        val t0 = System.nanoTime()
        warmDf.count()
        val warm = (System.nanoTime() - t0) / 1e9
        println(f"[timequery] $q%-28s cold=$cold%7.2fs warm=$warm%7.2fs")
        if (showPlan) {
          // AQE rewrites the plan during execution; executedPlan after
          // the action above shows the FINAL join strategies
          val p = warmDf.queryExecution.executedPlan.toString
          val smj = "SortMergeJoin".r.findAllIn(p).length
          val bhj = "BroadcastHashJoin".r.findAllIn(p).length
          println(s"[timequery] $q final-plan smj=$smj bhj=$bhj")
          // full post-AQE tree on demand (plan-shape debugging)
          if (sys.env.contains("SPARK_GRAFT_FULL_PLAN")) println(p)
        }
      }
    } else {
      val all = SparkEntry.queries.keys.toSeq.sorted.map(q => q -> time(q))
      all.sortBy(-_._2).take(10).foreach { case (q, t) =>
        println(f"[timequery] $q%-28s $t%7.2fs")
      }
    }
    graft.Memo.clear(spark)
    spark.stop()
  }
}
