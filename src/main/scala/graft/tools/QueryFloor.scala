package graft.tools

/** Dev probe: decompose the toy-SF per-query floor for a sample of
  * light (memo-free) queries — DataFrame construction + analysis vs
  * execution, and the Spark job/stage counts behind each `count()`.
  * The bench wall at sf0.1 is ~85% per-query floor (the judge's own
  * r11 observation); this tool says which component that floor is,
  * so optimization effort lands where the time is. */
object QueryFloor {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.get(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    locally { // same warmup as Bench
      import org.apache.spark.sql.functions._
      graft.Tables.lineitem(spark, d).agg(sum("l_quantity")).collect()
      graft.Tables.events(spark, d).agg(sum("value")).collect()
      graft.Tables.orders(spark, d).agg(sum("o_totalprice")).collect()
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })
    // FILL=1: pre-run Memo.fill so the per-query numbers isolate the
    // query's own work (the bench's post-fill shape) instead of the
    // first query paying the whole memo chain
    if (sys.env.get("SPARK_GRAFT_QF_FILL").contains("1"))
      graft.Memo.fill(spark, d)
    val sample =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("etl_hourly_rollup", "etl_mad_outliers", "etl_benford",
        "etl_coverage", "etl_decay", "q1_pricing_summary", "q_rfm",
        "q_exact_median", "q16_supplier_cnt", "q2_min_cost_supplier",
        "q_abc_analysis", "q_basket_lift")
    println(f"${"query"}%-24s ${"build"}%7s ${"exec"}%7s jobs stages tasks taskMs")
    sample.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      df.queryExecution.assertAnalyzed()
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      // drain so the counters catch the last stage
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext, 5000L)
      println(f"$name%-24s ${(t1 - t0) / 1e9}%7.3f ${(t2 - t1) / 1e9}%7.3f " +
        f"${jobs.get}%4d ${stages.get}%6d ${tasks.get}%5d ${taskMs.get}%6d")
    }
    spark.stop()
  }
}
