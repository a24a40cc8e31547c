package graft.tools

/** Micro-probe for the local-mode per-job floor: what does ONE Spark
  * job cost with no IO and no codegen novelty, as a function of task
  * count, shuffle presence, and AQE? (dev tool) */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.get(s"local[$cpus]", cpus)
    def t(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val n = 5
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[jobfloor] $name%-42s ${(System.nanoTime() - t0) / 1e9 / n}%7.4fs/job")
    }
    t("range(1e3) 1 partition, no shuffle") {
      spark.range(0, 1000, 1, 1).count(); ()
    }
    t(s"range(1e3) $cpus partitions, no shuffle") {
      spark.range(0, 1000, 1, cpus).count(); ()
    }
    t("range(1e3) 1p -> repartition(32) -> count") {
      spark.range(0, 1000, 1, 1).repartition(32).count(); ()
    }
    t("range(1e3) 1p -> groupBy(id%7).count -> count") {
      val df = spark.range(0, 1000, 1, 1)
        .selectExpr("id % 7 as k").groupBy("k").count()
      df.count(); ()
    }
    t("empty-relation count") {
      spark.emptyDataFrame.count(); ()
    }
    // schedule-only: a bare RDD job, no SQL machinery at all
    t(s"bare rdd job, $cpus tasks") {
      spark.sparkContext.parallelize(1 to 1000, cpus).count(); ()
    }
    t("bare rdd job, 1 task") {
      spark.sparkContext.parallelize(1 to 1000, 1).count(); ()
    }
    spark.stop()
  }
}
