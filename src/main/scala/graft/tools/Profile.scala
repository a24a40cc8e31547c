package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.text
import graft.operators.{CorpusOps, DedupOps, TextOps}

/** Scratch profiler (dev tool, not part of the driver contract).
  * Times the clean_corpus composite stage by stage, cold, the way the
  * driver's bench hits it (first query of the dedup family fills the
  * Memo). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", cpus)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warmup like Bench
    Tables.documents(spark, d)
      .agg(sum(size(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))))
      .collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })
    def counters(name: String): Unit =
      println(s"[profile] $name jobs=${jobs.getAndSet(0)} stages=${stages.getAndSet(0)} taskTime=${taskMs.getAndSet(0)}ms")

    args.headOption.getOrElse("stages") match {
      case "cold" =>
        counters("warmup")
        time("clean_corpus COLD total")(CorpusOps.cleanCorpus(spark, d).count())
        counters("clean_corpus")
      case _ =>
        time("quality")(TextOps.quality(spark, d).count())
        time("fingerprint")(TextOps.fingerprint(spark, d).count())
        val m = classOf[DedupOps.type].getDeclaredMethods
          .find(_.getName == "shingleSets").get
        m.setAccessible(true)
        val sh = m.invoke(DedupOps, spark, d)
          .asInstanceOf[org.apache.spark.sql.DataFrame]
        time("shingleSets fill")(sh.count())
        time("ngramJaccard fill")(DedupOps.ngramJaccard(spark, d).count())
        time("clusters fill")(CorpusOps.clusters(spark, d).count())
        time("clean_corpus (memo warm)")(CorpusOps.cleanCorpus(spark, d).count())
    }
    spark.stop()
  }
}
