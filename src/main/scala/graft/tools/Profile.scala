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
    val spark = GraftSession.forData(s"local[$cpus]", cpus, d)
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
    val stageDetail = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        stageDetail.add((s.stageInfo.stageId,
          s.stageInfo.taskMetrics.executorRunTime,
          s"tasks=${s.stageInfo.numTasks} " +
            s.stageInfo.name.takeWhile(_ != '\n').take(80)))
      }
    })
    def counters(name: String): Unit = {
      println(s"[profile] $name jobs=${jobs.getAndSet(0)} stages=${stages.getAndSet(0)} taskTime=${taskMs.getAndSet(0)}ms")
      if (sys.env.contains("SPARK_GRAFT_STAGES")) {
        import scala.jdk.CollectionConverters._
        stageDetail.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (id, ms, n) =>
          println(f"[profile]   stage $id%4d $ms%8d ms  $n")
        }
      }
      stageDetail.clear()
    }

    args.headOption.getOrElse("stages") match {
      case "cold" =>
        counters("warmup")
        time("clean_corpus COLD total")(CorpusOps.cleanCorpus(spark, d).count())
        counters("clean_corpus")
      case "rollhash" =>
        val docs = DedupOps.docsParallel(spark, d)
        docs.count()
        val toks = docs.select(col("doc_id"),
          explode(text.tokens(col("text"))).as("tok"))
        toks.count() // warm tokens
        for (round <- 1 to 3) {
          time(s"native  r$round")(
            toks.select(text.rollingHash(col("tok")).as("h"))
              .agg(sum("h")).collect())
          time(s"builtin r$round")(
            toks.select(text.rollingHashBuiltin(col("tok")).as("h"))
              .agg(sum("h")).collect())
        }
      case "simhash-cold" =>
        counters("warmup")
        time("simhash COLD first")(DedupOps.simhash(spark, d).count())
        counters("simhash-cold")
        val df2 = DedupOps.simhash(spark, d)
        time("simhash second")(df2.count())
        counters("simhash-second")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/simhash_plan.txt"),
          df2.queryExecution.executedPlan.toString)
      case "simhash" =>
        counters("warmup")
        val docs = DedupOps.docsParallel(spark, d)
        time("docsParallel")(docs.count())
        val tok = docs
          .select(col("doc_id"), explode(text.tokens(col("text"))).as("tok"))
          .withColumn("fp", text.rollingHash(col("tok")))
        time("tokenize+fp")(tok.count())
        time("tokenize+fp again")(tok.count())
        val one = tok.groupBy("doc_id")
          .agg(sum(when((col("fp") * 3L + 7L) % 1000000007L % 2 === 1, 1)
            .otherwise(-1)).as("b0"))
        time("1-bit vote agg")(one.count())
        counters("pre")
        val m64 = classOf[DedupOps.type].getDeclaredMethods
          .find(_.getName == "simhashSignatures").get
        m64.setAccessible(true)
        val sig = m64.invoke(DedupOps, docs)
          .asInstanceOf[org.apache.spark.sql.DataFrame]
        time("signatures (64-bit agg)")(sig.count())
        counters("signatures")
        time("simhash FULL cold")(DedupOps.simhash(spark, d).count())
        counters("simhash")
        time("simhash warm")(DedupOps.simhash(spark, d).count())
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
