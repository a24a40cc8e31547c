package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Scratch profiler (dev tool, r13): run ONE named query cold after
  * warmup and print every stage's wall-relevant metrics (task time,
  * GC, spill, shuffle bytes, records) sorted by task time. */
object ProfileR13 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val qname = args.headOption.getOrElse("q_basket_lift")
    val spark = GraftSession.forData(s"local[$cpus]", cpus, d)
    case class St(id: Int, name: String, tasks: Int, wall: Double,
                  taskS: Double, gcS: Double, spM: Double, spD: Double,
                  shRead: Double, shWrite: Double, recIn: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo; val tm = i.taskMetrics
        if (tm != null) stages.add(St(i.stageId,
          i.name.takeWhile(_ != '\n').take(70), i.numTasks,
          (for {a <- i.completionTime; b <- i.submissionTime} yield (a - b) / 1e3).getOrElse(-1),
          tm.executorRunTime / 1e3, tm.jvmGCTime / 1e3,
          tm.memoryBytesSpilled / 1e9, tm.diskBytesSpilled / 1e9,
          tm.shuffleReadMetrics.totalBytesRead / 1e9,
          tm.shuffleWriteMetrics.bytesWritten / 1e9,
          tm.inputMetrics.recordsRead + tm.shuffleReadMetrics.recordsRead))
      }
    })
    Tables.lineitem(spark, d).agg(sum("l_quantity")).collect()
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext, 10000L)
    stages.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(qname)(spark, d).count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext, 10000L)
    import scala.jdk.CollectionConverters._
    val all = stages.asScala.toSeq
    println(f"[p13] $qname wall=$wall%.2f s, stages=${all.size}, " +
      f"taskSum=${all.map(_.taskS).sum}%.1fs gcSum=${all.map(_.gcS).sum}%.1fs " +
      f"spillM=${all.map(_.spM).sum}%.1fG spillD=${all.map(_.spD).sum}%.1fG")
    all.sortBy(-_.taskS).take(18).foreach { s =>
      println(f"[p13] st${s.id}%4d wall=${s.wall}%7.1fs task=${s.taskS}%8.1fs " +
        f"gc=${s.gcS}%6.1fs spM=${s.spM}%6.2fG spD=${s.spD}%6.2fG " +
        f"shR=${s.shRead}%6.2fG shW=${s.shWrite}%6.2fG rec=${s.recIn}%12d " +
        f"t=${s.tasks}%5d ${s.name}")
    }
    spark.stop()
  }
}
