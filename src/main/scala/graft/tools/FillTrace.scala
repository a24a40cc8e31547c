package graft.tools

/** Dev probe: run the bench's Memo.fill phase alone and print each
  * fill's absolute start/end offsets, so the critical chain behind
  * the fill WALL is readable (per-fill durations in the bench
  * artifact include cross-lane waits and hide it). */
object FillTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.forData(s"local[$cpus]", cpus, sfDir)
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench so fills see warmed scans
    locally {
      import org.apache.spark.sql.functions._
      graft.Tables.lineitem(spark, sfDir).agg(sum("l_quantity")).collect()
      graft.Tables.documents(spark, sfDir).count()
      graft.Tables.embeddings(spark, sfDir).count()
    }
    val t0 = System.nanoTime()
    graft.Memo.trace = Some { (name, start, end) =>
      println(f"[filltrace] ${(start - t0) / 1e9}%7.2f -> ${(end - t0) / 1e9}%7.2f  (${(end - start) / 1e9}%6.2f)  $name")
    }
    val fills = graft.Memo.fill(spark, sfDir)
    println(f"[filltrace] WALL ${(System.nanoTime() - t0) / 1e9}%.2f s over ${fills.size} fills")
    spark.stop()
  }
}
