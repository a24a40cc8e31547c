package graft.tools

import graft.{Checkpoints, GraftSession, Memo, SparkEntry}

/** Memory soak for the memo/checkpoint lifecycle: run the FULL query
  * suite N times in ONE session with [[Memo.clear]] between cycles
  * and assert executor block-manager storage returns to zero after
  * every clear — the proof that a long-lived library session (the
  * round-7/8 WeakReference registry design) neither leaks CacheManager
  * entries nor pins checkpoint blocks across build/clear cycles,
  * under the real GC pressure of a whole-suite run rather than a
  * spec-sized one.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SOAK_CYCLES=2 \
  *     sbt -batch "runMain graft.tools.MemSoak"
  *
  * Prints one JSON line per cycle (cached-RDD count and bytes before
  * and after the clear, still-reachable checkpoint handles) and a
  * final verdict line; exits 1 if any cycle fails to drain. Draining
  * is polled: Memo.clear unpersists non-blocking and the
  * ContextCleaner reclaims GC-cleared weak handles on its own
  * schedule, so the assertion is "reaches zero within the window",
  * not "zero immediately".
  */
object MemSoak {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val cycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "2").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)

    def snapshot(): (Int, Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    // poll until the block manager drains (unpersist is async; weak
    // checkpoint handles need a GC before the ContextCleaner sees
    // them) — returns the final snapshot
    def drain(deadlineMs: Long = 60000): (Int, Long, Long) = {
      val t0 = System.currentTimeMillis()
      var snap = snapshot()
      while (snap._1 > 0 && System.currentTimeMillis() - t0 < deadlineMs) {
        System.gc()
        Thread.sleep(500)
        snap = snapshot()
      }
      snap
    }

    var failed = false
    (1 to cycles).foreach { c =>
      val t0 = System.nanoTime()
      Memo.fill(spark, d)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, d).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[memsoak] $name FAILED: ${e.getMessage}")
        }
      }
      val before = snapshot()
      val liveBefore = Checkpoints.liveCount(spark)
      Memo.clear(spark)
      val after = drain()
      val liveAfter = Checkpoints.liveCount(spark)
      val secs = (System.nanoTime() - t0) / 1e9
      if (after._1 != 0) failed = true
      println(
        s"""{"cycle":$c,"sec":${math.round(secs * 10) / 10.0},""" +
          s""""before_rdds":${before._1},"before_mem":${before._2},""" +
          s""""before_disk":${before._3},"ckpt_handles":$liveBefore,""" +
          s""""after_rdds":${after._1},"after_mem":${after._2},""" +
          s""""after_disk":${after._3},"ckpt_after":$liveAfter}""")
    }
    println(s"""{"memsoak":"${if (failed) "FAIL" else "OK"}","cycles":$cycles}""")
    if (failed) sys.exit(1)
  }
}
