package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.streaming.{StreamCdc, StreamSessionize, StreamingOps}

/** Memory/file-lifecycle soak for the STREAMING regime — the twin of
  * [[MemSoak]] (which covers the batch memo/checkpoint lifecycle) for
  * the RocksDB state stores and checkpoint/working dirs of the 10
  * streaming operators: each cycle starts, runs and stops every
  * streaming pipeline (rate source → real operator → noop sink,
  * RocksDB provider), deletes its own checkpoint dirs, then asserts
  *
  *   (a) executor block-manager storage drains to ZERO,
  *   (b) the session's on-disk working state (a dedicated
  *       spark.local.dir, which holds the RocksDB working dirs,
  *       shuffle and blockmgr files) returns to the post-cycle-1
  *       BASELINE — i.e. cycle-over-cycle file-count delta is zero:
  *       a stopped query's state-store providers must be unloaded
  *       (maintenance interval shortened so the soak observes it)
  *       and their RocksDB local dirs deleted,
  *   (c) no graft checkpoint handles remain registered.
  *
  *   SPARK_GRAFT_SOAK_CYCLES=2 SPARK_GRAFT_STREAM_SECS=4 \
  *     SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.tools.StreamSoak"
  *
  * Prints one JSON line per cycle and a final verdict; exits 1 on any
  * failed drain or cumulative growth. */
object StreamSoak {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val cycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "2").toInt
    val secsPer = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "4").toInt
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val root = s"/tmp/graft_streamsoak_${ProcessHandle.current().pid()}"
    val localDir = s"$root/local"
    new java.io.File(localDir).mkdirs()
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.local.dir", localDir)
      .config("spark.sql.streaming.stateStore.providerClass", RocksProvider)
      // stopped queries' providers unload on the maintenance tick;
      // shorten it so the soak can OBSERVE the unload instead of
      // racing the 60 s default
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "2s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- the events-shaped rate stream (StreamBench's shape, at a
    // soak-friendly rate: lifecycle is under test here, not ceiling)
    def rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "200000")
      .option("numPartitions", cpus.toString).load()
    val types = array(Seq("view", "click", "purchase", "refund", "error")
      .map(lit): _*)
    def events = rate.select(
      col("timestamp").as("ts"),
      (col("value") % 1000L).as("user_id"),
      col("value").as("event_id"),
      element_at(types, (col("value") % 5 + 1).cast("int")).as("event_type"),
      (col("value") % 100000L).cast("double") / 100.0 as "value")

    // one streaming form per registered §2.G operator
    def pipelines: Seq[(String, String, () => DataFrame)] = Seq(
      ("stream_tumbling", "append", () => events
        .withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "5 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))),
      ("stream_sliding", "append", () => events
        .withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "10 seconds", "2 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))),
      ("stream_topk", "complete", () => StreamingOps.rankWindows(events
        .groupBy(window(col("ts"), "5 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events")))),
      ("stream_dedup", "append", () => events
        .withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark("user_id", "event_type")),
      ("stream_sessionize", "append", () => StreamSessionize(
        events.select("user_id", "event_id", "ts", "value")
          .as[StreamSessionize.EvIn], gapMinutes = 30).toDF()),
      ("stream_session_native", "append", () => events
        .withWatermark("ts", "10 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "5 seconds"))
        .agg(count(lit(1)).as("n_events"))),
      ("stream_cdc", "update", () => StreamCdc(events
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("value", when(col("event_type") =!= StreamCdc.DeleteOp,
          col("event_id").cast("double")))
        .as[StreamCdc.ChangeIn]).toDF()),
      ("stream_enrich", "complete", () =>
        StreamingOps.enrichFromEvents(events, spark, d)),
      ("stream_zscore_alerts", "complete", () =>
        StreamingOps.zscoreAlertsImpl(events,
          graft.Tables.events(spark, d))),
      ("stream_join", "append", () => StreamingOps.intervalJoinImpl(
        events.filter(col("event_type") === "error"),
        events.filter(col("event_type") === "purchase"))))

    def snapshot(): (Int, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(_.memSize).sum + infos.map(_.diskSize).sum)
    }
    def localState(): (Long, Long) = {
      var files = 0L; var bytes = 0L
      def walk(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach { k =>
          if (k.isDirectory) walk(k)
          else { files += 1; bytes += k.length() }
        }
      }
      walk(new java.io.File(localDir))
      (files, bytes)
    }
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    // poll until block storage is empty AND the local-dir file count
    // stops shrinking (provider unload + RocksDB dir deletion run on
    // the maintenance tick)
    def drain(deadlineMs: Long = 120000): ((Int, Long), (Long, Long)) = {
      val t0 = System.currentTimeMillis()
      var rdds = snapshot(); var files = localState()
      var stable = 0
      while ((rdds._1 > 0 || stable < 3) &&
          System.currentTimeMillis() - t0 < deadlineMs) {
        System.gc()
        Thread.sleep(2000)
        val f2 = localState()
        stable = if (f2 == files) stable + 1 else 0
        files = f2
        rdds = snapshot()
      }
      (rdds, files)
    }

    var failed = false
    var baseline: Option[(Long, Long)] = None
    (1 to cycles).foreach { c =>
      val t0 = System.nanoTime()
      pipelines.foreach { case (name, mode, mk) =>
        try {
          val q = mk().writeStream.format("noop")
            .option("checkpointLocation", s"$root/ck/$c/$name")
            .outputMode(mode).start()
          Thread.sleep(secsPer * 1000L)
          try q.stop() catch { case _: Throwable => () }
        } catch { case e: Throwable =>
          failed = true
          System.err.println(s"[streamsoak] $name FAILED: ${e.getMessage}")
        }
      }
      rm(new java.io.File(s"$root/ck/$c"))
      graft.Memo.clear(spark)
      val (rdds, files) = drain()
      val ckpt = graft.Checkpoints.liveCount(spark)
      val secs = (System.nanoTime() - t0) / 1e9
      val deltaFiles = baseline.map(b => files._1 - b._1)
      val deltaBytes = baseline.map(b => files._2 - b._2)
      if (rdds._1 != 0 || ckpt != 0 || deltaFiles.exists(_ != 0L)) failed = true
      if (baseline.isEmpty) baseline = Some(files)
      println(
        s"""{"cycle":$c,"sec":${math.round(secs * 10) / 10.0},""" +
          s""""after_rdds":${rdds._1},"after_bytes":${rdds._2},""" +
          s""""local_files":${files._1},"local_bytes":${files._2},""" +
          s""""delta_files":${deltaFiles.getOrElse(0L)},""" +
          s""""delta_bytes":${deltaBytes.getOrElse(0L)},""" +
          s""""ckpt_handles":$ckpt}""")
    }
    println(s"""{"streamsoak":"${if (failed) "FAIL" else "OK"}","cycles":$cycles}""")
    spark.stop()
    rm(new java.io.File(root))
    if (failed) sys.exit(1)
  }
}
