package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.DedupFeatureStore
import graft.streaming.StreamingOps

/** Long-horizon soak for the STORE-BACKED streaming ingest — the
  * lifecycle StreamSoak (start/stop churn) does not cover: hundreds
  * of micro-batches folded into ONE [[DedupFeatureStore]] through the
  * real [[StreamingOps.ingestDedup]] path, with the generation
  * compaction cadence a production deployment would run. Asserts:
  *
  *   (a) per-fold wall stays FLAT across the run (last-K mean within
  *       a JIT/GC tolerance of the first-K mean after warmup) — the
  *       bucket-pruned scans + periodic [[DedupFeatureStore
  *       .compactGenerations]] keep per-batch cost independent of how
  *       many batches came before;
  *   (b) store file count is LINEAR between compactions and BOUNDED
  *       after each one (the small-files listing term is the one
  *       per-fold cost that grows with generations — compaction is
  *       its designed bound);
  *   (c) no driver growth: used heap after GC at the end within
  *       bounds of the start, zero live checkpoint handles after
  *       Memo.clear;
  *   (d) correctness holds throughout: every batch plants a twin of a
  *       PRIOR batch's doc and re-sends one id — both must verdict
  *       as dups every single batch.
  *
  *   SPARK_GRAFT_STORE_BATCHES=200 SPARK_GRAFT_CPUS=16 \
  *     sbt -batch "runMain graft.tools.StoreSoak"
  *
  * Prints progress lines and ONE final JSON object; exits 1 on any
  * violated bound. */
object StoreSoak {

  private def words(seed: Int, n: Int) =
    (0 until n).map(i => s"w${(seed * 131 + i * 17) % 8191}x$i").mkString(" ")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_STORE_BATCHES", "200").toInt
    val compactEvery =
      sys.env.getOrElse("SPARK_GRAFT_STORE_COMPACT_EVERY", "50").toInt
    val docsPerBatch = 20
    val root = s"/tmp/graft_storesoak_${ProcessHandle.current().pid()}"
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def filesUnder(dir: String): Long = {
      def walk(f: java.io.File): Long = {
        val kids = f.listFiles()
        if (kids == null) 0L
        else kids.map(k => if (k.isDirectory) walk(k)
          else if (k.getName.endsWith(".parquet")) 1L else 0L).sum
      }
      walk(new java.io.File(dir))
    }
    def usedHeapMb(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }

    // seed corpus: 500 docs
    val storePath = s"$root/store"
    val seed = (1 to 500).map(i => (i.toLong, words(i, 20)))
      .toDF("doc_id", "text")
    val store = DedupFeatureStore.build(seed, storePath)

    val mem = MemoryStream[(Long, String)]
    val walls = new Array[Double](batches)
    val fileCurve = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val heapCurve = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var dupMisses = 0
    var lastVerdict = Map.empty[Long, String]
    val q = StreamingOps.ingestDedup(
        mem.toDF().toDF("doc_id", "text"), store,
        Some(s"$root/ck")) { (_, verdict) =>
      lastVerdict = verdict.collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    try {
      val heap0 = usedHeapMb()
      heapCurve += ((0, heap0))
      for (b <- 0 until batches) {
        // fresh docs + one twin of the PREVIOUS batch's first doc (or
        // of a seed doc for batch 0) + one re-sent id (doc 1 with
        // batch-varying text — exercises supersession every batch)
        val ids = (0 until docsPerBatch)
          .map(i => (10000L + b * 100L + i, words(20000 + b * 97 + i, 20)))
        val twinSrc = if (b == 0) words(7, 20)
          else words(20000 + (b - 1) * 97, 20)
        val batch = ids ++ Seq(
          (90000L + b, twinSrc.replace("x3", "edit3")),
          (1L, words(30000 + b, 20)))
        val t0 = System.nanoTime()
        mem.addData(batch)
        q.processAllAvailable()
        walls(b) = (System.nanoTime() - t0) / 1e9
        val twinOk = lastVerdict.get(90000L + b).contains("near_dup")
        val resentOk = lastVerdict.contains(1L)
        if (!twinOk || !resentOk) {
          dupMisses += 1
          System.err.println(s"[storesoak] batch $b verdict miss: " +
            s"twin=${lastVerdict.get(90000L + b)} resent=${lastVerdict.get(1L)}")
        }
        if ((b + 1) % 10 == 0) fileCurve += ((b + 1, filesUnder(storePath)))
        if ((b + 1) % compactEvery == 0) {
          store.compactGenerations(store.maxGen)
          fileCurve += ((b + 1, filesUnder(storePath)))
          heapCurve += ((b + 1, usedHeapMb()))
          System.err.println(s"[storesoak] batch ${b + 1}: compacted, " +
            s"files=${filesUnder(storePath)}, " +
            s"wall(last10)=${walls.slice(b - 9, b + 1).sum / 10.0}")
        }
      }
    } finally q.stop()

    graft.Memo.clear(spark)
    val ckpt = graft.Checkpoints.liveCount(spark)
    val heapEnd = usedHeapMb()
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    // warmup excluded: compare steady-state early window vs final window
    val w0 = mean(walls.slice(10, 30).toSeq)
    val w1 = mean(walls.slice(batches - 20, batches).toSeq)
    val filesEnd = filesUnder(storePath)
    val filesPostCompact = fileCurve.filter(_._1 % compactEvery == 0).map(_._2)
    val boundedFiles = filesPostCompact.nonEmpty &&
      filesPostCompact.last <= filesPostCompact.head * 3
    val flat = w1 <= w0 * 2.0
    val heapOk = heapEnd <= heapCurve.head._2 + 1500
    val ok = flat && boundedFiles && heapOk && dupMisses == 0 && ckpt == 0
    def arr(xs: Seq[(Int, Long)]) =
      xs.map { case (b, v) => s"[$b,$v]" }.mkString("[", ",", "]")
    println(
      s"""{"storesoak":"${if (ok) "OK" else "FAIL"}","batches":$batches,""" +
        s""""docs_per_batch":${docsPerBatch + 2},""" +
        s""""compact_every":$compactEvery,""" +
        s""""wall_mean_early":${math.round(w0 * 1000) / 1000.0},""" +
        s""""wall_mean_late":${math.round(w1 * 1000) / 1000.0},""" +
        s""""wall_flat":$flat,""" +
        s""""files_curve":${arr(fileCurve.toSeq)},""" +
        s""""files_end":$filesEnd,"files_bounded":$boundedFiles,""" +
        s""""heap_curve_mb":${arr(heapCurve.toSeq)},""" +
        s""""heap_end_mb":$heapEnd,"heap_ok":$heapOk,""" +
        s""""dup_misses":$dupMisses,"ckpt_handles":$ckpt}""")
    spark.stop()
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root))
    if (!ok) sys.exit(1)
  }
}
