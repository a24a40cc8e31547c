package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{DedupFeatureStore, DedupOps, MultimodalOps}

/** Scratch profiler for the round-11 hot spots: stage-by-stage wall
  * for the mm_semantic verdict chain and the store-fold lifecycle
  * (dev tool, not part of the driver contract). */
object ProfileR11 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def time[T](name: String)(f: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  jobs=${jobs.get() - j0}")
      r
    }
    // warmup
    graft.Tables.documents(spark, d).count()

    // ---- mm_semantic chain (round-12 rep-collapsed path)
    val feats = time("media_feats (memo fill)") {
      val f = MultimodalOps.mediaFeatsMemo(spark, d); f.count(); f
    }
    val grp = feats.groupBy(col("sha")).agg(min(col("doc_id")).as("rep_id"))
    val nDocs = feats.count()
    val nReps = time("sha groups")(grp.count())
    println(s"[profile]   docs=$nDocs distinct payloads=$nReps")
    val repFeats = feats.join(
      grp.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val banded = repFeats.select(col("doc_id"),
      posexplode(col("bvs")).as(Seq("tbl", "bv")))
    val cand = time("bucketCandidates (rep space)") {
      val c = DedupOps.bucketCandidates(banded, Seq("tbl", "bv"), "doc_id", 256)
      println(s"[profile]   rep-space cand rows=${c.count()}")
      c
    }
    time("mm_semantic full verdict") {
      MultimodalOps.mmSemantic(spark, d).count()
    }

    // ---- text-dedup candidate streams (round-12 verdict item 3:
    // does GenScale replication make any of them quadratic?)
    time("ngram_jaccard pairs") {
      val c = DedupOps.ngramJaccard(spark, d).count()
      println(s"[profile]   ngram pairs(tau)=$c")
    }
    time("dedup_minhash_lsh rows") {
      val c = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, d).count()
      println(s"[profile]   minhash rows=$c")
    }
    time("dedup_simhash rows") {
      val c = DedupOps.simhash(spark, d).count()
      println(s"[profile]   simhash rows=$c")
    }
    time("dedup_embedding rows") {
      val c = graft.SparkEntry.queries("dedup_embedding")(spark, d).count()
      println(s"[profile]   embedding rows=$c")
    }
    time("mm_dedup_phash rows") {
      val c = graft.SparkEntry.queries("mm_dedup_phash")(spark, d).count()
      println(s"[profile]   phash pair rows=$c")
    }

    // ---- store fold lifecycle
    val docs = DedupOps.docsParallel(spark, d).select("doc_id", "text")
    val mx = docs.agg(max(col("doc_id")).as("mx_id"))
    def slice(lo: Int, hi: Int) =
      docs.crossJoin(broadcast(mx))
        .filter(col("doc_id") * 10 > col("mx_id") * lo &&
          col("doc_id") * 10 <= col("mx_id") * hi)
        .drop("mx_id")
    val base0 = docs.crossJoin(broadcast(mx))
      .filter(col("doc_id") * 10 <= col("mx_id") * 8).drop("mx_id")
    val store = time("store build (seed 80%)") {
      DedupFeatureStore.build(base0, s"/tmp/graft_profile_store_${ProcessHandle.current().pid()}")
    }
    time("fold gen1 (10%)")(store.fold(slice(8, 9), 1L).count())
    // fold gen2, step by step
    val f = time("  featurize (3 ckpt)")(store.featurize(slice(9, 10)))
    val (kn, kd, kb) = time("  probeBuckets")(store.probeBuckets(f))
    time("  supersede write")(store.supersede(f.ids, 2L, kd))
    time("  append 4 tables")(store.append(f, 2L))
    time("  verdictOf count")(store.verdictOf(f, 2L, kn, kb).count())
    spark.stop()
  }
}
