package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Keys≈rows survival probe for the size-gated per-key cap (round-9
  * verdict item 3): plants a banded relation of `SPARK_GRAFT_GATE_ROWS`
  * (default 100M) rows where essentially EVERY (band, bh) bucket is
  * unique — the adversarial shape for the blanket bounded-heap, whose
  * per-key heap map would copy ~the whole relation into non-spillable
  * Scala objects — plus one planted hot bucket of 100k members, and
  * drives it through the REAL `DedupOps.bucketCandidates` path (the
  * gated `topk.capPerKey` + rep-capped pair join) at the bench heap
  * (run with SPARK_DRIVER_MEM=16g). Survival = the run completes and
  * the candidate count equals the closed form: the unique buckets
  * emit nothing, the hot bucket emits cap·(members−cap) + C(cap,2)
  * ordered pairs.
  *
  *   SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=16 \
  *     sbt -batch "runMain graft.tools.CapGateSoak"
  *
  * Prints ONE JSON line; exits 1 on a wrong count (an OOM kills the
  * JVM before any line — that IS the failure signal). */
object CapGateSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_GATE_ROWS", "100000000").toLong
    val hot = 100000L
    val cap = 256
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    import spark.implicits._
    val uniq = spark.range(rows).select(
      (col("id") % 16).cast("int").as("band"),
      col("id").as("bh"), col("id").as("doc_id"))
    val hotB = spark.range(hot).select(
      lit(0).as("band"), lit(-1L).as("bh"),
      (col("id") + rows).as("doc_id"))
    val t0 = System.nanoTime()
    val n = graft.operators.DedupOps
      .bucketCandidates(uniq.unionByName(hotB), Seq("band", "bh"), "doc_id", cap)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    // hot bucket of H members, rep cap c: reps = c lowest ids; pairs =
    // each rep with every LARGER member = c·(H−c) cross + C(c,2) within
    val want = cap.toLong * (hot - cap) + cap.toLong * (cap - 1) / 2
    val ok = n == want
    println(s"""{"capgate":"${if (ok) "OK" else "FAIL"}","rows":$rows,""" +
      s""""hot":$hot,"cap":$cap,"pairs":$n,"want":$want,""" +
      s""""sec":${math.round(secs * 10) / 10.0},""" +
      s""""heap_max_mb":${Runtime.getRuntime.maxMemory() / 1048576}}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
