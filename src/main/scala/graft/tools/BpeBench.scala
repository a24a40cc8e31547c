package graft.tools

import graft.GraftSession

/** Long-horizon BPE training probe: measures the wall time PER ROUND
  * over hundreds of merges and the executed-plan size of the merged-
  * words checkpoint — the evidence behind trainBpe's cost model ("a
  * 30k-merge run is 30k small jobs over a vocab-sized relation,
  * never a corpus rescan", VocabOps.trainBpe): if each round read
  * anything but the previous round's materialized checkpoint, the
  * per-round wall would GROW with the round number and the plan
  * would deepen; flat curves prove the per-round lineage cut.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BPE_STEPS=1000 \
  *     SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.tools.BpeBench"
  *
  * Prints ONE JSON line: per-100-round mean/max seconds buckets and
  * the sampled plan-node counts. */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val steps = sys.env.getOrElse("SPARK_GRAFT_BPE_STEPS", "1000").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    val t0 = System.nanoTime()
    val rows = graft.operators.VocabOps.bpeProbe(spark, d, steps,
      planEvery = math.max(1, steps / 10))
    val wall = (System.nanoTime() - t0) / 1e9
    def f(x: Double) = math.round(x * 1000) / 1000.0
    val buckets = rows.grouped(100).zipWithIndex.map { case (g, i) =>
      val secs = g.map(_._2)
      s"""{"upto":${(i + 1) * 100},"mean_sec":${f(secs.sum / secs.size)},""" +
        s""""max_sec":${f(secs.max)}}"""
    }.mkString("[", ",", "]")
    val plans = rows.filter(_._3 >= 0)
      .map { case (s2, _, n) => s"[$s2,$n]" }.mkString("[", ",", "]")
    graft.Memo.clear(spark)
    println(s"""{"metric":"bpe_probe","steps":$steps,"wall_sec":${f(wall)},""" +
      s""""sec_per_round_buckets":$buckets,"plan_nodes":$plans,""" +
      s""""sf":${graft.Bench.jsonStr(d)}}""")
    spark.stop()
  }
}
