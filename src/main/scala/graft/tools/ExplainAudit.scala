package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Dumps the formatted physical plan of every SparkEntry query to
  * target/plans/<name>.txt plus a one-line-per-query summary of scan
  * pushdown and join strategies (dev tool for the plan audit). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("local[8]", 8)
    val outDir = Paths.get("target/plans")
    Files.createDirectories(outDir)
    val summary = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"$name.txt"), plan)
        def n(pat: String) = pat.r.findAllIn(plan).length
        // bnljx: BroadcastNestedLoopJoin CROSS sites — the deliberate
        // one-row/bounded scalar-broadcast pattern (global aggregate
        // crossJoin(broadcast(...))-ed back over a scan). bnljBAD:
        // any OTHER BNLJ join type — an unplanned inequality join
        // that would explode at scale; must stay 0.
        val bnljCross = n("BroadcastNestedLoopJoin Cross")
        val bnljBad =
          "(?m)^\\(\\d+\\) BroadcastNestedLoopJoin\\n(?:.*\\n)??Join type: (?!Cross).*".r
            .findAllIn(plan).length
        summary ++= f"$name%-24s scans=${n("Scan parquet")}%d " +
          f"pushedFilters=${n("PushedFilters: \\[[^\\]]")}%d " +
          f"bhj=${n("BroadcastHashJoin")}%d smj=${n("SortMergeJoin")}%d " +
          f"bnljx=$bnljCross%d bnljBAD=$bnljBad%d " +
          f"exch=${n("Exchange")}%d wsc=${n("WholeStageCodegen")}%d\n"
      } catch { case e: Throwable =>
        summary ++= s"$name FAILED: ${e.getMessage}\n"
      }
    }
    Files.writeString(outDir.resolve("SUMMARY.txt"), summary.toString)
    println(summary)
    spark.stop()
  }
}
