package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Executes every SparkEntry query once, dumps the FINAL formatted
  * physical plan (post-AQE: what actually ran, with runtime join
  * conversions and real codegen ids) to target/plans/<name>.txt, and
  * prints a one-line-per-query summary of scan pushdown, join
  * strategies and the scale tripwires.
  *
  * Tripwire columns (both must stay 0 suite-wide; nonzero exits 1):
  *  - `cart`  — CartesianProductExec nodes: an unplanned cross join
  *    is O(N·M) at scale, never acceptable in this engine (the
  *    deliberate scalar-broadcast pattern plans as BNLJ-Cross over a
  *    ONE-ROW side, counted separately as bnljx).
  *  - `w0nb`  — partition-less Window nodes whose input subtree has
  *    NO bounding operator: every global window in this engine sits
  *    over either an explicit limit/top-k or a grouped aggregation
  *    onto a bounded key domain (≤32 arrival blocks, calendar
  *    hours/weeks — the §6 carve-out), so its input is constant-
  *    sized regardless of data volume. A partition-less window
  *    DIRECTLY over scan/join cardinality is the classic
  *    single-partition scale killer this detector exists to catch.
  *    (Heuristic: a grouped agg upstream counts as bounding — it
  *    attests the author reduced cardinality first; the reviewer
  *    checks the key domain, the tripwire checks the shape.)
  *
  * `wsc` counts DISTINCT `codegen id :` values in the final plan —
  * the number of whole-stage-codegen spans that really executed
  * (the pre-round-8 regex looked for the simple-mode node name,
  * which FormattedMode never prints, so it was constant 0).
  */
object ExplainAudit {

  /** Every node of the EXECUTED tree, recursing through the AQE
    * wrapper and materialized query-stage boundaries (both are
    * leaf-like: generic `children` stops at them). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec        => q +: allNodes(q.plan)
    case other                    => other +: other.children.flatMap(allNodes)
  }

  /** Input-bounded test for a partition-less window: some node below
    * it caps cardinality (limit / top-k) or reduces it to a key
    * domain (grouped aggregate). */
  private def bounded(p: SparkPlan): Boolean = allNodes(p).exists {
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec => true
    // the engine's bounded-heap top-k: ≤ k rows per key group
    // (vocab_coverage's head-of-Zipf curve windows over its output)
    case _: graft.plans.TopKPerKeyExec |
         _: graft.plans.TopKPerKeyPartialExec => true
    case a: BaseAggregateExec => a.groupingExpressions.nonEmpty
    case _ => false
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.forData(s"local[$cpus]", cpus, d)
    val outDir = Paths.get("target/plans")
    Files.createDirectories(outDir)
    val summary = new StringBuilder
    var violations = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        // execute the TRACKED plan (df.count() would build and run a
        // separate aggregate QueryExecution, leaving this one's AQE
        // un-finalized → isFinalPlan=false, no codegen ids)
        df.queryExecution.toRdd.count()
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
        val wsc = "codegen id : (\\d+)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        val nodes = allNodes(df.queryExecution.executedPlan)
        val wins = nodes.collect { case w: WindowExec => w }
        val w0 = wins.count(_.partitionSpec.isEmpty)
        val w0nb = wins.count(w => w.partitionSpec.isEmpty && !bounded(w.child))
        val cart = nodes.count { case _: CartesianProductExec => true
                                 case _ => false }
        violations += w0nb + cart + bnljBad
        summary ++= f"$name%-24s scans=${n("Scan parquet")}%d " +
          f"pushedFilters=${n("PushedFilters: \\[[^\\]]")}%d " +
          f"bhj=${n("BroadcastHashJoin")}%d smj=${n("SortMergeJoin")}%d " +
          f"bnljx=$bnljCross%d bnljBAD=$bnljBad%d " +
          f"exch=${n("Exchange")}%d wsc=$wsc%d " +
          f"w0=$w0%d w0nb=$w0nb%d cart=$cart%d\n"
      } catch { case e: Throwable =>
        violations += 1
        summary ++= s"$name FAILED: ${e.getMessage}\n"
      }
    }
    summary ++= s"VIOLATIONS (bnljBAD+w0nb+cart+failures): $violations\n"
    Files.writeString(outDir.resolve("SUMMARY.txt"), summary.toString)
    println(summary)
    spark.stop()
    if (violations > 0) sys.exit(1)
  }
}
