package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ReferencePipeline, RunLog}
import java.nio.file.Files

/** End-to-end parity with the reference's run() loop: one call lands
  * the validated hour-deduped batch idempotently and logs the run. */
class ReferencePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("pipeline cycle lands the batch once; re-runs insert zero and log both runs") {
    val base = Files.createTempDirectory("graft_pipeline").toString
    val target = base + "/grid_telemetry"
    val logDir = base + "/etl_runs"
    val expected = ReferencePipeline.insertBatch(spark, sf).count()

    val n1 = ReferencePipeline.run(spark, sf, target, logDir)
    assert(n1 == expected && n1 > 0)
    // the reference's duplicate-prevention: a second cycle over the
    // same feed inserts nothing and the table keeps unique hour keys
    val n2 = ReferencePipeline.run(spark, sf, target, logDir)
    assert(n2 == 0L)
    val landed = spark.read.parquet(target)
    assert(landed.count() == expected)
    assert(landed.select("hour_ts").distinct().count() == expected)

    // run log carries both cycles; the monitoring report sees 100%
    val report = RunLog.successReport(spark, logDir).collect()
    assert(report.map(_.getAs[Long]("total_runs")).sum == 2)
    assert(report.forall(_.getAs[Double]("success_rate_pct") == 100.0))
  }

  test("terminal failure is logged before propagating") {
    val base = Files.createTempDirectory("graft_pipeline_fail").toString
    intercept[Throwable] {
      ReferencePipeline.run(spark, "/nonexistent_sf_dir", base + "/t",
        base + "/runs", maxAttempts = 2, baseDelayMs = 1)
    }
    val log = spark.read.parquet(base + "/runs").collect()
    assert(log.length == 2 && log.forall(_.getAs[String]("status") == "failure"))
  }
}
