package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ETL run-metadata tracking — the reference's `etl_runs` table
  * (etl_job.py:152-182: status, rows_inserted, execution_time_ms,
  * error_message) as a Spark-native pipeline wrapper.
  *
  * `RunLog.timed` executes a pipeline stage (any DataFrame → sink
  * action), measures it, and appends one run record to an append-only
  * parquet log — the same schema the reference keeps in Postgres.
  * Append-mode parquet keeps the log write contention-free on a
  * cluster (one small file per run; compact periodically). The
  * monitoring queries over it are the reference's own
  * (success-rate-per-day: EtlOps.successRate shape). */
object RunLog {

  /** Status domain = the reference's (etl_job.py:187,218,238,262):
    * `success` | `partial` (validation dropped rows; see
    * ReferencePipeline.run) | `skipped` (idempotent re-run inserted
    * nothing) | `failure`. */
  case class Run(run_timestamp: Timestamp, name: String, status: String,
                 rows_inserted: Long, execution_time_ms: Long,
                 error_message: Option[String])

  /** Run `stage`, append its outcome to `logDir`. Returns the row
    * count on success; the failure record is written BEFORE the
    * exception propagates (mirroring the reference's rollback+log
    * path, etl_job.py:269-274). */
  def timed(spark: SparkSession, logDir: String, name: String)
           (stage: => DataFrame): Long = {
    val t0 = System.nanoTime()
    def ms = (System.nanoTime() - t0) / 1000000L
    try {
      val out = stage
      val n = out.count()
      append(spark, logDir, Run(now(), name, "success", n, ms, None))
      n
    } catch {
      case e: Throwable =>
        append(spark, logDir,
          Run(now(), name, "failure", 0L, ms, Some(String.valueOf(e.getMessage))))
        throw e
    }
  }

  /** Bounded exponential-backoff retry around a pipeline stage — the
    * reference's transient-failure semantics (etl_job.py:35-49:
    * fetch_with_retry, 2^attempt backoff). Every failed attempt is
    * logged as its own failure record before the backoff sleep (the
    * log is the observability surface, exactly as the reference logs
    * each retry); the terminal failure propagates. */
  def timedWithRetries(spark: SparkSession, logDir: String, name: String,
                       maxAttempts: Int = 3, baseDelayMs: Long = 100L)
                      (stage: => DataFrame): Long = {
    var attempt = 0
    var delay = baseDelayMs
    var out = -1L
    while (out < 0) {
      attempt += 1
      try out = timed(spark, logDir, s"$name attempt=$attempt")(stage)
      catch {
        case e: Throwable =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    out
  }

  /** Append one explicit run record — for writers that measure their
    * own action (e.g. Upsert.upsertByKeyLogged). */
  def record(spark: SparkSession, logDir: String, name: String, status: String,
             rows: Long, ms: Long, error: Option[String]): Unit =
    append(spark, logDir, Run(now(), name, status, rows, ms, error))

  private def now() = new Timestamp(System.currentTimeMillis())

  private def append(spark: SparkSession, logDir: String, run: Run): Unit = {
    import spark.implicits._
    Seq(run).toDS().write.mode(SaveMode.Append).parquet(logDir)
  }

  /** The reference's monitoring query over the log
    * (README.md:553-563): per-day run counts, success rate, mean
    * latency — over the reference's 7-day recency window
    * (README.md:178,561), anchored to the log's max timestamp so the
    * report is deterministic for a static log. */
  def successReport(spark: SparkSession, logDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val log = spark.read.parquet(logDir)
    val mx = log.agg(max(col("run_timestamp")).as("max_ts"))
    log.crossJoin(broadcast(mx))
      .filter(col("run_timestamp") >= col("max_ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(to_date(col("run_timestamp")).as("day"))
      .agg(
        count(lit(1)).as("total_runs"),
        sum(when(col("status") === "success", 1L).otherwise(0L)).as("successful_runs"),
        round(sum(when(col("status") === "success", 1L).otherwise(0L)) * 100.0 /
          count(lit(1)), 2).as("success_rate_pct"),
        avg(col("execution_time_ms")).as("avg_execution_ms"))
  }
}
