package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The reference job END-TO-END (etl_job.py:186-293 `run()`):
  * validate → keep-first-per-hour → idempotent keyed insert → run
  * log, with bounded exponential-backoff retry around the whole
  * cycle — the same stage composition the reference's hourly cron
  * executes, as ONE distributed call. A reference user's entire
  * deployment maps to `ReferencePipeline.run(...)` per cycle plus
  * `RunLog.successReport` for the monitoring queries.
  */
object ReferencePipeline {

  /** The insert batch the reference builds per cycle: rows passing
    * the data-quality gates (etl_job.py:51-72), reduced to the first
    * event of each hour (etl_job.py:227-237). */
  def insertBatch(s: SparkSession, d: String): DataFrame = {
    val flags = EtlOps.validate(s, d).select(col("event_id"), col("is_valid"))
    val w = Window.partitionBy(col("hour_ts")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .join(flags, "event_id")
      .filter(col("is_valid"))
      .withColumn("hour_ts", date_trunc("hour", col("ts")).cast("timestamp_ntz"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("hour_ts", "event_id", "ts", "event_type", "value")
  }

  private val insertBatchSql =
    s"""WITH valid AS (
       |  SELECT event_id FROM events
       |  WHERE value IS NOT NULL AND value >= 0.0 AND value <= 1000.0
       |    AND event_type IN ${EtlOps.knownTypesSql} AND ts IS NOT NULL)
       |SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
       |       event_id, cast(ts as timestamp) AS ts, event_type, value
       |FROM events
       |WHERE event_id IN (SELECT event_id FROM valid)
       |QUALIFY row_number() OVER (PARTITION BY date_trunc('hour', ts)
       |                           ORDER BY ts, event_id) = 1""".stripMargin

  /** One ingest cycle: land the validated hour-deduped batch into
    * `targetDir` (skipping hours already present — re-runs insert
    * zero), append a run record to `logDir`, retry transient failures
    * with 2^attempt backoff, propagate the terminal failure after
    * logging it. Returns rows inserted.
    *
    * Status domain mirrors the reference's etl_runs
    * (etl_job.py:213-218,236-238,262): `partial` when data-quality
    * validation failed for some input rows, `skipped` when the cycle
    * inserted nothing (every hour already present — the idempotent
    * re-run), `success` otherwise, `failure` on error. DELIBERATE
    * DIVERGENCE, documented: the reference still inserts the
    * UNVALIDATED row on a partial run (etl_job.py:218 falls through
    * to the insert) and then overwrites `partial` with `success` on
    * insert (etl_job.py:262), so `partial` is unobservable on its
    * happy path; graft lands only the rows that passed validation
    * and KEEPS the `partial` record visible — known-bad telemetry
    * never reaches downstream aggregates, and the monitoring surface
    * actually reports the degradation the status exists to flag. */
  def run(spark: SparkSession, sfDir: String, targetDir: String,
          logDir: String, maxAttempts: Int = 3,
          baseDelayMs: Long = 100L): Long = {
    val t0 = System.nanoTime()
    def ms = (System.nanoTime() - t0) / 1000000L
    var attempt = 0
    var delay = baseDelayMs
    var inserted = -1L
    while (inserted < 0) {
      attempt += 1
      try {
        // one tiny aggregate decides partial vs success (the
        // reference's all(validations) gate, etl_job.py:204-218)
        val invalid = EtlOps.validate(spark, sfDir)
          .filter(!col("is_valid")).count()
        val n = Upsert.upsertByKey(spark, insertBatch(spark, sfDir),
          targetDir, Seq("hour_ts"))
        val status =
          if (n == 0L) "skipped"
          else if (invalid > 0L) "partial"
          else "success"
        RunLog.record(spark, logDir, s"ingest_cycle attempt=$attempt",
          status, n, ms,
          if (invalid > 0L) Some(s"Data quality validation failed: $invalid rows dropped")
          else None)
        inserted = n
      } catch {
        case e: Throwable =>
          RunLog.record(spark, logDir, s"ingest_cycle attempt=$attempt",
            "failure", 0L, ms, Some(String.valueOf(e.getMessage)))
          if (attempt >= maxAttempts) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    inserted
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_pipeline" -> (insertBatch _))

  val oracle: Map[String, String] = Map(
    "etl_pipeline" -> insertBatchSql)
}
