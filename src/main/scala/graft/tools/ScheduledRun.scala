package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{IncrementalRollup, IngestOps, ReferencePipeline, RunLog}
import graft.sources.HttpFeed

/** The reference deployment's CRON ENTRYPOINT, cluster-shaped — what
  * its hourly GitHub Actions schedule executes
  * (`/root/reference/README.md`, docs/GITHUB_ACTIONS_SETUP.md), as
  * one Spark main a scheduler invokes per cycle:
  *
  *   fetch (live HTTP, optional) → validate → hour-dedup →
  *   idempotent upsert → run log → incremental rollup maintenance.
  *
  * {{{
  * sbt "runMain graft.tools.ScheduledRun <eventsDir> <warehouseDir> [feedUrl]"
  * }}}
  *
  * Layout under `warehouseDir`:
  *  - `grid_telemetry/` — the keyed telemetry table
  *    (Upsert.upsertByKey: re-runs insert zero duplicate hours)
  *  - `etl_runs/`       — append-only run records
  *    (success/partial/skipped/failure, reference status domain)
  *  - `feed_log/`       — raw fetched payloads w/ attempt counts
  *    (only when a feedUrl is given)
  *  - `rollup_state/v=K/` — versioned combinable rollup snapshots:
  *    each cycle reads the max K, folds ONLY the newly-landed hours
  *    in (IncrementalRollup.merge — untouched state rows pass
  *    through, never re-aggregated), and writes K+1. Snapshot-
  *    versioning instead of overwrite-in-place: a cycle that dies
  *    mid-write leaves K intact (the reference's DB transaction
  *    played in object-storage terms), and at 100 TB the merge cost
  *    tracks the DELTA, not history.
  *
  * ScheduledRunSpec proves two-cycle idempotence end-to-end: the
  * second identical cycle inserts zero rows, logs `skipped`, and
  * produces a rollup state bit-identical to the first — and that the
  * maintained state always equals a from-scratch recompute.
  */
object ScheduledRun {

  final case class CycleReport(inserted: Long, stateVersion: Int,
                               stateRows: Long, fetched: Long)

  private def stateDir(warehouse: String) = s"$warehouse/rollup_state"

  private[graft] def currentVersion(warehouse: String): Int = {
    val d = Paths.get(stateDir(warehouse))
    if (!Files.isDirectory(d)) 0
    else {
      val vs = Files.list(d).toArray.map(_.toString.split('/').last)
        .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toInt)
      if (vs.isEmpty) 0 else vs.max
    }
  }

  /** One scheduled cycle. Idempotent by construction: every leg
    * either keys on already-present data (upsert, rollup delta) or
    * appends an audit record that SHOULD accumulate (run log,
    * feed log). */
  def cycle(spark: SparkSession, eventsDir: String, warehouse: String,
            feedUrl: Option[String] = None): CycleReport = {
    // 1. live leg (reference fetch_intensity/fetch_generation_mix):
    //    retried GET → parse → land the audit row. One document per
    //    cycle, so the fetch is driver-side by design (HttpFeed doc).
    val fetched = feedUrl.map { url =>
      val raw = HttpFeed.fetchOne(spark, url)
      val parsed = raw.transform(IngestOps.parsePayloads("url", "payload"))
        .join(raw.select(col("url"), col("payload"), col("attempts"),
          col("fetched_at")), "url")
      parsed.write.mode("append").parquet(s"$warehouse/feed_log")
      parsed.count()
    }.getOrElse(0L)

    // 2-4. validate → hour-dedup → idempotent upsert → run log, with
    //      the reference's backoff retry (ReferencePipeline.run IS
    //      etl_job.py run(), spec-verified)
    val inserted = ReferencePipeline.run(spark, eventsDir,
      s"$warehouse/grid_telemetry", s"$warehouse/etl_runs")

    // 5. incremental rollup maintenance: fold only the hours this
    //    cycle landed into the previous snapshot
    val telemetry = spark.read.parquet(s"$warehouse/grid_telemetry")
    val v = currentVersion(warehouse)
    val next =
      if (v == 0) IncrementalRollup.state(telemetry)
      else {
        val prev = spark.read.parquet(s"${stateDir(warehouse)}/v=$v")
        val newHours = telemetry.join(prev.select("hour_ts").distinct(),
          Seq("hour_ts"), "left_anti")
        IncrementalRollup.merge(prev, newHours)
      }
    next.write.mode("overwrite").parquet(s"${stateDir(warehouse)}/v=${v + 1}")
    val stateRows = spark.read
      .parquet(s"${stateDir(warehouse)}/v=${v + 1}").count()
    CycleReport(inserted, v + 1, stateRows, fetched)
  }

  def main(args: Array[String]): Unit = {
    val eventsDir = args(0)
    val warehouse = args(1)
    val feedUrl = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    val r = cycle(spark, eventsDir, warehouse, feedUrl)
    println(s"""{"inserted":${r.inserted},"state_version":${r.stateVersion},""" +
      s""""state_rows":${r.stateRows},"fetched":${r.fetched}}""")
    spark.stop()
  }
}
