package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.A — the reference's WRITE-path semantics: idempotent keyed
  * append (etl_job.py:224-274: check whether the hour key already
  * exists inside the transaction; insert only if absent, roll back on
  * error).
  *
  * `upsertByKey` is the distributed generalization: one column-pruned
  * scan of the target reads ONLY the key columns (at 100 TB a
  * key-partitioned layout prunes this scan to the touched partitions),
  * a broadcast/shuffle anti-join drops already-present keys, and the
  * survivors append. Re-running the same batch is a no-op — the
  * reference's exact skip behavior. The insert set is materialized
  * (localCheckpoint) BEFORE the append starts so the write never
  * re-reads the directory it is appending to. Plain parquet append is
  * atomic per task but not transactional across writers; concurrent
  * upserts into one target need a table format with a commit protocol
  * (the operator's join+append shape is unchanged by that swap).
  */
object Upsert {

  /** Append the rows of `batch` whose `keyCols` tuple is not already
    * present under `dir`; returns how many rows were inserted. */
  def upsertByKey(spark: SparkSession, batch: DataFrame, dir: String,
                  keyCols: Seq[String]): Long = {
    // existence via the Hadoop filesystem of the path (works for
    // local, HDFS and object stores alike — java.io.File would only
    // see the local disk)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing: DataFrame =
      if (fs.exists(path))
        spark.read.parquet(dir).select(keyCols.map(col): _*).distinct()
      else batch.select(keyCols.map(col): _*).limit(0)
    val fresh = batch.join(existing, keyCols, "left_anti").transform(graft.Checkpoints.eager)
    val n = fresh.count()
    if (n > 0) fresh.write.mode(SaveMode.Append).parquet(dir)
    n
  }

  /** RunLog-wrapped variant: the run record carries the INSERTED row
    * count (0 on an idempotent re-run), failures are logged before
    * propagating — the reference's rollback+log path. */
  def upsertByKeyLogged(spark: SparkSession, batch: DataFrame, dir: String,
                        keyCols: Seq[String], logDir: String,
                        name: String): Long = {
    val t0 = System.nanoTime()
    try {
      val n = upsertByKey(spark, batch, dir, keyCols)
      RunLog.record(spark, logDir, name, "success", n,
        (System.nanoTime() - t0) / 1000000L, None)
      n
    } catch {
      case e: Throwable =>
        RunLog.record(spark, logDir, name, "failure", 0L,
          (System.nanoTime() - t0) / 1000000L,
          Some(String.valueOf(e.getMessage)))
        throw e
    }
  }

  /** Streaming variant: a `foreachBatch` sink that lands each
    * micro-batch through the keyed upsert. At-least-once delivery
    * (e.g. a replayed micro-batch after recovery) + key-level
    * idempotence = effectively-once landing, the same guarantee the
    * reference's check-then-insert gives its hourly cron — here per
    * micro-batch with checkpointed progress. Use as
    * `stream.writeStream.foreachBatch(Upsert.foreachBatchUpsert(dir,
    * keys)).option("checkpointLocation", ...)`. */
  def foreachBatchUpsert(dir: String, keyCols: Seq[String])
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      { upsertByKey(batch.sparkSession, batch, dir, keyCols); () }

  /** Read-side preview of an upsert run (the driver-oracled query):
    * treat hours before (dataset min + 15 days) as already landed;
    * the result is exactly the keep-first-per-hour rows a fresh
    * upsert of the full feed would insert. */
  def upsertPreview(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val mn = ev.agg(min(col("ts")).as("min_ts"))
    val existingHours = ev.crossJoin(broadcast(mn))
      .filter(col("ts") < col("min_ts") + expr("INTERVAL 15 DAYS"))
      .select(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"))
      .distinct()
    EtlOps.dedupHour(s, d)
      .join(existingHours, Seq("hour_ts"), "left_anti")
  }

  private val upsertPreviewSql =
    """WITH dedup AS (
      |  SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
      |         event_id, cast(ts as timestamp) AS ts, event_type, value
      |  FROM events
      |  QUALIFY row_number() OVER (PARTITION BY date_trunc('hour', ts)
      |                             ORDER BY ts, event_id) = 1),
      |existing AS (
      |  SELECT DISTINCT cast(date_trunc('hour', ts) as timestamp) AS hour_ts
      |  FROM events
      |  WHERE ts < (SELECT min(ts) FROM events) + INTERVAL 15 DAY)
      |SELECT hour_ts, event_id, ts, event_type, value
      |FROM dedup
      |WHERE hour_ts NOT IN (SELECT hour_ts FROM existing)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_upsert" -> (upsertPreview _))

  val oracle: Map[String, String] = Map(
    "etl_upsert" -> upsertPreviewSql)
}
