package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Bench, GraftSession}
import graft.streaming.StreamSessionize

/** Streaming throughput probe: drives the REAL streaming operators
  * (watermarked tumbling-window aggregation, flatMapGroupsWithState
  * sessionization, watermarked dropDuplicates) from Spark's `rate`
  * source at an offered rate deliberately above capacity, and reports
  * the steady-state rows/second each pipeline actually sustains
  * (sum of input rows over sum of trigger time, first two micro-
  * batches dropped as warmup). The `noop` sink isolates operator cost
  * from any writer.
  *
  *   SPARK_GRAFT_STREAM_RPS=5000000 SPARK_GRAFT_STREAM_SECS=30 \
  *     SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.StreamBench"
  *
  * Prints ONE JSON line (same calibration block as graft.Bench, so
  * cross-boot numbers can be normalized the same way).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "5000000").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "30").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    import spark.implicits._

    val ckRoot = s"/tmp/graft_streambench_${System.nanoTime()}"

    def rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rps.toString)
      .option("numPartitions", cpus.toString).load()

    // events-shaped stream: ~100k active users, 5 event types — the
    // key cardinalities the batch suite's events table carries
    val types = array(Seq("view", "click", "purchase", "refund", "error")
      .map(lit): _*)
    def events = rate.select(
      col("timestamp").as("ts"),
      (col("value") % 100000L).as("user_id"),
      col("value").as("event_id"),
      element_at(types, (col("value") % 5 + 1).cast("int")).as("event_type"),
      (col("value") % 100000L).cast("double") / 100.0 as "value")

    /** Run one pipeline for `secs`, return sustained rows/s. */
    def measure(name: String, mode: String)(df: DataFrame): Double = {
      val q = df.writeStream.format("noop")
        .option("checkpointLocation", s"$ckRoot/$name")
        .outputMode(mode).start()
      Thread.sleep(secs * 1000L)
      val prog = q.recentProgress.toSeq
      // stopping a rate-source query mid-batch interrupts the state
      // commit by design — that teardown noise is not a measurement
      // failure (progress was already snapshotted above)
      try q.stop() catch { case _: Throwable => () }
      // prefer post-warmup batches; a short probe that only completed
      // a couple of big batches still reports those rather than 0
      val warm = prog.drop(2).filter(_.numInputRows > 0)
      val steady = if (warm.nonEmpty) warm else prog.filter(_.numInputRows > 0)
      val rows = steady.map(_.numInputRows).sum.toDouble
      // durationMs is a plain java Map — a progress entry without the
      // triggerExecution key would NPE on unboxing (round-8 ADVICE)
      val sec = steady.map(p =>
          Option(p.durationMs.get("triggerExecution"))
            .map(_.toLong).getOrElse(0L))
        .sum / 1000.0
      if (sec == 0) 0.0 else rows / sec
    }

    val tumbling = measure("tumbling", "update") {
      events.withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "10 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.functions.exact.xsum(col("value"), 2).as("sum_value"))
    }

    // the bounded-state form StreamingOps.streamDedup documents:
    // state holds only keys younger than the watermark, and the key
    // domain (~1M) guarantees real duplicate hits at any rate
    val dedup = measure("dedup", "append") {
      events.select((col("value") % 200000L).as("dup_key"),
          col("event_type"), col("ts"))
        .withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark("dup_key", "event_type")
    }

    val sessionize = measure("sessionize", "append") {
      StreamSessionize.apply(
        events.select(col("user_id"), col("event_id"), col("ts"),
          col("value")).as[StreamSessionize.EvIn],
        gapMinutes = 30).toDF()
    }

    // probe checkpoints are throwaway state — reclaim the tmp space
    locally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(ckRoot))
    }

    def f(d: Double) = BigDecimal(d)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val calib = Bench.calibrate()
    println(s"""{"metric":"stream_rows_per_sec","tumbling":${f(tumbling)},""" +
      s""""dedup":${f(dedup)},"sessionize":${f(sessionize)},""" +
      s""""offered_rps":$rps,"secs":$secs,"cpus":$cpus,""" +
      s""""calib":${calib.json}}""")
    spark.stop()
  }
}
