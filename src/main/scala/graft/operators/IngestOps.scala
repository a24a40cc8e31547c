package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.validation

/** §2.A-adjacent — feed ingestion semantics (etl_job.py:96-137).
  *
  * The reference pulls two JSON feeds over HTTP and extracts
  * `intensity.actual or intensity.forecast` plus ISO-8601 window
  * bounds. Here the same parse runs as a distributed `from_json`
  * pass: payloads arrive as a string column (at scale: a Kafka value
  * or raw-landing-zone file), schema is explicit, and the
  * actual→forecast fallback is a coalesce. For the oracle, both
  * engines CONSTRUCT identical payload strings from `events`
  * (integer cents + fixed-format timestamps — no float/ts formatting
  * divergence), then parse them back.
  */
object IngestOps {

  private val payloadSchema = StructType(Seq(
    StructField("from", StringType),
    StructField("intensity", StructType(Seq(
      StructField("actual", LongType),
      StructField("forecast", LongType))))))

  /** The parse step alone, over ANY (id, payload-string) frame:
    * intensity = actual ?? forecast (etl_job.py:106), window start
    * via the ISO-8601 parser, range validity per etl_job.py:63-70.
    * This is the seam the LIVE path plugs into — one documented
    * composition from a socket to the warehouse:
    * {{{
    *   HttpFeed.fetchOne(spark, feedUrl)        // retried GET
    *     .transform(IngestOps.parsePayloads("url", "payload"))
    *     // → validate / dedup / Upsert, as ReferencePipeline.run does
    * }}}
    * (exercised end-to-end in HttpFeedSpec against a loopback fake;
    * tools/ScheduledRun strings the full hourly cycle). */
  def parsePayloads(idCol: String, payloadCol: String)
                   (df: DataFrame): DataFrame =
    df.withColumn("parsed", from_json(col(payloadCol), payloadSchema))
      .select(
        col(idCol),
        coalesce(col("parsed.intensity.actual"), col("parsed.intensity.forecast"))
          .as("intensity"),
        validation.parseIso8601(col("parsed.from")).cast("timestamp_ntz")
          .as("window_start"),
        validation.validIntensity(
          coalesce(col("parsed.intensity.actual"), col("parsed.intensity.forecast"))
            .cast("double") / 100.0).as("intensity_valid"))

  /** Build the carbon-API-shaped payload string (deterministic across
    * engines), then parse it with [[parsePayloads]]: the oracled
    * batch twin of the live fetch path. Every 5th event has a null
    * `actual` to exercise the fallback. */
  def ingestFeed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cents = round(col("value") * 100.0).cast("long")
    val actualJson = when(col("event_id") % 5 === 0, lit("null"))
      .otherwise(cents.cast("string"))
    val payload = concat(
      lit("""{"from": """"), date_format(col("ts"), "yyyy-MM-dd'T'HH:mm"),
      lit("""Z", "intensity": {"actual": """), actualJson,
      lit(""", "forecast": """), (cents + 7).cast("string"),
      lit("}}"))
    ev.select(col("event_id"), payload.as("payload"))
      .transform(parsePayloads("event_id", "payload"))
  }

  private val ingestFeedSql =
    """WITH raw AS (
      |  SELECT event_id,
      |    '{"from": "' || strftime(ts, '%Y-%m-%dT%H:%M') || 'Z", "intensity": {"actual": '
      |    || CASE WHEN event_id % 5 = 0 THEN 'null'
      |            ELSE cast(cast(round(value*1e2) as bigint) as varchar) END
      |    || ', "forecast": ' || cast(cast(round(value*1e2) as bigint) + 7 as varchar)
      |    || '}}' AS payload
      |  FROM events)
      |SELECT event_id,
      |  coalesce(cast(json_extract(payload, '$.intensity.actual') as bigint),
      |           cast(json_extract(payload, '$.intensity.forecast') as bigint))
      |    AS intensity,
      |  cast(strptime(json_extract_string(payload, '$.from'),
      |       '%Y-%m-%dT%H:%MZ') as timestamp) AS window_start,
      |  (coalesce(cast(json_extract(payload, '$.intensity.actual') as bigint),
      |            cast(json_extract(payload, '$.intensity.forecast') as bigint))
      |   IS NOT NULL)
      |  AND cast(coalesce(cast(json_extract(payload, '$.intensity.actual') as bigint),
      |           cast(json_extract(payload, '$.intensity.forecast') as bigint)) as double)/1e2 >= 0.0
      |  AND cast(coalesce(cast(json_extract(payload, '$.intensity.actual') as bigint),
      |           cast(json_extract(payload, '$.intensity.forecast') as bigint)) as double)/1e2 <= 1000.0
      |    AS intensity_valid
      |FROM raw""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_feed" -> (ingestFeed _))

  val oracle: Map[String, String] = Map(
    "ingest_feed" -> ingestFeedSql)
}
