package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.OracleDsl._
import graft.functions.exact._

/** §2.A — the reference pipeline's ETL semantics, distributed.
  *
  * The reference (`/root/reference/etl_job.py`) validates, dedups and
  * aggregates one telemetry row per hour; here the same semantics run
  * as whole-table Spark operators over `events` (ts/user_id/
  * event_type/value standing in for timestamp/status/measurement).
  * Every operator is a single scan + narrow transforms or one keyed
  * shuffle — nothing global except deliberate top-N (k rows).
  */
object EtlOps {

  private[operators] val knownTypes = Seq("view", "click", "purchase", "signup", "error")
  private[operators] val knownTypesSql = knownTypes.map(t => s"'$t'").mkString("(", ",", ")")

  /** Data-quality flags per row — null/range/type-domain checks
    * (etl_job.py:51-72: validate_intensity 0..1000,
    * validate_fuel_percentage 0..100, null checks). Pure narrow map:
    * no shuffle, fully codegen'd, scales linearly. */
  def validate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val valuePresent = col("value").isNotNull
    val valueInRange = col("value") >= 0.0 && col("value") <= 1000.0
    val typeKnown = col("event_type").isin(knownTypes: _*)
    val tsPresent = col("ts").isNotNull
    ev.select(
      col("event_id"), col("event_type"), col("value"),
      valuePresent.as("value_present"),
      (valuePresent && valueInRange).as("value_in_range"),
      typeKnown.as("type_known"),
      tsPresent.as("ts_present"),
      (valuePresent && valueInRange && typeKnown && tsPresent).as("is_valid"))
  }

  private val validateSql =
    s"""SELECT event_id, event_type, value,
       |  value IS NOT NULL AS value_present,
       |  (value IS NOT NULL AND value >= 0.0 AND value <= 1000.0) AS value_in_range,
       |  event_type IN $knownTypesSql AS type_known,
       |  ts IS NOT NULL AS ts_present,
       |  (value IS NOT NULL AND value >= 0.0 AND value <= 1000.0
       |   AND event_type IN $knownTypesSql AND ts IS NOT NULL) AS is_valid
       |FROM events""".stripMargin

  /** Keep-first-per-hour duplicate prevention (etl_job.py:227-237:
    * skip insert when DATE_TRUNC('hour', ts) already present).
    * One shuffle on the hour key; row_number + filter, no collect. */
  def dedupHour(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("hour_ts")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      // date_trunc yields tz-aware TIMESTAMP even for NTZ input; cast
      // back so written parquet stays naive like the oracle's
      .withColumn("hour_ts", date_trunc("hour", col("ts")).cast("timestamp_ntz"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("hour_ts", "event_id", "ts", "event_type", "value")
  }

  private val dedupHourSql =
    """SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
      |       event_id, cast(ts as timestamp) AS ts, event_type, value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY date_trunc('hour', ts)
      |                           ORDER BY ts, event_id) = 1""".stripMargin

  /** Per-hour per-type rollup — grid_telemetry as an aggregate time
    * series. Map-side partial agg then one shuffle on (hour, type). */
  def hourlyRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        xsum(col("value"), 2).as("sum_value"),
        xavg(col("value"), 2).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  private val hourlyRollupSql =
    s"""SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts, event_type,
       |  $oCount AS n_events,
       |  ${oSum("value", 2)} AS sum_value,
       |  ${oAvg("value", 2)} AS avg_value,
       |  min(value) AS min_value,
       |  max(value) AS max_value
       |FROM events
       |GROUP BY 1, 2""".stripMargin

  /** Daily cleanliness view (README.md:393-404): per-day averages and
    * the "renewable share" ratio re-expressed as the share of
    * view/click events. */
  def dailyCleanliness(s: SparkSession, d: String): DataFrame = {
    val clean = when(col("event_type").isin("view", "click"), 1L).otherwise(0L)
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        xavg(col("value"), 2).as("avg_value"),
        (sum(clean).cast("double") * 100.0 / count(lit(1))).as("clean_pct"),
        count(lit(1)).as("samples"))
  }

  private val dailyCleanlinessSql =
    s"""SELECT cast(ts as date) AS day,
       |  ${oAvg("value", 2)} AS avg_value,
       |  cast(cast(sum(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END) as bigint) as double) * 100.0
       |    / cast(count(*) as bigint) AS clean_pct,
       |  $oCount AS samples
       |FROM events
       |GROUP BY 1""".stripMargin

  /** Per-day success-rate report (README.md:553-563): conditional
    * aggregation with 'error' events as failures, restricted to the
    * reference's 7-day recency window (README.md:178,561:
    * `run_timestamp >= NOW() - INTERVAL '7 days'`) — "now" anchored
    * to the dataset max ts for determinism, computed as a 1-row
    * broadcast against the scan. */
  def successRate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(col("ts")).as("max_ts"))
    val ok = when(col("event_type") =!= "error", 1L).otherwise(0L)
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("total_runs"),
        sum(ok).as("successful_runs"),
        (sum(ok).cast("double") * 100.0 / count(lit(1))).as("success_pct"),
        xavg(col("value"), 2).as("avg_value"))
  }

  private val successRateSql =
    s"""SELECT cast(ts as date) AS day,
       |  $oCount AS total_runs,
       |  cast(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) as bigint) AS successful_runs,
       |  cast(cast(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) as bigint) as double) * 100.0
       |    / cast(count(*) as bigint) AS success_pct,
       |  ${oAvg("value", 2)} AS avg_value
       |FROM events
       |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
       |GROUP BY 1""".stripMargin

  /** Latest-N monitor (README.md:184-189) with a total-order tiebreak
    * so the result set is deterministic. TakeOrdered: only k rows ever
    * leave the executors. */
  def recentRuns(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select("event_id", "ts", "event_type", "value")
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(10)

  private val recentRunsSql =
    """SELECT event_id, cast(ts as timestamp) AS ts, event_type, value
      |FROM events
      |ORDER BY ts DESC, event_id DESC
      |LIMIT 10""".stripMargin

  /** Freshness check (etl_job.py:74-83: warn when data older than 2h).
    * "now" is the dataset max ts for determinism; computed as a 1-row
    * broadcast joined against the scan — no second pass over the data
    * per row, scales to any table size. */
  def freshness(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(mx))
      .select(
        col("event_id"), col("ts"),
        (col("ts") < col("max_ts") - expr("INTERVAL 2 HOURS")).as("is_stale"))
  }

  private val freshnessSql =
    """SELECT event_id, cast(ts as timestamp) AS ts,
      |       ts < (SELECT max(ts) FROM events) - INTERVAL 2 HOUR AS is_stale
      |FROM events""".stripMargin

  /** Hourly-grid gap filling with forward fill: the telemetry
    * continuity a downstream consumer of an hourly feed needs when
    * cycles are missed (the reference's retry/backoff exists exactly
    * because hours CAN be missed). Dense hour × type grid generated
    * from the data's own bounds (the grid is |hours| rows — tiny at
    * any corpus size — so the cross join broadcasts), observed
    * per-hour averages left-joined on, gaps carry the last observed
    * value forward per type (last-ignoreNulls window). */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hourly = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"))
      .agg(xavg(col("value"), 2).as("avg_value"))
    val grid = ev
      .agg(date_trunc("hour", min(col("ts"))).cast("timestamp_ntz").as("h0"),
        date_trunc("hour", max(col("ts"))).cast("timestamp_ntz").as("h1"))
      .select(explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("hour_ts"))
      .crossJoin(broadcast(ev.select(col("event_type")).distinct()))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "hour_ts"), "left")
      .select(col("event_type"), col("hour_ts"), col("avg_value"),
        last(col("avg_value"), ignoreNulls = true).over(w).as("filled_value"),
        col("avg_value").isNull.as("was_gap"))
  }

  private val gapFillSql =
    s"""WITH b AS (
       |  SELECT cast(date_trunc('hour', min(ts)) as timestamp) AS h0,
       |         cast(date_trunc('hour', max(ts)) as timestamp) AS h1
       |  FROM events),
       |grid AS (
       |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts FROM b),
       |types AS (SELECT DISTINCT event_type FROM events),
       |hourly AS (
       |  SELECT event_type, cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
       |    ${oAvg("value", 2)} AS avg_value
       |  FROM events GROUP BY 1, 2)
       |SELECT t.event_type, cast(g.hour_ts as timestamp) AS hour_ts,
       |  h.avg_value,
       |  last_value(h.avg_value IGNORE NULLS) OVER (
       |    PARTITION BY t.event_type ORDER BY g.hour_ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       |  h.avg_value IS NULL AS was_gap
       |FROM grid g
       |CROSS JOIN types t
       |LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hour_ts = g.hour_ts""".stripMargin

  // ---------------------------------------------- linear interpolation

  /** Linear interpolation across hourly gaps — the numeric upgrade of
    * `etl_gap_fill`'s carry-forward: a missing hour gets
    * prev + (next−prev)·(t−t_prev)/(t_next−t_prev); leading/trailing
    * gaps clamp to the nearest observation. Same grid × types frame
    * as gap_fill (one per-type sort), with BOTH bracketing
    * observations found by ignoreNulls last/first over the two
    * half-open frames — no self-join, no per-gap scan. Every engine
    * computes the same IEEE double expression in the same
    * association, so the oracle hash-matches exactly: positions are
    * integer epoch-hours and the observed values are the 2-dp exact
    * averages. */
  def interpolate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hourly = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"))
      .agg(xavg(col("value"), 2).as("avg_value"))
    val grid = ev
      .agg(date_trunc("hour", min(col("ts"))).cast("timestamp_ntz").as("h0"),
        date_trunc("hour", max(col("ts"))).cast("timestamp_ntz").as("h1"))
      .select(explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("hour_ts"))
      .crossJoin(broadcast(ev.select(col("event_type")).distinct()))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pos = (unix_micros(col("hour_ts").cast("timestamp")) /
      lit(3600000000L)).cast("double")
    val obsPos = when(col("avg_value").isNotNull, pos)
    grid.join(hourly, Seq("event_type", "hour_ts"), "left")
      .withColumn("pos", pos)
      .withColumn("prev_v", last(col("avg_value"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_p", last(obsPos, ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(col("avg_value"), ignoreNulls = true).over(wNext))
      .withColumn("next_p", first(obsPos, ignoreNulls = true).over(wNext))
      .select(col("event_type"), col("hour_ts"), col("avg_value"),
        when(col("avg_value").isNotNull, col("avg_value"))
          .when(col("prev_v").isNotNull && col("next_v").isNotNull,
            col("prev_v") + (col("next_v") - col("prev_v")) *
              ((col("pos") - col("prev_p")) / (col("next_p") - col("prev_p"))))
          .otherwise(coalesce(col("prev_v"), col("next_v")))
          .as("filled_value"),
        col("avg_value").isNull.as("was_gap"))
  }

  private val interpolateSql =
    s"""WITH b AS (
       |  SELECT cast(date_trunc('hour', min(ts)) as timestamp) AS h0,
       |         cast(date_trunc('hour', max(ts)) as timestamp) AS h1
       |  FROM events),
       |grid AS (
       |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts FROM b),
       |types AS (SELECT DISTINCT event_type FROM events),
       |hourly AS (
       |  SELECT event_type, cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
       |    ${oAvg("value", 2)} AS avg_value
       |  FROM events GROUP BY 1, 2),
       |framed AS (
       |  SELECT t.event_type, cast(g.hour_ts as timestamp) AS hour_ts,
       |    h.avg_value,
       |    cast(epoch_us(g.hour_ts) // 3600000000 as double) AS pos,
       |    last_value(h.avg_value IGNORE NULLS) OVER wp AS prev_v,
       |    last_value(CASE WHEN h.avg_value IS NOT NULL
       |      THEN cast(epoch_us(g.hour_ts) // 3600000000 as double) END
       |      IGNORE NULLS) OVER wp AS prev_p,
       |    first_value(h.avg_value IGNORE NULLS) OVER wn AS next_v,
       |    first_value(CASE WHEN h.avg_value IS NOT NULL
       |      THEN cast(epoch_us(g.hour_ts) // 3600000000 as double) END
       |      IGNORE NULLS) OVER wn AS next_p
       |  FROM grid g
       |  CROSS JOIN types t
       |  LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hour_ts = g.hour_ts
       |  WINDOW wp AS (PARTITION BY t.event_type ORDER BY g.hour_ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |  wn AS (PARTITION BY t.event_type ORDER BY g.hour_ts
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT event_type, hour_ts, avg_value,
       |  CASE WHEN avg_value IS NOT NULL THEN avg_value
       |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
       |         THEN prev_v + (next_v - prev_v) * ((pos - prev_p) / (next_p - prev_p))
       |       ELSE coalesce(prev_v, next_v) END AS filled_value,
       |  avg_value IS NULL AS was_gap
       |FROM framed""".stripMargin

  // --------------------------------------------------- table profiling

  /** One-pass table profile (the deequ/dbt-style data-quality
    * summary run before anything trains on the data): row count,
    * null counts, bounds, exact sum, distinct cardinalities and the
    * time range — ONE aggregation over one scan (the two
    * count-distincts expand the plan, not the scan count). The
    * reference hand-rolls exactly these checks row-by-row
    * (etl_job.py:51-83); this is their set-based, 100 TB form. */
  def profile(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_value_nulls"),
      min(col("value")).as("value_min"),
      max(col("value")).as("value_max"),
      xsum(col("value"), 2).as("value_sum"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      min(col("ts")).as("ts_min"),
      max(col("ts")).as("ts_max"))

  private val profileSql =
    s"""SELECT $oCount AS n_rows,
       |  cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) as bigint)
       |    AS n_value_nulls,
       |  min(value) AS value_min,
       |  max(value) AS value_max,
       |  ${oSum("value", 2)} AS value_sum,
       |  cast(count(DISTINCT user_id) as bigint) AS n_users,
       |  cast(count(DISTINCT event_type) as bigint) AS n_types,
       |  cast(min(ts) as timestamp) AS ts_min,
       |  cast(max(ts) as timestamp) AS ts_max
       |FROM events""".stripMargin

  // ------------------------------------------------- anomaly detection

  private val ZThreshold = 3.0

  /** Telemetry anomaly detection: per-event-type z-score outliers —
    * the monitoring pass the reference's range checks (etl_job.py:
    * 63-70) grow into once static bounds give way to learned ones.
    * Mean/variance come from exact scaled-integer (sum, sum-of-
    * squares) per type — one partial/final aggregation, broadcast
    * back over the scan, so the whole thing is two passes and one
    * tiny shuffle. sqrt is IEEE-exact (correctly rounded), so z is
    * bit-identical cross-engine. At 100 TB the bigint sum-of-squares
    * needs DECIMAL(38) headroom — the aggregation shape is unchanged.
    */
  /** The 2-dp scaled-integer value (shared with the streaming alert
    * operator — ONE definition so the two oracles can't drift). */
  private[graft] def zscoreValueScaled: Column =
    round(col("value") * 1e2).cast("long")

  /** Per-event-type exact (mean, std) of the scaled value. Shared by
    * the batch outlier report and the streaming alert operator. */
  private[graft] def zscoreStats(events: DataFrame): DataFrame = {
    val vc = zscoreValueScaled
    events
      .groupBy(col("event_type"))
      .agg(sum(vc).as("s1"), sum(vc * vc).as("s2"), count(lit(1)).as("n"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("n")).as("mean_c"),
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / col("n")) / col("n"))
          .as("std_c"))
  }

  /** SQL mirror of [[zscoreStats]] as a CTE body named `st`, and the
    * matching z expression — shared with the streaming oracle. */
  private[graft] val zscoreStatsSqlCte: String =
    """st AS (
      |  SELECT event_type,
      |    cast(sum(cast(round(value*1e2) as bigint)) as double)
      |      / cast(count(*) as bigint) AS mean_c,
      |    sqrt((cast(sum(cast(round(value*1e2) as bigint)
      |               * cast(round(value*1e2) as bigint)) as double)
      |          - cast(sum(cast(round(value*1e2) as bigint)) as double)
      |            * cast(sum(cast(round(value*1e2) as bigint)) as bigint)
      |            / cast(count(*) as bigint))
      |         / cast(count(*) as bigint)) AS std_c
      |  FROM events GROUP BY 1)""".stripMargin
  private[graft] val zscoreZSql: String =
    "(cast(round(value*1e2) as double) - mean_c) / std_c"

  def zscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val vc = zscoreValueScaled
    Tables.events(s, d)
      .join(broadcast(zscoreStats(Tables.events(s, d))), Seq("event_type"))
      .withColumn("z", (vc.cast("double") - col("mean_c")) / col("std_c"))
      .filter(abs(col("z")) > ZThreshold)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 6).as("z"))
  }

  private val zscoreOutliersSql =
    s"""WITH $zscoreStatsSqlCte
       |SELECT event_id, event_type, value,
       |  round($zscoreZSql, 6) AS z
       |FROM events JOIN st USING (event_type)
       |WHERE abs($zscoreZSql) > $ZThreshold""".stripMargin

  /** MAD outlier rule: |x − median| > MadK · MAD. */
  private val MadK = 3

  /** Robust (median/MAD) telemetry outlier summary — the companion to
    * the z-score detector for the heavy-tailed value distributions
    * where mean/stddev are themselves dragged by the outliers.
    *
    * Exactness: values carry 2 decimals, so everything runs on cent
    * integers. med2 = 2·median(cents) and mad4 = 2·median(2·|dev|)
    * are INTEGERS in both engines: for cents < 2⁵² every term of the
    * 0.5-quantile interpolation (a + 0.5·(b−a)) is IEEE-exact, and a
    * round() half-unit guard before the bigint cast makes the integer
    * immune to a hypothetical last-ulp drift anyway (the truncating
    * cast alone would flip on x−ulp — round() cannot). The outlier
    * test 2·dev2 > MadK·mad4 is pure integer arithmetic, and med2/
    * mad4 are PUBLISHED as integers too (round 5 failed the driver's
    * dtype-sensitive hash on a derived float column, not on values).
    * Shape: two partial/final aggregations over the scan with the
    * per-type medians broadcast between them — the grouped-percentile
    * state is per-type, the same reducer shape as the z-score pass. */
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    val v = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("c"))
    val med = v.groupBy("event_type")
      .agg(expr("cast(round(2 * percentile(c, 0.5D)) as bigint)").as("med2"))
    val dev = v.join(broadcast(med), Seq("event_type"))
      .withColumn("dev2", abs(col("c") * 2 - col("med2")))
    val st = dev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("med2")).as("med2"),
        expr("cast(round(2 * percentile(dev2, 0.5D)) as bigint)").as("mad4"))
    // conditional sum, not a filtered join: a type whose values never
    // stray past MadK·MAD must still report n_outliers = 0
    dev.select(col("event_type"), col("dev2"))
      .join(broadcast(st), Seq("event_type"))
      .groupBy(col("event_type"), col("n"), col("med2"), col("mad4"))
      .agg(sum(when(col("dev2") * 2 > col("mad4") * MadK, 1L)
        .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("med2"), col("mad4"),
        col("n_outliers"))
  }

  private val madOutliersSql =
    s"""WITH v AS (
       |  SELECT event_type, cast(round(value * 100) as bigint) AS c
       |  FROM events WHERE value IS NOT NULL),
       |m AS (
       |  SELECT event_type,
       |    cast(round(2 * quantile_cont(c, 0.5)) as bigint) AS med2
       |  FROM v GROUP BY 1),
       |dv AS (
       |  SELECT v.event_type, v.c, m.med2, abs(2 * v.c - m.med2) AS dev2
       |  FROM v JOIN m USING (event_type)),
       |md AS (
       |  SELECT event_type, count(*) AS n, max(med2) AS med2,
       |    cast(round(2 * quantile_cont(dev2, 0.5)) as bigint) AS mad4
       |  FROM dv GROUP BY 1)
       |SELECT md.event_type, md.n, md.med2, md.mad4,
       |  cast(sum(CASE WHEN dv.dev2 * 2 > md.mad4 * $MadK THEN 1 ELSE 0 END)
       |    as bigint) AS n_outliers
       |FROM md JOIN dv ON md.event_type = dv.event_type
       |GROUP BY 1, 2, 3, 4""".stripMargin

  private val EwmaLags = 8

  /** EWMA smoothing of the hourly per-type average — the trend line a
    * telemetry dashboard draws over the raw rollup (the reference's
    * daily AVG view is the box-car version; this is the exponential
    * one). Weights are DYADIC (2⁷,2⁶,…,2⁰ over the last 8 observed
    * points, renormalized over the lags that exist) so the whole
    * smoothing is a fixed-order IEEE expression over exact hourly
    * averages — bit-identical across engines, no libm pow. One
    * window over the same (event_type, hour) ordering the rollup
    * family already uses; at 100 TB the state is 8 lags per type —
    * constant memory per partition, no extra shuffle beyond the
    * rollup's own. */
  def ewmaSmooth(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
        col("event_type"))
      .agg(xavg(col("value"), 2).as("avg_value"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
    val terms = (0 until EwmaLags).map { k =>
      val v = if (k == 0) col("avg_value") else lag(col("avg_value"), k).over(w)
      (v, lit((1L << (EwmaLags - 1 - k)).toDouble))
    }
    val num = terms.map { case (v, wt) =>
      when(v.isNotNull, v * wt).otherwise(lit(0.0)) }.reduce(_ + _)
    val den = terms.map { case (v, wt) =>
      when(v.isNotNull, wt).otherwise(lit(0.0)) }.reduce(_ + _)
    hourly.select(col("hour_ts"), col("event_type"), col("avg_value"),
      round(num / den, 6).as("ewma_value"))
  }

  private val ewmaSmoothSql = {
    def v(k: Int) =
      if (k == 0) "avg_value" else s"lag(avg_value, $k) OVER w"
    val num = (0 until EwmaLags).map { k =>
      s"(CASE WHEN ${v(k)} IS NOT NULL THEN ${v(k)} * ${(1L << (EwmaLags - 1 - k)).toDouble} ELSE 0.0 END)"
    }.mkString("(", " + ", ")")
    val den = (0 until EwmaLags).map { k =>
      s"(CASE WHEN ${v(k)} IS NOT NULL THEN ${(1L << (EwmaLags - 1 - k)).toDouble} ELSE 0.0 END)"
    }.mkString("(", " + ", ")")
    s"""WITH h AS (
       |  SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts, event_type,
       |    ${oAvg("value", 2)} AS avg_value
       |  FROM events GROUP BY 1, 2)
       |SELECT hour_ts, event_type, avg_value,
       |  round($num / $den, 6) AS ewma_value
       |FROM h
       |WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts)""".stripMargin
  }

  // ------------------------------------------------ gaps and islands

  /** Gaps-and-islands over telemetry continuity: the maximal runs of
    * consecutive observed hours per event type — the inverse view of
    * `etl_gap_fill` (instead of filling the holes, report the
    * unbroken uptime stretches and their extent: the downtime report
    * an operator reads before anything else). Classic islands
    * construction: a distinct (type, epoch-hour) row's hour minus its
    * per-type rank is constant exactly within a consecutive run. One
    * distinct + one keyed window + one partial/final aggregation —
    * all integer epoch-hour arithmetic, and the window partitions
    * carry at most the CALENDAR's hour count per type (8.8k/year)
    * regardless of event volume, so the shape is flat at 100 TB. */
  def islands(s: SparkSession, d: String): DataFrame = {
    val hours = Tables.events(s, d)
      .select(col("event_type"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    hours
      .withColumn("grp", col("h") - row_number().over(w))
      .groupBy(col("event_type"), col("grp"))
      .agg(min(col("hour_ts")).as("island_start"),
        max(col("hour_ts")).as("island_end"),
        count(lit(1)).as("n_hours"))
      .select(col("event_type"), col("island_start"), col("island_end"),
        col("n_hours"))
  }

  private val islandsSql =
    """WITH hrs AS (
      |  SELECT DISTINCT event_type,
      |    cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h
      |  FROM events),
      |g AS (
      |  SELECT event_type, hour_ts,
      |    h - row_number() OVER (PARTITION BY event_type ORDER BY h) AS grp
      |  FROM hrs)
      |SELECT event_type,
      |  min(hour_ts) AS island_start,
      |  max(hour_ts) AS island_end,
      |  cast(count(*) as bigint) AS n_hours
      |FROM g GROUP BY event_type, grp""".stripMargin

  // ------------------------------------------------ green windows

  /** Clean-share threshold for a "green" hour, in ppm (50% — the
    * renewables-share cut a scheduler would use). Integer ppm so the
    * threshold compare and the per-window averages are exact in both
    * engines. */
  private val GreenTauPpm = 500000L

  /** Green-window detection (README.md:245,411: "plan
    * energy-intensive tasks during green windows", "custom dimensions
    * for green window detection"): the maximal runs of CONSECUTIVE
    * hours whose clean share (view/click events as the renewable
    * stand-in, the same mapping as `etl_daily_cleanliness`) meets the
    * threshold — start/end/duration plus the pooled and peak shares
    * per window, i.e. the schedule a load-shifting consumer (EV
    * charging, batch compute) reads directly. Same islands
    * construction as `etl_islands` on the FILTERED hourly series:
    * one partial/final agg to the hourly grain, the threshold filter,
    * then epoch-hour minus rank is constant exactly within a
    * consecutive green run. The post-agg series is bounded by
    * CALENDAR hours (8.8k/year) regardless of event volume, so the
    * global rank window is a §6 bounded carve-out, not a scale
    * hazard, and everything after the first aggregation is
    * constant-sized at 100 TB. All integer (ppm) arithmetic. */
  def greenWindows(s: SparkSession, d: String): DataFrame = {
    val clean = when(col("event_type").isin("view", "click"), 1L).otherwise(0L)
    val hours = Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("n_events"), sum(clean).as("n_clean"))
      .withColumn("clean_ppm", expr("n_clean * 1000000 div n_events"))
      .filter(col("clean_ppm") >= GreenTauPpm)
    val w = Window.orderBy(col("h"))
    hours
      .withColumn("grp", col("h") - row_number().over(w))
      .groupBy(col("grp"))
      .agg(min(col("hour_ts")).as("window_start"),
        max(col("hour_ts")).as("window_end"),
        count(lit(1)).as("n_hours"),
        expr("sum(n_clean) * 1000000 div sum(n_events)").as("avg_clean_ppm"),
        max(col("clean_ppm")).as("peak_clean_ppm"))
      .select(col("window_start"), col("window_end"), col("n_hours"),
        col("avg_clean_ppm"), col("peak_clean_ppm"))
  }

  private val greenWindowsSql =
    s"""WITH hrs AS (
       |  SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
       |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
       |    cast(count(*) as bigint) AS n_events,
       |    cast(sum(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END) as bigint) AS n_clean
       |  FROM events WHERE ts IS NOT NULL
       |  GROUP BY 1, 2),
       |g AS (
       |  SELECT *, n_clean * 1000000 // n_events AS clean_ppm FROM hrs),
       |f AS (
       |  SELECT *, h - row_number() OVER (ORDER BY h) AS grp
       |  FROM g WHERE clean_ppm >= $GreenTauPpm)
       |SELECT min(hour_ts) AS window_start,
       |  max(hour_ts) AS window_end,
       |  cast(count(*) as bigint) AS n_hours,
       |  cast(sum(n_clean) as bigint) * 1000000
       |    // cast(sum(n_events) as bigint) AS avg_clean_ppm,
       |  max(clean_ppm) AS peak_clean_ppm
       |FROM f GROUP BY grp""".stripMargin

  /** Weekly-grain cleanliness trend (README.md:414: "carbon intensity
    * trends — hourly, daily, weekly"): `etl_daily_cleanliness` rolled
    * to ISO weeks plus the week-over-week share delta — the trend
    * series the dashboard's weekly panel plots. Exact throughout: the
    * quantized xsum average for the value series, integer-ppm clean
    * share, and the delta as a difference of two already-exact ppm
    * integers (one partial/final agg + a calendar-bounded lag — ≤52
    * rows/year, the §6 carve-out). */
  def weeklyTrend(s: SparkSession, d: String): DataFrame = {
    val clean = when(col("event_type").isin("view", "click"), 1L).otherwise(0L)
    val wk = Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"))
      .agg(xavg(col("value"), 2).as("avg_value"),
        sum(clean).as("n_clean"),
        count(lit(1)).as("samples"))
      .withColumn("clean_ppm", expr("n_clean * 1000000 div samples"))
    val w = Window.orderBy(col("week"))
    wk.withColumn("delta_clean_ppm",
        col("clean_ppm") - lag(col("clean_ppm"), 1).over(w))
      .select(col("week"), col("avg_value"), col("clean_ppm"),
        col("delta_clean_ppm"), col("samples"))
  }

  private val weeklyTrendSql =
    s"""WITH w AS (
       |  SELECT cast(date_trunc('week', ts) as date) AS week,
       |    ${oAvg("value", 2)} AS avg_value,
       |    cast(sum(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END) as bigint) AS n_clean,
       |    $oCount AS samples
       |  FROM events WHERE ts IS NOT NULL
       |  GROUP BY 1)
       |SELECT week, avg_value,
       |  n_clean * 1000000 // samples AS clean_ppm,
       |  n_clean * 1000000 // samples
       |    - lag(n_clean * 1000000 // samples) OVER (ORDER BY week) AS delta_clean_ppm,
       |  samples
       |FROM w""".stripMargin

  // ------------------------------------------------ lateness accounting

  private val LateAllowSec = 900L
  private val LateBlocks = 32L

  /** Watermark lateness accounting: how many events arrived more than
    * 15 minutes behind the high-water mark (max event-time seen over
    * the ARRIVAL order so far) — the batch audit that sizes a
    * streaming watermark (`withWatermark` delay) before deploying the
    * streaming jobs in §2.G: n_late IS the count the state store
    * would drop at that delay. The running max over global arrival
    * order (event_id = ingest sequence) is NOT a single-partition
    * window: arrival ids block into 32 contiguous ranges — per-block
    * running max in parallel, then a prefix max over the ≤32 block
    * maxima (the §6 bounded-window carve-out), recombined with
    * Spark's null-skipping greatest(). Integer epoch seconds
    * end-to-end, so both engines flag identical rows. */
  def lateArrivals(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        expr("unix_timestamp(ts)").as("tse"))
    val bounds = base.agg(min(col("event_id")).as("lo"),
      max(col("event_id")).as("hi"))
    val withBlk = base.crossJoin(broadcast(bounds))
      .withColumn("span",
        greatest(floor((col("hi") - col("lo") + 1) / LateBlocks), lit(1L)))
      .withColumn("blk", floor((col("event_id") - col("lo")) / col("span")))
      .drop("lo", "hi", "span")
    val wLocal = Window.partitionBy(col("blk")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBlocks = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockMax = withBlk.groupBy(col("blk"))
      .agg(max(col("tse")).as("bmax"))
      .withColumn("pmax", max(col("bmax")).over(wBlocks))
      .select(col("blk"), col("pmax"))
    val flagged = withBlk
      .withColumn("lmax", max(col("tse")).over(wLocal))
      .join(broadcast(blockMax), Seq("blk"))
      .withColumn("hwm", greatest(col("lmax"), col("pmax")))
      .withColumn("is_late",
        col("hwm").isNotNull && col("tse") < col("hwm") - LateAllowSec)
    flagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late"),
        max(when(col("is_late"), col("hwm") - col("tse"))).as("max_behind_sec"))
  }

  private val lateArrivalsSql =
    s"""WITH e AS (
       |  SELECT event_type, event_id, epoch_us(ts) // 1000000 AS tse
       |  FROM events),
       |hw AS (
       |  SELECT event_type, tse,
       |    max(tse) OVER (ORDER BY event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
       |  FROM e)
       |SELECT event_type, $oCount AS n_events,
       |  cast(sum(CASE WHEN hwm IS NOT NULL AND tse < hwm - $LateAllowSec
       |               THEN 1 ELSE 0 END) as bigint) AS n_late,
       |  cast(max(CASE WHEN hwm IS NOT NULL AND tse < hwm - $LateAllowSec
       |               THEN hwm - tse END) as bigint) AS max_behind_sec
       |FROM hw GROUP BY 1""".stripMargin

  // ---------------------------------------------------------- seasonal

  /** Hour-of-day seasonal baseline per event type — the diurnal
    * profile a telemetry monitor compares against (the reference's
    * hourly series has exactly this structure: carbon intensity
    * follows the daily demand curve). Two partial/final aggregations
    * — (type, hour-of-day) cells and per-type totals — joined by
    * broadcast (≤ |types| rows), seasonal_idx = cell avg / type avg.
    * Exact-sum discipline end to end: both averages derive from the
    * same quantized integer sums, so the single final division is
    * one IEEE op on identical inputs in both engines. */
  def seasonal(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        xsum(col("value"), 2).as("sum_value"),
        xavg(col("value"), 2).as("avg_value"))
    val types = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(xavg(col("value"), 2).as("type_avg"))
    cells.join(broadcast(types), "event_type")
      .select(col("event_type"), col("hod"), col("n_events"),
        col("avg_value"),
        round(col("avg_value") / col("type_avg"), 6).as("seasonal_idx"))
  }

  private val seasonalSql =
    s"""WITH cells AS (
       |  SELECT event_type, cast(hour(ts) as int) AS hod,
       |    $oCount AS n_events,
       |    ${oAvg("value", 2)} AS avg_value
       |  FROM events GROUP BY 1, 2),
       |types AS (
       |  SELECT event_type, ${oAvg("value", 2)} AS type_avg
       |  FROM events GROUP BY 1)
       |SELECT event_type, hod, n_events, avg_value,
       |  round(avg_value / type_avg, 6) AS seasonal_idx
       |FROM cells JOIN types USING (event_type)""".stripMargin

  // ---------------------------------------------------------- dq rules

  /** Rule-driven data-quality report — the reference's scattered
    * validation checks (etl_job.py:51-72) generalized into a rule
    * table: one conditional-sum aggregation computes every rule's
    * violation count in a SINGLE scan (no per-rule passes), then the
    * 1-row wide result melts into (rule, n_violations, viol_pct)
    * rows via the native unpivot — the shape a DQ dashboard ingests.
    * Adding a rule = adding a column; the scan count stays 1
    * regardless of rule count. */
  def dqRules(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val wide = ev.agg(
      count(lit(1)).as("_total"),
      viol(col("value").isNull).as("null_value"),
      viol(col("value").isNotNull &&
        (col("value") < 0.0 || col("value") > 1000.0)).as("value_out_of_range"),
      viol(col("event_type").isNull ||
        !col("event_type").isin(knownTypes: _*)).as("unknown_type"),
      viol(col("ts").isNull).as("null_ts"),
      viol(col("user_id").isNull).as("null_user"),
      viol(col("props").isNotNull &&
        expr("try_parse_json(props)").isNull).as("malformed_props"))
    wide.unpivot(
        ids = Array(col("_total")),
        values = Array(col("null_value"), col("value_out_of_range"),
          col("unknown_type"), col("null_ts"), col("null_user"),
          col("malformed_props")),
        variableColumnName = "rule",
        valueColumnName = "n_violations")
      .select(col("rule"), col("n_violations"),
        round(col("n_violations") * lit(100.0) / col("_total"), 6)
          .as("viol_pct"))
  }

  private val dqRulesSql = {
    val rules = Seq(
      "null_value" -> "value IS NULL",
      "value_out_of_range" ->
        "value IS NOT NULL AND (value < 0.0 OR value > 1000.0)",
      "unknown_type" ->
        s"event_type IS NULL OR event_type NOT IN $knownTypesSql",
      "null_ts" -> "ts IS NULL",
      "null_user" -> "user_id IS NULL",
      "malformed_props" -> "props IS NOT NULL AND NOT json_valid(props)")
    val sums = rules.map { case (n, p) =>
      s"cast(sum(CASE WHEN $p THEN 1 ELSE 0 END) as bigint) AS $n"
    }.mkString(",\n    ")
    val arms = rules.map { case (n, _) =>
      s"SELECT '$n' AS rule, $n AS n_violations, total FROM wide"
    }.mkString("\nUNION ALL\n")
    s"""WITH wide AS (
       |  SELECT count(*) AS total,
       |    $sums
       |  FROM events)
       |SELECT rule, n_violations,
       |  round(n_violations * 100.0 / total, 6) AS viol_pct
       |FROM ($arms)""".stripMargin
  }

  private val DecayCap = 20

  /** Time-decayed per-type activity: every event contributes weight
    * 2^(−age_days) relative to the newest observed day (capped at
    * [[DecayCap]] days — a 2⁻²⁰ tail is noise), giving the
    * recency-weighted count and value sum a freshness dashboard
    * ranks feeds by. The dyadic decay makes the whole computation
    * EXACT integers: weight = 1 << (cap − age) is a bigint, value
    * joins in as cents, and the weighted sums are plain integer
    * aggregations under any partitioning — the only IEEE ops are two
    * final divisions by constants (2²⁰, then 100), identical in both
    * engines. No libm pow, no order-dependent float accumulation.
    * Scale shape: one broadcast of the global max day, then one
    * partial/final agg; weighted cent-sums stay within BIGINT to
    * ~10⁸ events/type (scale path: split the sum by age bucket). */
  def decayAgg(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("ts").isNotNull && col("value").isNotNull)
    val mx = e.agg(max(to_date(col("ts"))).as("mx"))
    e.crossJoin(broadcast(mx))
      .select(col("event_type"),
        expr(s"shiftleft(cast(1 as bigint), $DecayCap - " +
          s"least(datediff(mx, to_date(ts)), $DecayCap))").as("w"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("w")).as("sw"),
        sum(col("w") * col("cents")).as("swv"))
      .select(col("event_type"), col("n_events"),
        round(col("sw").cast("double") / (1L << DecayCap).toDouble, 6)
          .as("decayed_count"),
        round(col("swv").cast("double") / (1L << DecayCap).toDouble / 100.0, 6)
          .as("decayed_value"))
  }

  private val decayAggSql =
    s"""WITH e AS (
       |  SELECT event_type,
       |    (cast(1 as bigint) << ($DecayCap -
       |      least(datediff('day', cast(ts as date),
       |        (SELECT max(cast(ts as date)) FROM events
       |         WHERE ts IS NOT NULL AND value IS NOT NULL)),
       |        $DecayCap))) AS w,
       |    cast(round(value * 100) as bigint) AS cents
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
       |SELECT event_type,
       |  cast(count(*) as bigint) AS n_events,
       |  round(cast(sum(w) as double) / ${(1L << DecayCap).toDouble}, 6)
       |    AS decayed_count,
       |  round(cast(sum(w * cents) as double)
       |    / ${(1L << DecayCap).toDouble} / 100.0, 6) AS decayed_value
       |FROM e GROUP BY 1""".stripMargin

  private val IncidentPpm = 300000L

  /** Incident windows: maximal runs of consecutive hours whose error
    * share exceeds [[IncidentPpm]] — the alerting view an on-call
    * rotation actually pages on (not "an error happened" but "errors
    * have been elevated since 14:00"). Share is integer ppm (no float
    * rate), and the merge is the islands construction: hour − rank is
    * constant within a consecutive run. The run-merge window is
    * partition-less by construction over ≤ CALENDAR hours (8.8k/year
    * — same bounded-input argument as the ANN seed windows), never
    * event volume; everything upstream is one partial/final hourly
    * aggregation. */
  def incidents(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      .withColumn("rate_ppm", expr("err * 1000000 div total"))
      .filter(col("rate_ppm") > IncidentPpm)
      .withColumn("h", expr("unix_timestamp(hour_ts) div 3600"))
    val w = Window.orderBy(col("h"))
    hourly
      .withColumn("grp", col("h") - row_number().over(w))
      .groupBy(col("grp"))
      .agg(min(col("hour_ts")).as("incident_start"),
        max(col("hour_ts")).as("incident_end"),
        count(lit(1)).as("n_hours"),
        max(col("rate_ppm")).as("peak_ppm"),
        sum(col("err")).as("total_errors"))
      .select(col("incident_start"), col("incident_end"), col("n_hours"),
        col("peak_ppm"), col("total_errors"))
  }

  private val incidentsSql =
    s"""WITH h AS (
       |  SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
       |    cast(count(*) as bigint) AS total,
       |    cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      as bigint) AS err
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
       |f AS (
       |  SELECT hour_ts, err, err * 1000000 // total AS rate_ppm,
       |    epoch(hour_ts) // 3600 AS hr
       |  FROM h WHERE err * 1000000 // total > $IncidentPpm),
       |g AS (
       |  SELECT hour_ts, err, rate_ppm,
       |    hr - row_number() OVER (ORDER BY hr) AS grp
       |  FROM f)
       |SELECT min(hour_ts) AS incident_start, max(hour_ts) AS incident_end,
       |  cast(count(*) as bigint) AS n_hours,
       |  cast(max(rate_ppm) as bigint) AS peak_ppm,
       |  cast(sum(err) as bigint) AS total_errors
       |FROM g GROUP BY grp""".stripMargin

  private val CorrHours = 24

  /** Rolling 24 h correlation between hourly error count and hourly
    * value turnover — the "do errors track load" drill-down next to
    * etl_incidents' thresholding. Exactness: per hour x = error
    * count and y = value cents are exact integers, every rolling
    * Σx, Σy, Σxy, Σx², Σy² is an integer window sum (order-free), and
    * the three correlation terms nΣxy−ΣxΣy, nΣx²−(Σx)², nΣy²−(Σy)²
    * stay EXACT LONGS at this scale — the only IEEE ops are one
    * divide and two sqrt on identical integers (at petabyte cent
    * volumes the diffs move to DOUBLE, same fixed sequence).
    * Degenerate windows (either variance 0) yield NULL on both
    * engines. The frame is partition-less but bounded by CALENDAR
    * hours, the same argument as etl_incidents. */
  def rollingCorr(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("x"),
        sum(expr("cast(round(value * 100) as bigint)")).as("y"))
    val w = Window.orderBy(col("hour_ts")).rowsBetween(-(CorrHours - 1), 0)
    val r = hourly.select(col("hour_ts"),
      count(lit(1)).over(w).as("n"),
      sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
      sum(col("x") * col("y")).over(w).as("sxy"),
      sum(col("x") * col("x")).over(w).as("sx2"),
      sum(col("y") * col("y")).over(w).as("sy2"))
    r.select(col("hour_ts"), col("n").as("n_hours"),
      when(
        (col("n") * col("sx2") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("sy2") - col("sy") * col("sy")) > 0,
        (round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt((col("n") * col("sx2") - col("sx") * col("sx")).cast("double"))
            * sqrt((col("n") * col("sy2") - col("sy") * col("sy")).cast("double"))),
          6) + 0.0))
        .otherwise(lit(null).cast("double")).as("corr"))
  }

  private val rollingCorrSql =
    s"""WITH h AS (
       |  SELECT cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
       |    cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      as bigint) AS x,
       |    cast(sum(cast(round(value * 100) as bigint)) as bigint) AS y
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
       |  GROUP BY 1),
       |r AS (
       |  SELECT hour_ts,
       |    cast(count(*) OVER w as bigint) AS n,
       |    cast(sum(x) OVER w as bigint) AS sx,
       |    cast(sum(y) OVER w as bigint) AS sy,
       |    cast(sum(x * y) OVER w as bigint) AS sxy,
       |    cast(sum(x * x) OVER w as bigint) AS sx2,
       |    cast(sum(y * y) OVER w as bigint) AS sy2
       |  FROM h
       |  WINDOW w AS (ORDER BY hour_ts
       |    ROWS BETWEEN ${CorrHours - 1} PRECEDING AND CURRENT ROW))
       |SELECT hour_ts, n AS n_hours,
       |  CASE WHEN (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
       |    THEN round(cast(n * sxy - sx * sy as double)
       |      / (sqrt(cast(n * sx2 - sx * sx as double))
       |        * sqrt(cast(n * sy2 - sy * sy as double))), 6) + 0.0
       |    ELSE NULL END AS corr
       |FROM r""".stripMargin

  /** Benford first-digit expectations log10(1+1/d), d=1..9, as the
    * exact double literals both engines parse identically. */
  private val BenfordP: Seq[Double] = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** Benford first-digit screen per event type — the classic
    * fabricated-numbers detector a DQ suite runs over any value
    * column. Digit counts are one conditional-sum aggregation (nine
    * exact integers per type, one exchange bounded by |types|); the
    * χ² statistic Σ(obs−n·p)²/(n·p) is then assembled per row as a
    * FIXED nine-term addition chain in digit order — no group-sum of
    * floats, so the result is bit-identical cross-engine (the
    * expected shares are literal constants, not libm log calls at
    * query time). The synthetic uniform-ish values WON'T be Benford —
    * the spec asserts the statistic flags them — but real financial/
    * telemetry magnitudes would pass; the operator is the test, not
    * a claim about the corpus. */
  def benford(s: SparkSession, d: String): DataFrame = {
    val digit = expr("cast(substring(cast(cast(round(value * 100) as bigint)" +
      " as string), 1, 1) as int)")
    val counts = Tables.events(s, d)
      .filter(col("value").isNotNull && col("value") >= 0.01)
      .select(col("event_type"), digit.as("d1"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (1 to 9).map(dd =>
          sum(when(col("d1") === dd, 1L).otherwise(0L)).as(s"c$dd")): _*)
    val nD = col("n").cast("double")
    val chi2 = (1 to 9).map { dd =>
      val e = nD * lit(BenfordP(dd - 1))
      (col(s"c$dd").cast("double") - e) * (col(s"c$dd").cast("double") - e) / e
    }.reduce(_ + _)
    counts.select(col("event_type"), col("n"),
      round(chi2, 6).as("chi2"),
      // χ²(8 dof) critical value at 0.001 — fixed literal
      (chi2 > 26.124).as("suspicious"))
  }

  private val benfordSql = {
    val digit = "cast(substring(cast(cast(round(value * 100) as bigint)" +
      " as varchar), 1, 1) as int)"
    val sums = (1 to 9).map(dd =>
      s"cast(sum(CASE WHEN d1 = $dd THEN 1 ELSE 0 END) as bigint) AS c$dd")
      .mkString(",\n    ")
    val chi2 = (1 to 9).map { dd =>
      val e = s"(cast(n as double) * ${BenfordP(dd - 1)})"
      s"((cast(c$dd as double) - $e) * (cast(c$dd as double) - $e) / $e)"
    }.mkString(" + ")
    s"""WITH c AS (
       |  SELECT event_type, cast(count(*) as bigint) AS n,
       |    $sums
       |  FROM (
       |    SELECT event_type, $digit AS d1
       |    FROM events WHERE value IS NOT NULL AND value >= 0.01)
       |  GROUP BY 1)
       |SELECT event_type, n,
       |  round($chi2, 6) AS chi2,
       |  ($chi2) > 26.124 AS suspicious
       |FROM c""".stripMargin
  }

  /** Telemetry schema drift: per day, which JSON property keys
    * appeared ('new'), persisted ('stable'), or vanished ('dropped',
    * emitted with n_events = 0 on the first day of absence) relative
    * to the previous calendar day — the silent-producer-change alarm
    * an ingest pipeline runs on its semi-structured payloads. Key
    * sets come from one explode + (day, key) count; the three
    * statuses are two keyed self-joins on day−1, all bounded by
    * |days|·|keys| regardless of event volume. Validity filters
    * match the engines' shared JSON parser discipline (q_variant's
    * reconciliation): malformed payloads drop on both sides. */
  def schemaDrift(s: SparkSession, d: String): DataFrame = {
    val k = Tables.events(s, d)
      .filter(col("ts").isNotNull && col("props").isNotNull &&
        expr("try_parse_json(props)").isNotNull)
      .select(to_date(col("ts")).as("day"),
        explode(expr("json_object_keys(props)")).as("key"))
      .groupBy(col("day"), col("key")).agg(count(lit(1)).as("n_events"))
      // materialized once: four consumers (presence probe, prev-day
      // shift, day domain, dropped anti-join) would otherwise each
      // re-run the JSON-parse + explode scan; the aggregate is
      // days × keys — bounded at any corpus size
      .transform(graft.Checkpoints.eager)
    val prev = k.select(date_add(col("day"), 1).as("day"), col("key"),
      lit(1L).as("was_present"))
    val present = k.join(prev.select("day", "key", "was_present"),
        Seq("day", "key"), "left")
      .select(col("day"), col("key"), col("n_events"),
        when(col("was_present").isNotNull, "stable").otherwise("new")
          .as("status"))
    val days = k.select(col("day")).distinct()
    val dropped = prev.join(days, "day")
      .join(k, Seq("day", "key"), "left_anti")
      .select(col("day"), col("key"), lit(0L).as("n_events"),
        lit("dropped").as("status"))
    present.unionAll(dropped)
  }

  private val schemaDriftSql =
    """WITH k AS (
      |  SELECT day, key, cast(count(*) as bigint) AS n_events
      |  FROM (
      |    SELECT cast(ts as date) AS day, unnest(json_keys(props)) AS key
      |    FROM events
      |    WHERE ts IS NOT NULL AND props IS NOT NULL AND json_valid(props))
      |  GROUP BY 1, 2),
      |prev AS (SELECT day + 1 AS day, key FROM k),
      |days AS (SELECT DISTINCT day FROM k),
      |present AS (
      |  SELECT k.day, k.key, k.n_events,
      |    CASE WHEN p.key IS NOT NULL THEN 'stable' ELSE 'new' END AS status
      |  FROM k LEFT JOIN prev p ON k.day = p.day AND k.key = p.key),
      |dropped AS (
      |  SELECT p.day, p.key, cast(0 as bigint) AS n_events,
      |    'dropped' AS status
      |  FROM prev p JOIN days USING (day)
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM k WHERE k.day = p.day AND k.key = p.key))
      |SELECT * FROM present
      |UNION ALL
      |SELECT * FROM dropped""".stripMargin

  /** Per-day per-type completeness scorecard: observed distinct hours
    * out of 24 as exact ppm coverage, with a full flag — the grid a
    * pipeline SLA dashboard colors (gap_fill repairs the holes, this
    * REPORTS them). One distinct + one partial/final agg, bounded by
    * days × types × 24. */
  def coverage(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        hour(col("ts")).as("hod"))
      .distinct()
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_hours"))
      .select(col("day"), col("event_type"),
        col("n_hours").cast("int").as("n_hours"),
        expr("n_hours * 1000000 div 24").as("coverage_ppm"),
        (col("n_hours") === 24).as("is_complete"))

  private val coverageSql =
    """SELECT day, event_type, cast(count(*) as int) AS n_hours,
      |  count(*) * 1000000 // 24 AS coverage_ppm,
      |  count(*) = 24 AS is_complete
      |FROM (
      |  SELECT DISTINCT cast(ts as date) AS day, event_type,
      |    hour(ts) AS hod
      |  FROM events WHERE ts IS NOT NULL)
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_coverage" -> (coverage _),
    "etl_schema_drift" -> (schemaDrift _),
    "etl_benford" -> (benford _),
    "etl_rolling_corr" -> (rollingCorr _),
    "etl_incidents" -> (incidents _),
    "etl_decay" -> (decayAgg _),
    "etl_ewma" -> (ewmaSmooth _),
    "etl_zscore_outliers" -> (zscoreOutliers _),
    "etl_mad_outliers" -> (madOutliers _),
    "etl_validate" -> (validate _),
    "etl_dedup_hour" -> (dedupHour _),
    "etl_hourly_rollup" -> (hourlyRollup _),
    "etl_daily_cleanliness" -> (dailyCleanliness _),
    "etl_success_rate" -> (successRate _),
    "etl_recent_runs" -> (recentRuns _),
    "etl_freshness" -> (freshness _),
    "etl_gap_fill" -> (gapFill _),
    "etl_interpolate" -> (interpolate _),
    "etl_profile" -> (profile _),
    "etl_islands" -> (islands _),
    "etl_green_windows" -> (greenWindows _),
    "etl_weekly_trend" -> (weeklyTrend _),
    "etl_late_arrivals" -> (lateArrivals _),
    "etl_seasonal" -> (seasonal _),
    "etl_dq_rules" -> (dqRules _))

  val oracle: Map[String, String] = Map(
    "etl_coverage" -> coverageSql,
    "etl_schema_drift" -> schemaDriftSql,
    "etl_benford" -> benfordSql,
    "etl_rolling_corr" -> rollingCorrSql,
    "etl_incidents" -> incidentsSql,
    "etl_decay" -> decayAggSql,
    "etl_seasonal" -> seasonalSql,
    "etl_dq_rules" -> dqRulesSql,
    "etl_ewma" -> ewmaSmoothSql,
    "etl_zscore_outliers" -> zscoreOutliersSql,
    "etl_mad_outliers" -> madOutliersSql,
    "etl_validate" -> validateSql,
    "etl_dedup_hour" -> dedupHourSql,
    "etl_hourly_rollup" -> hourlyRollupSql,
    "etl_daily_cleanliness" -> dailyCleanlinessSql,
    "etl_success_rate" -> successRateSql,
    "etl_recent_runs" -> recentRunsSql,
    "etl_freshness" -> freshnessSql,
    "etl_gap_fill" -> gapFillSql,
    "etl_interpolate" -> interpolateSql,
    "etl_profile" -> profileSql,
    "etl_islands" -> islandsSql,
    "etl_green_windows" -> greenWindowsSql,
    "etl_weekly_trend" -> weeklyTrendSql,
    "etl_late_arrivals" -> lateArrivalsSql)
}
