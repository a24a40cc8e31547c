package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.OracleDsl._
import graft.functions.exact._

/** §2.G — streaming semantics (the reference ingests a live feed
  * hourly; etl_job.py:96-137). Each operator here has a batch
  * evaluation (below — what Verify/the oracle check: Structured
  * Streaming's mantra is that a streaming query returns what the
  * batch query would) and a true `readStream` path exercised in
  * StreamingSpec with MemoryStream + watermarks/state.
  */
object StreamingOps {

  // -------------------------------------------------- tumbling window

  /** 6h tumbling-window counts/sums per event type — the streaming
    * rollup of the reference's hourly telemetry. Batch form uses the
    * same `window()` expression the streaming query runs with a
    * watermark; the oracle reproduces the epoch-aligned bucket
    * arithmetic explicitly. */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), xsum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  private val tumblingSql =
    s"""SELECT date_trunc('day', ts) + cast(floor(hour(ts) / 6) * 6 as bigint) * INTERVAL 1 HOUR
       |    AS window_start,
       |  event_type, $oCount AS n_events, ${oSum("value", 2)} AS sum_value
       |FROM events
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------ sessionize

  private val GapMinutes = 30

  /** Gap-based sessionization: a session break is a ≥30-min silence
    * per user. Batch form = lag + running sum of breaks (one shuffle
    * on user_id); the streaming form in StreamingSpec keeps the same
    * session state in flatMapGroupsWithState. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(wSeq))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        col("ts") > col("prev_ts") + expr(s"INTERVAL $GapMinutes MINUTES"), 1L)
        .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        xsum(col("value"), 2).as("sum_value"))
  }

  private val sessionizeSql =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts > lag(ts) OVER w + INTERVAL $GapMinutes MINUTE
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS session_id
       |  FROM marked)
       |SELECT user_id, cast(session_id as bigint) AS session_id,
       |  $oCount AS n_events,
       |  cast(min(ts) as timestamp) AS session_start,
       |  cast(max(ts) as timestamp) AS session_end,
       |  ${oSum("value", 2)} AS sum_value
       |FROM sess
       |GROUP BY user_id, session_id""".stripMargin

  // ------------------------------------------- native session window

  /** The same gap sessionization through Spark's NATIVE
    * `session_window` operator (merging-window aggregation — the form
    * a streaming query with watermark uses directly). Window bounds:
    * start = first event, end = last event + gap; the oracle
    * reproduces them from the window-function formulation. */
  def sessionWindowNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), s"$GapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), xsum(col("value"), 2).as("sum_value"))
      .select(col("user_id"),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("w.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("sum_value"))

  private val sessionWindowNativeSql =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts > lag(ts) OVER w + INTERVAL $GapMinutes MINUTE
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS session_id
       |  FROM marked)
       |SELECT user_id,
       |  cast(min(ts) as timestamp) AS session_start,
       |  cast(max(ts) as timestamp) + INTERVAL $GapMinutes MINUTE AS session_end,
       |  $oCount AS n_events,
       |  ${oSum("value", 2)} AS sum_value
       |FROM sess
       |GROUP BY user_id, session_id""".stripMargin

  // ------------------------------------------------- streaming dedup

  /** Keyed stream deduplication: at most one event per (user, type,
    * hour), keeping the earliest — the streaming generalization of the
    * reference's keep-first-per-hour insert guard (etl_job.py:227-237)
    * with state bounded by the watermark. Batch form below (what the
    * oracle checks); the true streaming path in StreamingSpec uses
    * `dropDuplicatesWithinWatermark` over the same key, whose state
    * store holds only keys younger than the watermark — bounded state
    * at any corpus rate. The row_number form rewrites to the bounded-
    * heap top-k operator via the RewriteWindowTopK rule. */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("hour_ts"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("hour_ts", date_trunc("hour", col("ts")).cast("timestamp_ntz"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "hour_ts", "event_id", "ts", "value")
  }

  private val streamDedupSql =
    """SELECT user_id, event_type,
      |  cast(date_trunc('hour', ts) as timestamp) AS hour_ts,
      |  event_id, cast(ts as timestamp) AS ts, value
      |FROM events
      |QUALIFY row_number() OVER (
      |  PARTITION BY user_id, event_type, date_trunc('hour', ts)
      |  ORDER BY ts, event_id) = 1""".stripMargin

  // ---------------------------------------- stream-static enrichment

  /** Stream-static enrichment: the event stream joins two broadcast
    * dimensions (customer → nation) and rolls up per (nation, 6h
    * window) — the canonical streaming-enrichment shape. In the
    * streaming form the dim join is a broadcast against each
    * micro-batch (no stream-stream state, no watermark interaction
    * with the join — only the windowed agg holds state);
    * StreamingSpec runs the same plan over a MemoryStream and gets
    * the identical batch answer. */
  def enrich(s: SparkSession, d: String): DataFrame =
    enrichFromEvents(Tables.events(s, d), s, d)

  private[graft] def enrichFromEvents(events: DataFrame,
                                      s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    events
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(window(col("ts"), "6 hours").as("w"), col("n_name"))
      .agg(count(lit(1)).as("n_events"), xsum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n_name").as("nation"),
        col("n_events"), col("sum_value"))
  }

  private val enrichSql =
    s"""SELECT date_trunc('day', ts) + cast(floor(hour(ts) / 6) * 6 as bigint) * INTERVAL 1 HOUR
       |    AS window_start,
       |  n_name AS nation, $oCount AS n_events, ${oSum("value", 2)} AS sum_value
       |FROM events e
       |JOIN customer c ON e.user_id = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- sliding window

  /** 24h windows sliding every 6h per event type — the overlapping-
    * window rollup (each event lands in 4 windows). Same `window()`
    * expression in batch and streaming; the oracle assigns each row
    * its 4 epoch-aligned window starts explicitly (floor-to-6h minus
    * k·6h, k=0..3). At scale this is a single partial/final
    * aggregation — the ×4 fan-out happens inside the window
    * expression, not as a shuffle. */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "24 hours", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), xsum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  private val slidingSql =
    s"""WITH ks AS (SELECT unnest([0,1,2,3]) AS k),
       |assigned AS (
       |  SELECT date_trunc('day', ts)
       |      + cast(floor(hour(ts)/6)*6 - 6*k as bigint) * INTERVAL 1 HOUR
       |      AS window_start,
       |    event_type, value
       |  FROM events CROSS JOIN ks)
       |SELECT window_start, event_type, $oCount AS n_events,
       |  ${oSum("value", 2)} AS sum_value
       |FROM assigned GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- windowed heavy hitters

  private val TopKPerWindow = 3

  /** Per-window top-k heavy hitters: the 3 busiest event types in
    * every 6h window — the streaming "trending now" rollup. Batch
    * form: one windowed partial/final count (cardinality bounded by
    * windows × types), then the bounded-heap top-k — the rank never
    * sees raw events. Streaming form (StreamingSpec): the SAME
    * windowed count runs incrementally with a watermark, and the
    * rank is applied per micro-batch epoch on the (tiny) aggregate
    * state — at 100 TB/day the stateful side holds one counter per
    * (window, type), not per event. */
  def topkPerWindow(s: SparkSession, d: String): DataFrame =
    rankWindows(Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events")))

  /** Rank stage shared by the batch operator and the streaming
    * spec's per-epoch evaluation — one definition, no drift. */
  private[graft] def rankWindows(counts: DataFrame): DataFrame =
    graft.functions.topk.perKey(counts,
      keys = Seq("window_start"),
      order = Seq(graft.functions.topk.Order("n_events", ascending = false),
        graft.functions.topk.Order("event_type")),
      k = TopKPerWindow)
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("rank"))

  private val topkPerWindowSql =
    s"""WITH counts AS (
       |  SELECT date_trunc('day', ts)
       |      + cast(floor(hour(ts) / 6) * 6 as bigint) * INTERVAL 1 HOUR
       |      AS window_start,
       |    event_type, $oCount AS n_events
       |  FROM events GROUP BY 1, 2)
       |SELECT window_start, event_type, n_events,
       |  cast(row_number() OVER (PARTITION BY window_start
       |    ORDER BY n_events DESC, event_type) as int) AS rank
       |FROM counts
       |QUALIFY rank <= $TopKPerWindow""".stripMargin

  // -------------------------------------------------------- CDC apply

  /** CDC change-stream application: fold a keyed change log into the
    * CURRENT-STATE table — last-writer-wins per user by (ts,
    * event_id), with "error" events acting as DELETE tombstones (the
    * key disappears). Batch form: the standard `row_number() = 1`
    * latest-row pattern — which Catalyst rewrites through the custom
    * bounded-heap top-k rule, so no per-user sort materializes — then
    * the tombstone filter. The streaming twin ([[StreamCdc]],
    * mapGroupsWithState, state = one record per live key) emits the
    * same current state per micro-batch; StreamingSpec proves
    * stream ≡ batch over a MemoryStream. This is the MERGE INTO /
    * materialized-upsert-view pattern a 100 TB warehouse runs on its
    * change feeds. */
  def cdcApply(s: SparkSession, d: String): DataFrame =
    cdcApplyImpl(Tables.events(s, d))

  private[graft] def cdcApplyImpl(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .filter(col("event_type") =!= StreamCdc.DeleteOp)
      .select(col("user_id"), col("event_type").as("last_op"),
        col("value").as("current_value"), col("ts").as("updated_at"))
  }

  private val cdcApplySql =
    s"""WITH latest AS (
       |  SELECT user_id, event_type, value, ts,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events)
       |SELECT user_id, event_type AS last_op, value AS current_value,
       |  cast(ts as timestamp) AS updated_at
       |FROM latest
       |WHERE rn = 1 AND event_type <> '${StreamCdc.DeleteOp}'""".stripMargin

  // ------------------------------------- stream-stream interval join

  /** Stream-stream interval join: each error event matched to the
    * SAME user's purchases in the following hour — conversion-after-
    * failure attribution. In the streaming form both sides carry
    * watermarks and the join condition bounds the event-time range,
    * so each side's state store is capped at (watermark + 1h) of
    * rows; StreamingSpec runs it over two MemoryStreams and matches
    * this batch evaluation. Batch plan: one shuffle on user_id, AQE
    * picks the join strategy. */
  def intervalJoin(s: SparkSession, d: String): DataFrame =
    intervalJoinImpl(Tables.events(s, d), Tables.events(s, d))

  /** `errs`/`purchases` are the two live sides (batch frames in
    * Verify; watermarked MemoryStreams in StreamingSpec). */
  private[graft] def intervalJoinImpl(errs: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errs.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    e.join(p, col("user_id") === col("p_user") &&
        col("purchase_ts") > col("err_ts") &&
        col("purchase_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("err_id"), col("purchase_id"), col("user_id"),
        col("err_ts"), col("purchase_ts"), col("purchase_value"))
  }

  private val intervalJoinSql =
    """SELECT a.event_id AS err_id, b.event_id AS purchase_id, a.user_id,
      |  cast(a.ts as timestamp) AS err_ts,
      |  cast(b.ts as timestamp) AS purchase_ts,
      |  b.value AS purchase_value
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'error' AND b.event_type = 'purchase'
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin

  // ------------------------------------------------- anomaly alerts

  private val AlertZ = 3.0

  /** Streaming anomaly alerting: per-(event_type, 6h window) outlier
    * counts against STATIC per-type stats — the alerting view a
    * monitoring pipeline keeps over live telemetry. The stats
    * (exact scaled-integer mean/std, same construction as
    * etl_zscore_outliers) are a tiny broadcast stream-static join —
    * the only state the streaming form holds is the windowed count.
    * StreamingSpec runs the identical plan over MemoryStream with a
    * watermark and gets the identical batch answer. */
  def zscoreAlerts(s: SparkSession, d: String): DataFrame =
    zscoreAlertsImpl(Tables.events(s, d), Tables.events(s, d))

  /** `stream` is the live side (batch frame in Verify; MemoryStream
    * in StreamingSpec); `hist` is the static history the stats come
    * from. The stats construction (and its SQL mirror) is SHARED
    * with `etl_zscore_outliers` — one definition, no oracle drift. */
  private[graft] def zscoreAlertsImpl(stream: DataFrame, hist: DataFrame): DataFrame = {
    val vc = graft.operators.EtlOps.zscoreValueScaled
    stream
      .join(broadcast(graft.operators.EtlOps.zscoreStats(hist)), Seq("event_type"))
      .withColumn("z", (vc.cast("double") - col("mean_c")) / col("std_c"))
      .filter(abs(col("z")) > AlertZ)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_outliers"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_outliers"))
  }

  private val zscoreAlertsSql =
    s"""WITH ${graft.operators.EtlOps.zscoreStatsSqlCte}
       |SELECT date_trunc('day', ts)
       |    + cast(floor(hour(ts) / 6) * 6 as bigint) * INTERVAL 1 HOUR
       |    AS window_start,
       |  event_type, $oCount AS n_outliers
       |FROM events JOIN st USING (event_type)
       |WHERE abs(${graft.operators.EtlOps.zscoreZSql}) > $AlertZ
       |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------- streaming ingest dedup

  /** Streaming crawl-ingest dedup over a PERSISTED feature store —
    * each micro-batch is [[graft.operators.DedupFeatureStore.fold]]:
    * featurize the batch (the only text pass), verdict it against
    * every generation already in the store (seed + all prior
    * batches — a re-crawled twin arriving later is flagged against a
    * prior batch's doc, the planted cross-batch case StreamingSpec
    * proves), append the batch's features as its own generation.
    * Verdict rows go to `sink`.
    *
    * Per-batch cost is O(batch text work + candidates): the base is
    * touched ONLY through the store's columnar feature tables (the
    * rep-capped bucket join, the candidate-bounded intersection, the
    * hashed exact-equality join) — base TEXT is never re-read, the
    * fix for the round-9 scale-killer where every micro-batch
    * re-shingled batch ∪ base. StreamingSpec asserts the per-batch
    * executed plan's file scans all live under the store path.
    *
    * Recovery: state lives on disk keyed by generation, not in driver
    * memory. Generations are NOT the raw batchId (a new run's batchIds
    * restart at 0 and would overwrite the old run's generations —
    * round-10 ADVICE): each run folds at gen = base + batchId, where
    * base comes from [[graft.operators.DedupFeatureStore.runBase]] —
    * persisted per checkpoint location at first start, so a RESTART of
    * the same run maps a replayed batchId back to its original
    * generation and [[graft.operators.DedupFeatureStore.fold]]'s
    * replay idempotence holds (its base excludes its own generation;
    * its append overwrites it): at-least-once replay re-emits the same
    * verdict rows — the reference's check-then-insert guarantee, now
    * across restarts too. A NEW run (fresh or no checkpoint) starts
    * strictly above every generation already folded, so it RESUMES the
    * store (cross-session re-crawl) instead of clobbering it.
    *
    * `docsStream` needs (doc_id, text); returns the started query. */
  def ingestDedup(docsStream: DataFrame,
                  store: graft.operators.DedupFeatureStore,
                  checkpointDir: Option[String] = None)
                 (sink: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val base = store.runBase(checkpointDir)
    val w = docsStream.writeStream.outputMode("append")
    checkpointDir.fold(w)(p => w.option("checkpointLocation", p))
      .foreachBatch { (batchRaw: DataFrame, id: Long) =>
        val batch = graft.Checkpoints.eager(
          batchRaw.select("doc_id", "text"))
        if (!batch.isEmpty) sink(id, store.fold(batch, base + id))
        ()
      }
      .start()
  }

  /** [[ingestDedup]] from a seed corpus: builds (overwrites) the
    * feature store at `storePath` from `base0`, then streams against
    * it. */
  def ingestDedup(docsStream: DataFrame, base0: DataFrame,
                  storePath: String)
                 (sink: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestDedup(docsStream,
      graft.operators.DedupFeatureStore.build(base0, storePath))(sink)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_zscore_alerts" -> (zscoreAlerts _),
    "stream_enrich" -> (enrich _),
    "stream_tumbling" -> (tumbling _),
    "stream_sliding" -> (sliding _),
    "stream_topk" -> (topkPerWindow _),
    "stream_cdc" -> (cdcApply _),
    "stream_join" -> (intervalJoin _),
    "stream_sessionize" -> (sessionize _),
    "stream_session_native" -> (sessionWindowNative _),
    "stream_dedup" -> (streamDedup _))

  val oracle: Map[String, String] = Map(
    "stream_zscore_alerts" -> zscoreAlertsSql,
    "stream_enrich" -> enrichSql,
    "stream_tumbling" -> tumblingSql,
    "stream_sliding" -> slidingSql,
    "stream_topk" -> topkPerWindowSql,
    "stream_cdc" -> cdcApplySql,
    "stream_join" -> intervalJoinSql,
    "stream_sessionize" -> sessionizeSql,
    "stream_session_native" -> sessionWindowNativeSql,
    "stream_dedup" -> streamDedupSql)
}
