package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.H — incremental aggregate maintenance ("incremental view
  * maintenance" for the hourly rollup): fold a new micro-batch of
  * events into an EXISTING rollup state without rescanning history.
  *
  * The reference recomputes its hourly view from the full table on
  * every query (README SQL over grid_telemetry); at 100 TB the
  * rollup must be maintained, not recomputed. The trick is a
  * COMBINABLE state schema: counts, non-null counts, scaled-integer
  * sums (the [[graft.functions.exact]] discipline — integer partial
  * sums are associative, so merging state equals re-aggregating raw
  * events, exactly), and min/max. The published view (with exact
  * avg) is a pure projection of the state.
  *
  * Scale shape: the delta batch touches few hours; `merge` splits
  * existing state into touched (left-semi on the delta's hour keys —
  * with the state stored hour-partitioned this is partition pruning:
  * untouched files are never read) and untouched (left-anti), and
  * only the touched slice re-aggregates. IncrementalSpec proves
  * merge ≡ full recompute and that an empty delta is an identity.
  */
object IncrementalRollup {

  private val keys = Seq("hour_ts", "event_type")
  private val Digits = 2
  private val Scale = math.pow(10, Digits)

  // the shared per-row scaling — same expression xsum aggregates, so
  // publish() stays bit-identical to EtlOps.hourlyRollup
  private def scaled(c: Column): Column =
    graft.functions.exact.scaled(c, Digits)

  /** Combinable rollup state from raw events. */
  def state(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("value")).as("n_vals"),
        sum(scaled(col("value"))).as("sum_scaled"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Fold a batch into existing state touching only affected keys.
    * The semi/anti split uses NULL-SAFE key equality (`<=>`): a null
    * hour_ts or event_type is a legitimate group (groupBy treats
    * null as a value), and plain `=` would route its existing row to
    * `untouched` while the delta re-emits it — duplicating the group
    * and breaking merge ≡ recompute (IncrementalSpec covers it). */
  def merge(existing: DataFrame, newEvents: DataFrame): DataFrame = {
    val delta = state(newEvents)
    val touchedKeys = delta.select(keys.map(col): _*).distinct().alias("tk")
    val ex = existing.alias("ex")
    val cond = keys.map(k => col(s"ex.$k") <=> col(s"tk.$k")).reduce(_ && _)
    val touched = ex.join(touchedKeys, cond, "left_semi")
    val untouched = ex.join(touchedKeys, cond, "left_anti")
    val combined = touched.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("n_vals")).as("n_vals"),
        sum(col("sum_scaled")).as("sum_scaled"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
    untouched.unionByName(combined)
  }

  /** The rollup view — identical semantics to `EtlOps.hourlyRollup`
    * (exact 2-dp sum, exact avg over non-null values). */
  def publish(st: DataFrame): DataFrame =
    st.select(col("hour_ts"), col("event_type"), col("n_events"),
      (col("sum_scaled").cast("double") / Scale).as("sum_value"),
      (col("sum_scaled").cast("double") / Scale / col("n_vals"))
        .as("avg_value"),
      col("min_value"), col("max_value"))
}
