package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import graft.plans.BottomKSketchAgg

/** User-facing API for the custom imperative-aggregate sketches. */
object sketch {

  /** Bottom-k-by-hash sample: the k payloads with the smallest
    * (hash, payload) pairs, as an array sorted by that order.
    * Deterministic, mergeable, partitioning-independent — a
    * reproducible distributed uniform sample when `hash` is a
    * uniform hash of the row. */
  def bottomK(hash: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomKSketchAgg(
        GraftColumnBridge.expression(hash),
        GraftColumnBridge.expression(payload), k).toAggregateExpression())

  /** Misra–Gries frequent-items sketch: ≤ `capacity` (item, cnt)
    * counters, guaranteed to contain every item with frequency >
    * n/(capacity+1), counts within n/(capacity+1) of truth, mergeable
    * under any partitioning. Exact when distinct items ≤ capacity. */
  def heavyHitters(item: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      graft.plans.MisraGriesAgg(
        GraftColumnBridge.expression(item), capacity).toAggregateExpression())
}
