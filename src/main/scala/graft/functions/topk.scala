package graft.functions

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import graft.plans.TopKPerKeyNode

/** User-facing API for the custom grouped-top-k operator
  * (graft.plans.TopKPerKeyNode / TopKPerKeyExec). */
object topk {

  /** Sort key: column name + direction. */
  case class Order(name: String, ascending: Boolean = true)

  /** Top `k` rows per key by `order` (make it a total order for
    * deterministic output), with a 1-based `rank` column appended.
    * One shuffle on `keys`; bounded K-heap per key instead of the
    * full partition sort a window function would do.
    *
    * Columns are resolved by name against the input's analyzed plan —
    * custom logical nodes don't get the analyzer's ColumnNode
    * resolution, so the node is built fully resolved. */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Order], k: Int): DataFrame = {
    // self-contained: ensure the planner strategy is present even on a
    // session built without GraftExtensions
    val session = df.sparkSession
    if (!session.experimental.extraStrategies.contains(graft.plans.TopKStrategy)) {
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ graft.plans.TopKStrategy
    }
    GraftColumnBridge.ofPlan(df, child => {
      val byName = child.output.map(a => a.name -> a).toMap
      def attr(n: String) = byName.getOrElse(n,
        throw new IllegalArgumentException(
          s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
      val sortOrders = order.map { o =>
        SortOrder(attr(o.name), if (o.ascending) Ascending else Descending)
      }
      TopKPerKeyNode(keys.map(attr), sortOrders, k,
        TopKPerKeyNode.rankAttribute(), child)
    })
  }

  /** Cap each key to its `k` best rows by `order` (same schema as the
    * input — no rank column), TWO-PHASE SIZE-GATED. [[perKey]]'s
    * bounded heap is built for FEW keys × many rows: its per-key
    * heap map is plain on-heap Scala state, so when keys ≈ rows
    * (per-basket caps over millions of baskets, per-bucket rep caps
    * over mostly-unique LSH buckets) the map copies essentially the
    * whole partition into non-spillable objects — the shape that
    * OOM'd a 16 GB sf10 run (round-9 verdict item 3). The gate
    * restores boundedness: a map-side-combined count (Tungsten hash
    * aggregate — off-heap, spillable) first finds the OVERSIZED keys;
    * only their rows go through the heap (heap state = #oversized ×
    * k), and keys at or under the cap pass through untouched — for
    * them the cap is the identity, so the output is row-identical to
    * capping everything. When NO key exceeds the cap the input
    * DataFrame itself is returned (bounded ≤1-row driver probe, the
    * CorpusOps union-find precedent), preserving the caller's plan
    * exactly — the first gated sf10 run paid +18.5 s dragging the
    * anti-join/union through a relation the cap never touched.
    *
    * Batch-only (the probe executes the count); prefer a cheap or
    * already-materialized input — the gate runs one count over it,
    * and the non-identity path reads the input three times (count,
    * anti-join, heap), so the result is eagerly checkpointed. */
  def capPerKey(df: DataFrame, keys: Seq[String], order: Seq[Order],
                k: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val big = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > k)
      .select(keys.map(col): _*)
    if (big.limit(1).collect().isEmpty) df
    else {
      val cappedBig = perKey(df.join(big, keys), keys, order, k)
        .select(df.columns.map(col).toSeq: _*)
      graft.Checkpoints.eager(
        df.join(big, keys, "left_anti").unionByName(cappedBig))
    }
  }
}
