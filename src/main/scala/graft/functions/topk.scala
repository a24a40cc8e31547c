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
}
