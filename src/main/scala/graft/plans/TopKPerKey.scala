package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator (§3 preference (c): a
  * custom LogicalPlan + Strategy + SparkPlan, for semantics Spark
  * only reaches via sort-based windows).
  *
  * `row_number() OVER (PARTITION BY k ORDER BY o) <= K` fully sorts
  * every partition's rows before discarding all but K. This operator
  * keeps a bounded K-element heap per key instead: O(n log K) time,
  * O(keys·K) memory, one shuffle on the grouping key (declared via
  * requiredChildDistribution — EnsureRequirements inserts the
  * exchange, AQE still applies). Output = child columns + `rank`
  * (1-based, by the given order). Make the order a total order for
  * deterministic results.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyNode {
  def rankAttribute(): Attribute = AttributeReference("rank", IntegerType, nullable = false)()
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val ordering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      // max-heap per key: head is the WORST retained row, evicted when
      // a better one arrives
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(childOutput :+ rankAttr,
        childOutput :+ rankAttr)
      heaps.iterator.flatMap { case (_, heap) =>
        val best: Seq[InternalRow] = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.setInt(0, i + 1)
          resultProj(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rank, child) =>
      TopKPerKeyExec(keys, order, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}
