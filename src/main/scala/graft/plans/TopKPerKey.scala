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

/** Shared per-partition bounded-heap pruning: retain at most the k
  * best rows PER KEY seen in this iterator. Used by both the partial
  * (map-side) and final (post-shuffle) passes. */
private[plans] object TopKHeaps {
  def prune(it: Iterator[InternalRow], keysLocal: Seq[Expression],
            orderLocal: Seq[SortOrder], kLocal: Int,
            childOutput: Seq[Attribute]): mutable.LinkedHashMap[InternalRow, mutable.PriorityQueue[InternalRow]] = {
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
    heaps
  }
}

/** Map-side PARTIAL pass (the HashAggregate partial/final split
  * applied to top-k): no distribution requirement, so it runs before
  * the exchange and bounds what shuffles to ≤ k rows per key per
  * input partition. Sound because a global top-k row can never be
  * displaced by k better rows within its own partition. Without
  * this, a low-cardinality key set (e.g. top-k per language) would
  * funnel the ENTIRE input through |keys| reducers. */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                                 k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val (kLocal, orderLocal, keysLocal, childOutput) = (k, order, keys, child.output)
    child.execute().mapPartitions { it =>
      TopKHeaps.prune(it, keysLocal, orderLocal, kLocal, childOutput)
        .iterator.flatMap(_._2.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (kLocal, orderLocal, keysLocal, childOutput) = (k, order, keys, child.output)
    val rankAttrLocal = rankAttr
    child.execute().mapPartitions { it =>
      val heaps = TopKHeaps.prune(it, keysLocal, orderLocal, kLocal, childOutput)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(childOutput :+ rankAttrLocal,
        childOutput :+ rankAttrLocal)
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
      // partial (map-side) prune below the exchange, exact final above
      TopKPerKeyExec(keys, order, k, rank,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
