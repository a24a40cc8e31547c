package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst AGGREGATE function (TypedImperativeAggregate — the
  * imperative-state extension point, complementing the engine's
  * Expression / plan-node / optimizer-rule extensions): a bottom-k
  * sketch keeping the k (hash, payload) pairs with the smallest hash.
  *
  * With a uniform hash this IS a deterministic distributed uniform
  * sample (the KMV / bottom-k sketch): mergeable (union then re-top),
  * order- and partitioning-independent, O(k) state per group —
  * exactly what "sample this 100 TB corpus" needs, where
  * rand()-based sampling is neither reproducible across retries nor
  * mergeable. The same sketch yields a distinct-count estimate
  * ((k-1)/h_max) for free.
  *
  * State is a bounded max-heap (O(log k) insert); partial aggregates
  * serialize as length-prefixed (hash, payload) longs. eval() returns
  * payloads sorted by (hash, payload) — a deterministic total order,
  * so the DuckDB oracle reproduces it with a plain window rank over
  * the mirrored hash expression.
  */
case class BottomKSketchAgg(
    hash: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, "bottomk_sketch needs k > 0")

  override def children: Seq[Expression] = Seq(hash, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // analysis-time type contract: both inputs must already be longs —
  // a silent asInstanceOf on eval results would otherwise surface as
  // an executor ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (hash.dataType == LongType && payload.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bottomk_sketch needs (bigint, bigint) inputs, got " +
        s"(${hash.dataType.simpleString}, ${payload.dataType.simpleString})")

  // max-heap on (hash, payload): the root is the WORST kept pair, so
  // a better candidate replaces it in O(log k)
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def insert(buf: mutable.PriorityQueue[(Long, Long)],
                     h: Long, p: Long): Unit = {
    if (buf.size < k) buf.enqueue((h, p))
    else if (Ordering.Tuple2[Long, Long].lt((h, p), buf.head)) {
      buf.dequeue()
      buf.enqueue((h, p))
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val h = hash.eval(input)
    val p = payload.eval(input)
    if (h != null && p != null) insert(buf, h.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
                     other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { case (h, p) => insert(buf, h, p) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted.map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (h, p) => bb.putLong(h); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), payload = newChildren(1))

  override def prettyName: String = "bottomk_sketch"
}
