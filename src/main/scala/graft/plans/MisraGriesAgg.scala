package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters sketch as a second custom
  * TypedImperativeAggregate (next to [[BottomKSketchAgg]]): at most
  * `capacity` counters per group; any item occurring more than
  * n/(capacity+1) times is GUARANTEED present, and every reported
  * count lies within [true − n/(capacity+1), true] — the classic
  * frequent-items summary (Misra & Gries 1982; mergeable form per
  * Agarwal et al., "Mergeable Summaries").
  *
  * Merge sums counter maps then, if over capacity, subtracts the
  * (capacity+1)-th largest count from everything and drops the
  * non-positive — the standard mergeable-summaries reduction, which
  * preserves the error bound under ANY partitioning of the input.
  *
  * Determinism contract: in the EXACT regime (distinct items ≤
  * capacity — no decrements ever fire) the sketch IS a plain count
  * per item, independent of order and partitioning, which is how the
  * oracled `q_heavy_hitters` query runs it (hash-compared against
  * GROUP BY counts). In the approx regime counts are order-dependent
  * within the error bound; SketchSpec asserts the presence guarantee
  * and the bound, not byte equality.
  *
  * eval() returns (item, cnt) structs sorted by (cnt desc, item) —
  * a deterministic order whenever the multiset of counters is.
  */
case class MisraGriesAgg(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(capacity > 0, "misra_gries needs capacity > 0")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs a bigint item, got ${item.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  /** Shrink to ≤ capacity by subtracting the (capacity+1)-th largest
    * count — the mergeable-summaries reduction. */
  private def reduceTo(buf: mutable.LongMap[Long]): Unit =
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (capacity + 1)) // (c+1)-th largest
      val keys = buf.keys.toArray
      keys.foreach { k =>
        val v = buf(k) - sub
        if (v > 0) buf(k) = v else buf.remove(k)
      }
    }

  override def update(buf: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      buf.get(k) match {
        case Some(c) => buf(k) = c + 1
        case None =>
          buf(k) = 1L
          reduceTo(buf)
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
                     other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    reduceTo(buf)
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any =
    new GenericArrayData(
      buf.toArray.sortBy { case (k, c) => (-c, k) }
        .map { case (k, c) =>
          new GenericInternalRow(Array[Any](k, c)): Any
        })

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))

  override def prettyName: String = "misra_gries"
}
