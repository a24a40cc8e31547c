package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** §2.H — a full DataSource V2 implementation (the fifth Catalyst
  * extension surface used in this repo, next to the native
  * Expression, custom plan+Strategy, optimizer Rule and
  * TypedImperativeAggregate): a deterministic integer-sequence table
  * `[start, end)` exposed through the connector API with REAL
  * pushdown:
  *
  *  - `SupportsPushDownFilters`: >, >=, <, <=, = predicates on `id`
  *    narrow the generated range BEFORE partition planning — the
  *    analog of parquet row-group pruning, SourcesSpec-verified via
  *    the scan description and the partition count;
  *  - `SupportsPushDownRequiredColumns`: a projection that drops
  *    `id` makes readers emit empty rows (count-only scans move no
  *    data — the columnar-pruning contract).
  *
  * The range splits into `slices` even partitions, each generated
  * independently on its executor — no driver materialization, the
  * same planning shape a 100 TB external-system connector needs.
  *
  * Usage: `spark.read.format("graft.sources.SeqSourceProvider")
  * .option("start", 0).option("end", 1000000).option("slices", 32)
  * .load()`.
  */
class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val start = Option(properties.get("start")).map(_.toLong).getOrElse(0L)
    val end = Option(properties.get("end")).map(_.toLong).getOrElse(1000L)
    val slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8)
    new SeqTable(start, end, slices)
  }
}

object SeqSource {
  val schema: StructType = StructType(Seq(StructField("id", LongType, nullable = false)))
}

class SeqTable(start: Long, end: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"seq($start,$end)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end, slices)
}

class SeqScanBuilder(start0: Long, end0: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = start0
  private var hi = end0 // exclusive
  private var pushed = Array.empty[Filter]
  private var emitId = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
          LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
          EqualTo("id", _: Long) => true
      case _ => false
    }
    // Long.MaxValue bounds need care: v+1 would wrap. The generated
    // domain is [start, end) with end exclusive, so no row can ever
    // be Long.MaxValue — `> MaxValue` and `= MaxValue` match nothing
    // (empty range), `<= MaxValue` matches everything (no-op).
    def empty(): Unit = { hi = lo }
    accepted.foreach {
      case GreaterThan("id", v: Long) =>
        if (v == Long.MaxValue) empty() else lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) =>
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) =>
        if (v == Long.MaxValue) empty()
        else { lo = math.max(lo, v); hi = math.min(hi, v + 1) }
      case _ =>
    }
    pushed = accepted
    // accepted filters are fully applied by the narrowed range — no
    // need for Spark to re-evaluate them (they are not returned as
    // residuals)
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    emitId = requiredSchema.fieldNames.contains("id")

  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), slices, emitId)
}

class SeqScan(lo: Long, hi: Long, slices: Int, emitId: Boolean)
    extends Scan with Batch {

  override def readSchema(): StructType =
    if (emitId) SeqSource.schema else new StructType()

  override def description(): String =
    s"graft-seq [$lo, $hi) slices=$slices emitId=$emitId"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(slices.toLong, math.max(1L, hi - lo)).toInt)
    val width = (hi - lo) / n
    val rem = (hi - lo) % n
    var cursor = lo
    (0 until n).map { i =>
      val len = width + (if (i < rem) 1 else 0)
      val p = SeqPartition(cursor, cursor + len, emitId)
      cursor += len
      p: InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val SeqPartition(s, e, withId) = partition
      new PartitionReader[InternalRow] {
        private var cur = s - 1
        override def next(): Boolean = { cur += 1; cur < e }
        override def get(): InternalRow =
          if (withId) new GenericInternalRow(Array[Any](cur))
          else new GenericInternalRow(Array.empty[Any])
        override def close(): Unit = ()
      }
    }
}

case class SeqPartition(s: Long, e: Long, withId: Boolean) extends InputPartition
