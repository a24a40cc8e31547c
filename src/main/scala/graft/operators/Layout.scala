package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** §2.H — data-layout writer for scan pruning at scale.
  *
  * `repartitionByRange` + `sortWithinPartitions` + parquet: every
  * output file covers a DISJOINT range of the layout column, so a
  * range predicate prunes to the few files (and row groups — parquet
  * footer min/max stats are sorted too) that overlap it. This is the
  * difference between a 100 TB scan and a few-GB scan for
  * time-bounded queries over a telemetry table laid out by hour; the
  * write itself is one range-shuffle (sampled split points) plus a
  * local sort, both linear.
  */
object Layout {

  /** Write `df` as `n` range-partitioned files sorted by `colName`. */
  def writeRangeSorted(df: DataFrame, dir: String, colName: String,
                       n: Int): Unit =
    df.repartitionByRange(n, col(colName))
      .sortWithinPartitions(col(colName))
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Morton (Z-order) interleave of `cols` (longs already scaled to
    * `[0, 2^bits)`): bit `i` of column `j` lands at position
    * `i·m + j`. Statically unrolled into `bits·m` OR'd shift terms —
    * one codegen'd narrow expression, no UDF. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val m = cols.size
    val terms = for { i <- 0 until bits; (c, j) <- cols.zipWithIndex }
      yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * m + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Scale a numeric column into `[0, 2^bits)` given its observed
    * (min, max) — the quantization step ahead of the interleave. */
  def scaleToBits(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val maxV = (1L << bits) - 1
    val span = if (mx > mn) mx - mn else 1.0
    least(lit(maxV), greatest(lit(0L),
      floor((c.cast("double") - mn) / span * maxV).cast("long")))
  }

  /** Z-order clustered write: quantize each layout column to `bits`
    * bits (min/max from one cheap stats pass — at production scale
    * these come from catalog stats), interleave into a Morton value,
    * range-partition + locally sort on it, drop it, write parquet.
    *
    * Unlike a single-column sort, which prunes scans ONLY on its
    * leading column, the Z-curve keeps every file's bounding box
    * small in ALL layout dimensions, so parquet footer min/max stats
    * prune selective predicates on ANY of them — the standard
    * multi-dimensional clustering recipe for 100 TB fact tables
    * (see LayoutSpec: a band predicate on the second column overlaps
    * a fraction of z-ordered files but EVERY x-sorted file). Cost is
    * one stats pass + one range shuffle + local sort, all linear. */
  def writeZOrdered(df: DataFrame, dir: String, colNames: Seq[String],
                    n: Int, bits: Int = 16): Unit = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = colNames.zipWithIndex.map { case (c, i) =>
      scaleToBits(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    df.withColumn("__z", zValue(scaled, bits))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }
}
