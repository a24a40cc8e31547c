package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
}
