package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the perpetual maintenance job of a 100 TB
  * lake (streaming sinks and RunLog-style appends produce one file
  * per micro-batch/run; scans then drown in file-open overhead).
  *
  * `compact` rewrites a directory to ~`targetBytes` files by sizing
  * the repartition from the actual input footprint, preserving
  * content exactly (count + checksum verified in CompactionSpec).
  * Writes to a temp sibling then swaps, so a failed compaction never
  * loses data. */
object Compaction {

  def inputBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(path).getLength
  }

  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    val bytes = inputBytes(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir.stripSuffix("/") + ".compact_tmp"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val path = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    fs.rename(tmpPath, path)
    nFiles
  }
}
