package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's flagship smoke: SparkEntry.entry on a BARE
  * session (none of GraftSession's configs/extensions) — the entry
  * path must not depend on them. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    assert(n > 0)
    spark.stop()
  }
}
