package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-escalation generator: writes a `factor`×
  * copy of a testdata directory by replicating every fact table with
  * per-copy key offsets (copy i shifts each entity key by i·stride,
  * stride = max(key)+1 of the source domain), keeping foreign keys
  * consistent within each copy and the fixed dimensions (region /
  * nation) as-is.
  *
  * Replication-with-offsets rather than fresh synthesis, on purpose:
  * value distributions, group cardinalities per key, date ranges and
  * text content match the driver's generator EXACTLY at every scale,
  * and the all-copies-identical documents/embeddings are a deliberate
  * worst case for the dedup/ANN bucket caps (every doc arrives with
  * 9 exact siblings — the boilerplate/duplication regime a 100 TB
  * crawl actually has). No randomness anywhere: same input → same
  * bytes.
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <outDir> <factor>
  *          [partitioned]
  *
  * With the `partitioned` flag, the date-bearing fact tables are laid
  * out under generated day directories (`gpart_l_shipdate_day=…`,
  * `gpart_o_orderdate_day=…`, `gpart_ts_day=…` — the 100 TB
  * convention [[graft.plans.PartitionDatePruning]] prunes): the
  * source column STAYS in the data files, so readers see the exact
  * flat-layout schema (Tables.table drops the gpart_* column) and
  * the DuckDB oracle reads the files without hive interpretation.
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val Array(src, out, fStr) = args.take(3)
    val factor = fStr.toInt
    val partitioned = args.length > 3 && args(3) == "partitioned"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    generate(spark, src, out, factor, partitioned)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
               factor: Int, partitioned: Boolean = false): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // cast the aggregate to long IN the query (an INT-typed source
    // column would otherwise ClassCastException in getLong) and fail
    // with the offending table/column named when max() is null (empty
    // table → stride undefined)
    def stride(t: String, c: String): Long = {
      val row = read(t).agg(max(col(c)).cast("long")).collect()(0)
      if (row.isNullAt(0)) sys.error(
        s"GenScale: cannot derive key stride for $t.$c — table is empty")
      row.getLong(0) + 1L
    }

    // one stride per entity domain, from the SOURCE data
    val st = Map(
      "C" -> stride("customer", "c_custkey"),
      "S" -> stride("supplier", "s_suppkey"),
      "P" -> stride("part", "p_partkey"),
      "O" -> stride("orders", "o_orderkey"),
      "E" -> stride("events", "event_id"),
      "U" -> stride("events", "user_id"),
      "D" -> stride("documents", "doc_id"),
      "V" -> stride("embeddings", "vec_id"))

    // fixed dimensions: copied through unchanged
    for (t <- Seq("region", "nation"))
      read(t).write.mode("overwrite").parquet(s"$out/$t.parquet")

    /** Replicate `t` `factor`× with `keys` (column → domain) offset
      * per copy. Output repartitioned so every downstream shuffle has
      * real map-side parallelism (multi-file layout — also what lets
      * AQE split skewed partitions, see RelationalSpec). */
    /** Day-partition source column per table (partitioned mode).
      * events.ts arrives as raw nanosecond Longs under the
      * nanosAsLong reader flag in some source layouts — floor through
      * μs exactly as Tables.events converts, so directory days match
      * query days; NTZ sources floor directly. */
    def partSrc(t: String, df: DataFrame): Option[Column] = t match {
      case "lineitem" => Some(to_date(col("l_shipdate")))
      case "orders"   => Some(to_date(col("o_orderdate")))
      case "events"   => Some(df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => to_date(expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case _ => to_date(col("ts"))
      })
      case _ => None
    }
    def gpartName(t: String): String = t match {
      case "lineitem" => "gpart_l_shipdate_day"
      case "orders"   => "gpart_o_orderdate_day"
      case "events"   => "gpart_ts_day"
    }

    def rep(t: String, keys: (String, String)*): Unit = {
      val df = read(t)
      val copies = df.withColumn("gen_i",
        explode(sequence(lit(0L), lit(factor - 1L))))
      val shifted = keys.foldLeft(copies) { case (acc, (c, dom)) =>
        acc.withColumn(c, col(c) + col("gen_i") * lit(st(dom)))
      }.drop("gen_i")
      val pcol = if (partitioned) partSrc(t, df) else None
      if (pcol.isDefined) {
        val g = gpartName(t)
        // repartition BY the day column: each day's rows land in one
        // task, so every day directory holds one file instead of one
        // per shuffle partition (2.5k dirs × 16 files would be the
        // classic small-files mistake)
        shifted.withColumn(g, pcol.get)
          .repartition(col(g))
          .write.mode("overwrite").partitionBy(g)
          .parquet(s"$out/$t.parquet")
      } else
        shifted
          .repartition(16)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    rep("customer", "c_custkey" -> "C")
    rep("supplier", "s_suppkey" -> "S")
    rep("part", "p_partkey" -> "P")
    rep("orders", "o_orderkey" -> "O", "o_custkey" -> "C")
    rep("lineitem", "l_orderkey" -> "O", "l_partkey" -> "P",
      "l_suppkey" -> "S")
    rep("events", "event_id" -> "E", "user_id" -> "U")
    rep("documents", "doc_id" -> "D")
    rep("embeddings", "vec_id" -> "V")
  }
}
