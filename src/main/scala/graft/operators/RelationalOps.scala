package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.OracleDsl._
import graft.functions.exact._

/** §2.B — relational/OLAP core over the star schema.
  *
  * The reference's analytics are plain SQL over a Postgres time
  * series (README.md:171-195, 391-404); at 100 TB the same warehouse
  * needs the full relational surface. All queries are declarative
  * DataFrame plans: Catalyst pushes filters/projections into the
  * parquet scans, broadcasts the dimension sides of joins
  * (region/nation/supplier/part stay KBs–MBs even at SF100k), and
  * AQE re-plans skew at runtime.
  */
object RelationalOps {

  /** TPC-H Q1-style pricing summary: single scan, 8 aggregates,
    * map-side partial agg then 6-group final — no skew possible. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        xsum(col("l_quantity"), 2).as("sum_qty"),
        xsum(col("l_extendedprice"), 2).as("sum_base_price"),
        xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        xavg(col("l_quantity"), 2).as("avg_qty"),
        xavg(col("l_extendedprice"), 2).as("avg_price"),
        xavg(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1Sql: String = {
    val disc = "l_extendedprice*(1.0 - l_discount)"
    val charge = s"(l_extendedprice*(1.0 - l_discount))*(1.0 + l_tax)"
    s"""SELECT l_returnflag, l_linestatus,
       |  ${oSum("l_quantity", 2)} AS sum_qty,
       |  ${oSum("l_extendedprice", 2)} AS sum_base_price,
       |  ${oSum(disc, 4)} AS sum_disc_price,
       |  ${oSum(charge, 6)} AS sum_charge,
       |  ${oAvg("l_quantity", 2)} AS avg_qty,
       |  ${oAvg("l_extendedprice", 2)} AS avg_price,
       |  ${oAvg("l_discount", 2)} AS avg_disc,
       |  $oCount AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _)
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql
  )
}
