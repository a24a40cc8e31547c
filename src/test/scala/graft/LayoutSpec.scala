package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout
import java.nio.file.Files

/** Range-sorted layout: files must cover pairwise-disjoint ranges of
  * the layout column (the property footer-stats pruning relies on). */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("writeRangeSorted produces files with disjoint l_shipdate ranges") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/li"
    Layout.writeRangeSorted(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate"),
      dir, "l_shipdate", 8)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("lo"),
        r.getAs[java.time.LocalDateTime]("hi")))
      .sortBy(_._1)
    assert(perFile.length > 1, "expected multiple range files")
    perFile.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(!hiA.isAfter(loB), s"overlapping file ranges: $hiA > $loB")
      case _ =>
    }
    // row count preserved
    assert(spark.read.parquet(dir).count() ==
      Tables.lineitem(spark, sf).count())
  }
}
