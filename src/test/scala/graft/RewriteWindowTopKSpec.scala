package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class RewriteWindowTopKSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  test("filter(row_number <= k) is rewritten to the heap operator") {
    val plan = windowTopK(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
  }

  test("rewritten plan returns exactly the window-formulation rows") {
    // compute ground truth with the rewrite suppressed (rank used in a
    // projection, not a bounding filter)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", col("rn") <= 3)
      .collect().filter(_.getAs[Boolean]("keep"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = windowTopK(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("dedup_hour (rn = 1) routes through the heap operator") {
    val plan = graft.operators.EtlOps.dedupHour(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("residual predicates survive next to the rewrite") {
    val df = windowTopK(3).filter(col("o_totalprice") > 1000.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    val n = df.count()
    val nAll = windowTopK(3).count()
    assert(n <= nAll && n > 0)
  }

  test("mixed conjunction: rank bound absorbed, other conjunct filtered") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("o_orderkey") % 2 === 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(df.collect().forall(r => r.getLong(1) % 2 == 0 && r.getInt(3) <= 2))
  }
}
