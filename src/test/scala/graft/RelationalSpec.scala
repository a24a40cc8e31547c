package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("approx sketches land within tolerance of exact answers") {
    val approx = RelationalOps.approxStats(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"),
        expr("percentile(l_extendedprice, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val nExact = e.getLong(1).toDouble
      // HLL++ default rsd is 0.05 (typical, not a bound) — allow 3 sigma
      assert(math.abs(a.getLong(1) - nExact) / nExact < 0.15,
        s"$flag approx distinct off by >15%")
      val medExact = e.getDouble(2)
      assert(math.abs(a.getDouble(3) - medExact) / medExact < 0.05,
        s"$flag approx median off by >5%")
    }
  }

  test("asof join: every purchase row appears once; matches are at-or-before") {
    val out = RelationalOps.asofJoin(spark, sf)
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == nPurch)
    assert(out.filter(col("last_error_ts") > col("ts")).count() == 0)
  }

  test("topk plan is a TakeOrdered, not a global sort") {
    val plan = RelationalOps.topkOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q5 pushes the region filter into the scan") {
    val plan = RelationalOps.q5LocalSupplier(spark, sf)
      .queryExecution.toString
    assert(plan.contains("PushedFilters") || plan.contains("ASIA"))
  }
}
