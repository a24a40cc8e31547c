package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.exact._

class ExactSumsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("xsum is exact and partitioning-independent") {
    val vals = (1 to 10000).map(i => (i % 997) * 0.01)
    val one = vals.toDF("v").repartition(1).agg(xsum(col("v"), 2)).first.getDouble(0)
    val many = vals.toDF("v").repartition(37).agg(xsum(col("v"), 2)).first.getDouble(0)
    val expected = vals.map(v => math.round(v * 100)).sum / 100.0
    assert(one == expected && many == expected)
  }

  test("xavg divides the exact sum by the group count") {
    val df = Seq(1.11, 2.22, 3.34).toDF("v")
    val got = df.agg(xavg(col("v"), 2)).first.getDouble(0)
    assert(got == (111L + 222L + 334L) / 100.0 / 3)
  }

  test("xsum handles negative values (half away from zero)") {
    val got = Seq(-1.005, 2.005).toDF("v").agg(xsum(col("v"), 2)).first.getDouble(0)
    // -1.005 and 2.005 are not exactly representable; both engines see
    // the same doubles, so the result is simply deterministic
    assert(math.abs(got - 1.0) < 0.011)
  }
}
