package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shared session + basic source smoke. */
object TestSession {
  lazy val spark = GraftSession.get("local[4]", 4)
  val sf = "/root/testdata/sf0.001"
}

class SmokeSpec extends AnyFunSuite {
  test("all ten tables load and are non-empty") {
    val s = TestSession.spark
    Tables.all.foreach { t =>
      assert(Tables.table(s, TestSession.sf, t).count() > 0, s"table $t empty")
    }
  }

  test("events nanosecond timestamps read as microsecond TIMESTAMP_NTZ") {
    val s = TestSession.spark
    val ev = Tables.events(s, TestSession.sf)
    val f = ev.schema("ts").dataType
    assert(f == org.apache.spark.sql.types.TimestampNTZType, s"got $f")
    val mx = ev.selectExpr("max(ts)").collect()(0).get(0).toString
    assert(mx.startsWith("2024-01-"), s"got $mx")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(TestSession.spark).count() > 0)
  }
}
