package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.exact._

/** Property tests (ScalaCheck driven directly — no scalatest bridge
  * in the offline cache) for the exact-sum discipline: for ANY list
  * of 2-dp values and ANY partitioning, xsum equals the BigDecimal
  * ground truth — the invariant that makes results identical across
  * cluster layouts and the DuckDB oracle. */
class ExactSumsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("xsum == BigDecimal sum for any 2-dp values and partition count") {
    val centsGen = Gen.nonEmptyListOf(Gen.chooseNum(-500000L, 500000L))
    val partsGen = Gen.chooseNum(1, 13)
    check(Prop.forAll(centsGen, partsGen) { (cents, parts) =>
      val vals = cents.map(c => c / 100.0)
      val expected = (BigDecimal(cents.sum) / 100).toDouble
      val got = vals.toDF("v").repartition(parts)
        .agg(xsum(col("v"), 2)).first.getDouble(0)
      got == expected
    }, n = 15)
  }

  test("rolling hash matches a reference fold for any ascii string") {
    import graft.functions.text
    check(Prop.forAll(Gen.listOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      val expected = s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
      val got = Seq(s).toDF("t").select(text.rollingHash(col("t")))
        .first.getLong(0)
      got == expected
    }, n = 15)
  }
}
