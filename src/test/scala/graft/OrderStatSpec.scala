package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions.col
import graft.functions.orderstat

/** Property tests for the multi-order-statistic selection
  * (functions.orderstat): for ANY integer list, ANY partitioning and
  * ANY rank set — adjacent ranks (the median pair), extremes, and
  * far-apart ranks that force the per-target windows down the
  * DISJOINT routing path — valuesAt must equal indexing the sorted
  * list. Also pins the scan-count claim: resolving k ranks costs the
  * convergence depth in scans, not k times it. */
class OrderStatSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("valuesAt == sorted-list indexing for any values, ranks, partitioning") {
    val valsGen = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.chooseNum(-20L, 20L),              // dense ties
        Gen.chooseNum(-5000000000L, 5000000000L)))     // wide range
    val partsGen = Gen.chooseNum(1, 7)
    check(Prop.forAll(valsGen, partsGen, Gen.chooseNum(0, 97)) {
      (vals, parts, seed) =>
        val n = vals.length
        val sorted = vals.sorted
        // rank set mixes extremes, the median pair, and a pseudo-random
        // far rank — co-windowed AND disjoint-window rounds both run
        val ps = Seq(0L, (n - 1).toLong, ((n - 1) / 2).toLong,
          (n / 2).toLong, (seed % n).toLong).distinct
        val rel = vals.toDF("c").repartition(parts)
        val got = orderstat.valuesAt(rel, ps)
        ps.forall(p => got(p) == sorted(p.toInt))
    })
  }

  test("duplicate-heavy input and a full rank sweep stay exact") {
    val vals = Seq.fill(40)(7L) ++ Seq.fill(40)(-3L) ++
      (1L to 20L).map(_ * 1000000L)
    val sorted = vals.sorted
    val rel = vals.toDF("c").repartition(5)
    val ps = vals.indices.map(_.toLong)
    val got = orderstat.valuesAt(rel, ps)
    assert(ps.forall(p => got(p) == sorted(p.toInt)))
  }

  test("rank bounds are enforced") {
    val rel = Seq(1L, 2L, 3L).toDF("c")
    intercept[IllegalArgumentException] {
      orderstat.valuesAt(rel, Seq(3L))
    }
    intercept[IllegalArgumentException] {
      orderstat.valuesAt(rel, Seq(-1L))
    }
  }

  test("NULLs are excluded from the rank base; ranks index the non-null sort") {
    val rel = Seq(Some(5L), None, Some(1L), Some(9L), None).toDF("c")
    val got = orderstat.valuesAt(rel, Seq(0L, 1L, 2L))
    assert(got == Map(0L -> 1L, 1L -> 5L, 2L -> 9L))
    // rank 3 is out of the NON-NULL domain even though 5 rows exist
    intercept[IllegalArgumentException] {
      orderstat.valuesAt(rel, Seq(3L))
    }
  }

  test("narrow integer columns are widened, not ClassCastExceptions") {
    val rel = Seq(30, 10, 20).toDF("c")
      .select(col("c").cast("int").as("c"))
    assert(orderstat.valuesAt(rel, Seq(0L, 2L)) == Map(0L -> 10L, 2L -> 30L))
  }

  test("value spans that would overflow window arithmetic are rejected") {
    // trips the domain-headroom guard (maxC too close to MaxValue)
    val relMax = Seq(Long.MaxValue, Long.MaxValue - 1).toDF("c")
    intercept[IllegalArgumentException] {
      orderstat.valuesAt(relMax, Seq(0L))
    }
    // trips the SPAN guard specifically: maxC itself has headroom
    val relSpan = Seq(Long.MinValue, 0L).toDF("c")
    intercept[IllegalArgumentException] {
      orderstat.valuesAt(relSpan, Seq(0L))
    }
  }

  test("domains just inside the headroom guard resolve exactly") {
    // maxC within ~2·headroom of Long.MaxValue: every refined window
    // end stays below MaxValue — the wrap regression a top-bucket
    // refinement would hit without the headroom analysis
    val base = Long.MaxValue - 30000L
    val vals = Seq(base, base + 7, base + 9999)
    val got = orderstat.valuesAt(vals.toDF("c"), Seq(0L, 1L, 2L))
    assert(got == Map(0L -> base, 1L -> (base + 7), 2L -> (base + 9999)))
  }
}
