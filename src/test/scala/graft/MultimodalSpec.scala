package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("typed decode boundary reproduces the expression-based feature path") {
    // binaryMeta's hot path is pure codegen; decodeWithCodec is the
    // mapPartitions boundary a real codec plugs into — for the fake
    // codec the two must agree row for row, so a codec swap changes
    // exactly one function
    val expr = MultimodalOps.binaryMeta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5))).toSet
    val typed = MultimodalOps.decodeWithCodec(spark, sf)(MultimodalOps.fakeCodec)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5))).toSet
    assert(typed == expr)
  }
}
