package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EtlOps, IncrementalRollup}

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("merging a split stream equals the full recompute, bit for bit") {
    val ev = Tables.events(spark, sf)
    // split by an arbitrary predicate that straddles hours: old rows
    // vs a "late batch" — the realistic incremental arrival shape
    val old = ev.filter(col("event_id") % 7 =!= 0)
    val late = ev.filter(col("event_id") % 7 === 0)
    val incremental = IncrementalRollup.publish(
      IncrementalRollup.merge(IncrementalRollup.state(old), late))
    val full = IncrementalRollup.publish(IncrementalRollup.state(ev))
    assert(canon(incremental) == canon(full),
      "incremental maintenance must equal the full recompute exactly")
    // and the published view matches the oracled hourly rollup
    assert(canon(full) == canon(EtlOps.hourlyRollup(spark, sf)))
  }

  test("null grouping keys merge as one group, not duplicates") {
    // inject a null event_type slice: groupBy treats null as a value,
    // and the semi/anti split must route it with null-safe equality
    val ev = Tables.events(spark, sf).withColumn("event_type",
      when(col("event_id") % 11 === 0, lit(null).cast("string"))
        .otherwise(col("event_type")))
    val old = ev.filter(col("event_id") % 2 === 0)
    val late = ev.filter(col("event_id") % 2 =!= 0)
    val incremental = IncrementalRollup.publish(
      IncrementalRollup.merge(IncrementalRollup.state(old), late))
    val full = IncrementalRollup.publish(IncrementalRollup.state(ev))
    assert(incremental.filter(col("event_type").isNull).count() ==
      full.filter(col("event_type").isNull).count(),
      "null-key groups must not duplicate")
    assert(canon(incremental) == canon(full))
  }

  test("randomized splits: any partition of the stream merges to the recompute") {
    val ev = Tables.events(spark, sf)
    val full = canon(IncrementalRollup.publish(IncrementalRollup.state(ev)))
    // deterministic pseudo-random 3-way splits from different moduli —
    // arbitrary arrival orders and batch shapes must all converge
    Seq((3, 17L), (5, 101L), (7, 997L)).foreach { case (parts, m) =>
      val slices = (0 until parts).map(i =>
        ev.filter(pmod(col("event_id") * m, lit(parts)) === i))
      val merged = slices.tail.foldLeft(IncrementalRollup.state(slices.head)) {
        (st, batch) => IncrementalRollup.merge(st, batch)
      }
      assert(canon(IncrementalRollup.publish(merged)) == full,
        s"$parts-way split with multiplier $m diverged from recompute")
    }
  }

  test("empty delta is an identity; merge is associative over batches") {
    val ev = Tables.events(spark, sf)
    val st = IncrementalRollup.state(ev)
    val merged = IncrementalRollup.merge(st, ev.filter(lit(false)))
    assert(canon(merged) == canon(st))
    // three-way split folded in two different orders agrees
    val a = ev.filter(col("event_id") % 3 === 0)
    val b = ev.filter(col("event_id") % 3 === 1)
    val c = ev.filter(col("event_id") % 3 === 2)
    val ab_c = IncrementalRollup.merge(
      IncrementalRollup.merge(IncrementalRollup.state(a), b), c)
    val ac_b = IncrementalRollup.merge(
      IncrementalRollup.merge(IncrementalRollup.state(a), c), b)
    assert(canon(ab_c) == canon(ac_b))
  }
}
