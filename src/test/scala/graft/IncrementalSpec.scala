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

  test("foreachBatch streaming maintenance converges to the batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Tables.events(spark, sf)
      .select(col("ts").cast("timestamp"), col("event_type"), col("value"))
    val rows = ev.as[(java.sql.Timestamp, String, Option[Double])].collect()
    val mem = MemoryStream[(java.sql.Timestamp, String, Option[Double])]
    // state starts empty (same schema via an all-false filter) and each
    // micro-batch folds in through merge — the streaming maintenance
    // loop a 100 TB rollup runs via foreachBatch
    var state = IncrementalRollup.state(ev.filter(lit(false)))
    val q = mem.toDF().toDF("ts", "event_type", "value")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = IncrementalRollup.merge(state, batch).localCheckpoint()
      }.start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = canon(IncrementalRollup.publish(state))
    val full = canon(IncrementalRollup.publish(IncrementalRollup.state(ev)))
    assert(streamed == full,
      "streamed incremental maintenance must equal the batch recompute")
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
