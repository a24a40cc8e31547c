package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{sketch, text}

/** The custom bottom-k sketch aggregate (TypedImperativeAggregate):
  * must equal the window-function ground truth and be invariant to
  * partitioning (the merge path does real work). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def viaSketch(parts: Int) =
    Tables.events(spark, sf)
      .repartition(parts)
      .withColumn("h", text.rollingHash(col("event_id").cast("string")))
      .groupBy(col("event_type"))
      .agg(sketch.bottomK(col("h"), col("event_id"), 10).as("ids"))
      .select(col("event_type"), posexplode(col("ids")).as(Seq("pos", "event_id")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("bottom-k sketch equals the window-function ground truth") {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    val expected = Tables.events(spark, sf)
      .withColumn("h", text.rollingHash(col("event_id").cast("string")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("event_type"), (col("rn") - 1).as("pos"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaSketch(8) == expected && expected.nonEmpty)
  }

  test("sketch result is invariant to input partitioning (merge correctness)") {
    assert(viaSketch(1) == viaSketch(64))
  }

  test("sketch keeps at most k with fewer rows than k") {
    import spark.implicits._
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val out = tiny.groupBy("g")
      .agg(sketch.bottomK(col("id"), col("id"), 10).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(1L, 2L) && out("b") == Seq(3L))
  }

  private def mgMap(df: org.apache.spark.sql.DataFrame, item: org.apache.spark.sql.Column,
                    cap: Int): Map[Long, Long] =
    df.agg(sketch.heavyHitters(item, cap).as("hh"))
      .selectExpr("explode(hh) as e").select("e.item", "e.cnt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("misra-gries exact regime: plain counts under any partitioning") {
    val ev = Tables.events(spark, TestSession.sf)
    val item = (col("user_id") % 50).cast("long")
    val truth = ev.groupBy(item.as("i")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mgMap(ev, item, 64) == truth)
    assert(mgMap(ev.repartition(7), item, 64) == truth,
      "exact regime must not depend on partitioning")
  }

  test("misra-gries approx regime: presence guarantee and error bound hold") {
    val ev = Tables.events(spark, TestSession.sf)
    val cap = 64
    val est = mgMap(ev, col("user_id"), cap)
    assert(est.size <= cap)
    val truth = ev.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val bound = n / (cap + 1)
    // every item above the threshold must be present
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(est.contains(k), s"heavy item $k (cnt=${truth(k)}) missing")
    }
    // every estimate is an undercount by at most the bound
    est.foreach { case (k, c) =>
      val t = truth.getOrElse(k, 0L)
      assert(c <= t && c >= t - bound, s"item $k est $c outside [$t-$bound, $t]")
    }
  }
}
