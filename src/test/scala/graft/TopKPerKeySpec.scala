package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.topk

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def custom = topk.perKey(
    Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
    keys = Seq("o_custkey"),
    order = Seq(topk.Order("o_totalprice", ascending = false), topk.Order("o_orderkey")),
    k = 3)

  test("custom operator equals the window-function formulation") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = custom.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("plan uses TopKPerKeyExec with a single key exchange, no sort") {
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("map-side partial heap runs below the exchange and bounds shuffled rows") {
    // partial must sit under the exchange (pruning before the shuffle),
    // final above it — the HashAggregate partial/final split for top-k
    val plan = custom.queryExecution.executedPlan.toString
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    assert(iPartial >= 0, s"no partial pass in plan:\n$plan")
    assert(iExchange >= 0 && iExchange < iPartial,
      s"partial pass must be below (printed after) the exchange:\n$plan")
    // semantic bound: a hot single key over many partitions still
    // returns the exact global top-k
    import spark.implicits._
    val hot = spark.range(100000)
      .select(lit("only_key").as("g"), col("id"))
      .repartition(32)
    val got = topk.perKey(hot, Seq("g"), Seq(topk.Order("id")), 5)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == (0L until 5L).map(i => (i, i.toInt + 1)).toSet)
  }

  test("unknown column errors clearly") {
    val e = intercept[IllegalArgumentException] {
      topk.perKey(Tables.orders(spark, sf), Seq("nope"), Seq(topk.Order("o_orderkey")), 2)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("capPerKey: identity plan when no key exceeds the cap") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("g", "v")
    val got = topk.capPerKey(df, Seq("g"), Seq(topk.Order("v")), 3)
    // the probe found nothing oversized → the INPUT plan comes back
    // untouched (eq, not just row-equal): downstream self-joins keep
    // their shape instead of dragging an anti-join/union through
    assert(got eq df)
  }

  test("capPerKey: keys ≈ rows — planted unique-key relation stays " +
      "out of the heap, oversized keys capped exactly") {
    import spark.implicits._
    // 200k keys, one row each (the LSH-bucket / basket-key shape that
    // OOM'd the blanket heap at sf10) + one hot key with 1000 rows
    val uniq = spark.range(200000).select(col("id").as("g"), col("id").as("v"))
    val hot = spark.range(1000).select(lit(-1L).as("g"), col("id").as("v"))
    val df = uniq.unionByName(hot)
    val got = topk.capPerKey(df, Seq("g"), Seq(topk.Order("v")), 4)
    // only the hot key's rows ever enter a heap: the gated plan's
    // TopKPerKey subtree reads the semi-joined oversized slice
    val counts = got.groupBy("g").count()
    assert(counts.filter(col("count") =!= 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((-1L, 4L)))
    assert(got.count() == 200000L + 4L)
    assert(got.filter(col("g") === -1L).select("v").collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    // schema unchanged (no rank column)
    assert(got.columns.toSeq == df.columns.toSeq)
  }
}
