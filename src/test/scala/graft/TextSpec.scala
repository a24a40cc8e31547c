package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.functions.text

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = TestSession.sf

  test("rolling hash matches a hand-computed golden value") {
    val got = Seq("abc").toDF("t").select(text.rollingHash(col("t"))).first.getLong(0)
    // ((0*31+97)*31+98)*31+99 = 96354
    assert(got == 96354L)
  }

  test("token counts agree with a driver-side recount on a sample") {
    val sample = Tables.documents(spark, sf).limit(20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.tokenCount(spark, sf)
      .filter(col("doc_id") < 20).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    sample.foreach { case (id, t) =>
      val ws = t.toLowerCase.split("\\s+").count(_.nonEmpty)
      val bpe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r.findAllIn(t.toLowerCase).size
      assert(got(id) == ((ws, bpe)), s"doc $id")
    }
  }

  test("quality scores are in [0,1] and deterministic") {
    val q = TextOps.quality(spark, sf)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    val a = q.orderBy("doc_id").limit(5).collect().map(_.getDouble(4)).toSeq
    val b = TextOps.quality(spark, sf).orderBy("doc_id").limit(5).collect()
      .map(_.getDouble(4)).toSeq
    assert(a == b)
  }

  test("lang id predicts a profile language for every doc with en dominating") {
    val l = TextOps.langId(spark, sf)
    assert(l.count() == Tables.documents(spark, sf).count())
    val langs = l.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
    // the synthetic corpus is english-ish db jargon: 'the'/'a'... dominate
    val top = l.groupBy("pred_lang").count().orderBy(col("count").desc)
      .first.getString(0)
    assert(top == "en", s"top predicted lang was $top")
  }
}
