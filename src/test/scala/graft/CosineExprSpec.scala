package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.vector

class CosineExprSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("native cosine expression is bit-identical to the builtin fold") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(5000)
    val diff = pairs
      .withColumn("native", vector.cosine(col("a"), col("b")))
      .withColumn("fold", vector.cosineFold(col("a"), col("b")))
      .filter(col("native") =!= col("fold"))
      .count()
    assert(diff == 0)
  }

  test("cosine_sim is registered for SQL via GraftExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_tmp")
    val r = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_tmp a JOIN emb_tmp b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .first.getDouble(0)
    assert(r >= -1.0 && r <= 1.0)
  }

  test("native cosine participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
    val plan = e.select(vector.cosine(col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    // codegen'd stages print with the "*(n)" marker
    assert(plan.contains("*(") && plan.contains("cosine_sim"), plan)
  }
}
