package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.text

/** Scratch profiler (dev tool, not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def shBuild(maxDf: Int) = {
      val sh0 = Tables.documents(spark, d)
        .select(col("doc_id"), explode(text.shingles(text.tokens(col("text")), 2)).as("sh"))
      val rare = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("sh")
      sh0.join(rare, "sh")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", false)
    time("interpreted maxDf=100")(shBuild(100).count())
    spark.conf.set("spark.sql.codegen.wholeStage", true)
    time("codegen maxDf=101")(shBuild(101).count())
    time("codegen maxDf=102")(shBuild(102).count())
    // isolate pieces
    val docs = Tables.documents(spark, d)
    time("tokens only")(docs.select(explode(text.tokens(col("text")))).count())
    time("shingle arrays only")(docs.select(text.shingles(text.tokens(col("text")), 2)).count())
    time("explode shingles only")(docs.select(explode(text.shingles(text.tokens(col("text")), 2))).count())
    spark.stop()
  }
}
