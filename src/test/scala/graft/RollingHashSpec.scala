package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.text

class RollingHashSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("native rolling_hash equals the builtin fold on the whole corpus") {
    val diff = Tables.documents(spark, sf)
      .select(text.rollingHash(col("text")).as("a"),
        text.rollingHashBuiltin(col("text")).as("b"))
      .filter(col("a") =!= col("b") ||
        col("a").isNull =!= col("b").isNull)
      .count()
    assert(diff == 0L)
  }

  test("native rolling_hash equals the builtin fold per token") {
    val diff = Tables.documents(spark, sf)
      .select(explode(text.tokens(col("text"))).as("tok"))
      .select(text.rollingHash(col("tok")).as("a"),
        text.rollingHashBuiltin(col("tok")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("edge cases: empty string hashes to 0, null stays null, SQL registration") {
    import spark.implicits._
    val df = Seq(Some(""), None, Some("a"), Some("abc")).toDF("s")
      .select(col("s"), text.rollingHash(col("s")).as("h"))
    val rows = df.collect().map(r => (r.getAs[String]("s"), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(rows.contains(("", 0L)))
    assert(rows.contains((null, null)))
    assert(rows.contains(("a", 97L)))
    // h("abc") = ((97*31 + 98)*31 + 99) mod 1e9+7
    assert(rows.contains(("abc", ((97L * 31 + 98) * 31 + 99) % 1000000007L)))
    // SQL-registered form agrees
    assert(spark.sql("SELECT rolling_hash('abc') h").first().getLong(0) ==
      ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("multibyte codepoints decode like DuckDB's ascii (unicode parity)") {
    import spark.implicits._
    // é = U+00E9 (2-byte), € = U+20AC (3-byte), 𝄞 = U+1D11E (4-byte)
    val h = Seq("é€𝄞").toDF("s")
      .select(text.rollingHash(col("s")).as("h")).first().getLong(0)
    val expect = Seq(0xE9L, 0x20ACL, 0x1D11EL)
      .foldLeft(0L)((acc, cp) => (acc * 31 + cp) % 1000000007L)
    assert(h == expect)
  }
}
