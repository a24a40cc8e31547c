package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.operators.{EtlOps, Jdbc}

/** Storage parity with the reference (whose tables live in a JDBC
  * database): write/read round-trip and the check-then-insert upsert,
  * against Derby embedded in-memory — same code path as a Postgres
  * URL. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  // Derby has no TIMESTAMP WITHOUT TIME ZONE distinction; cast NTZ to
  // plain timestamp at the boundary (UTC session makes it identity)
  private def rollup = EtlOps.hourlyRollup(spark, sf)
    .withColumn("hour_ts", col("hour_ts").cast("timestamp"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("hour_ts", "event_type", "n_events", "sum_value")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

  test("JDBC write/read round-trips the hourly rollup") {
    val url = "jdbc:derby:memory:graft_rt;create=true"
    Jdbc.write(rollup, url, "grid_telemetry", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "grid_telemetry")
    assert(asSet(back) == asSet(rollup) && asSet(back).nonEmpty)
  }

  test("JDBC keyed upsert inserts each (hour, type) key exactly once") {
    val url = "jdbc:derby:memory:graft_up;create=true"
    val keys = Seq("hour_ts", "event_type")
    val batch1 = rollup.filter(hour(col("hour_ts")) < 12)
    val n1 = Jdbc.upsertByKey(spark, batch1, url, "telemetry", keys)
    assert(n1 == batch1.count())
    // the reference's skip semantics: identical batch → zero inserts
    assert(Jdbc.upsertByKey(spark, batch1, url, "telemetry", keys) == 0L)
    val n2 = Jdbc.upsertByKey(spark, rollup, url, "telemetry", keys)
    assert(n1 + n2 == rollup.count())
    val landed = Jdbc.read(spark, url, "telemetry")
    assert(landed.count() == rollup.count())
    assert(landed.select("hour_ts", "event_type").distinct().count()
      == rollup.count())
  }
}
