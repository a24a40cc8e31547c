package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference pipeline's data-quality rules as Column predicates
  * (etl_job.py:51-94), usable in any plan — filter, flag column, or
  * constraint check — and fully codegen'd.
  *
  * Where the Python reference checks one scalar at a time, these run
  * vectorized over whole columns; semantics are mirrored exactly and
  * pinned test-for-test against the reference's own unit tests in
  * ReferenceParitySpec (tests/test_etl.py).
  */
object validation {

  /** validate_intensity (etl_job.py:51-62): non-null numeric in
    * [0, 1000]. The reference's type check (rejecting the string
    * "150") is the schema's job here — a double column can't hold a
    * string; a string column is validated via tryCastDouble. */
  def validIntensity(c: Column): Column =
    c.isNotNull && c >= 0.0 && c <= 1000.0

  /** validate_fuel_percentage (etl_job.py:64-72): non-null numeric in
    * [0, 100]. */
  def validFuelPercentage(c: Column): Column =
    c.isNotNull && c >= 0.0 && c <= 100.0

  /** String-typed measurements: the reference rejects str inputs
    * (isinstance check) — for string columns we surface the same
    * "wrong type" signal as a failed numeric cast. */
  def tryCastDouble(c: Column): Column = c.try_cast("double")

  /** validate_timestamp (etl_job.py:74-83): non-null; staleness
    * relative to a reference instant (the reference uses now(), we
    * take it as a column for determinism). */
  def validTimestamp(ts: Column): Column = ts.isNotNull

  def isStale(ts: Column, asOf: Column, maxAgeHours: Int = 2): Column =
    ts < asOf - expr(s"INTERVAL $maxAgeHours HOURS")

  /** _parse_iso8601 (etl_job.py:85-94): ISO-8601 with bare offsets or
    * the `Z` suffix ("2024-05-21T19:00Z"); malformed input → null
    * (the reference returns None). try_to_timestamp + a Z→+00:00
    * rewrite mirrors `fromisoformat(ts.replace("Z", "+00:00"))`. */
  def parseIso8601(c: Column): Column = {
    val normalized = regexp_replace(c, "Z$", "+00:00")
    // accept both "2025-12-09T14:00+00:00" and second/fraction forms;
    // try_to_timestamp returns null instead of raising on junk
    coalesce(
      try_to_timestamp(normalized, lit("yyyy-MM-dd'T'HH:mmXXX")),
      try_to_timestamp(normalized, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(normalized, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
      try_to_timestamp(normalized))
  }
}
