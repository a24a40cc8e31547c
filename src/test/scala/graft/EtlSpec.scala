package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EtlOps

class EtlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("validate marks every event row with consistent flags") {
    val v = EtlOps.validate(spark, sf)
    val n = Tables.events(spark, sf).count()
    assert(v.count() == n)
    // is_valid must equal the conjunction of the individual flags
    val bad = v.filter(col("is_valid") =!= (col("value_present") &&
      col("value_in_range") && col("type_known") && col("ts_present"))).count()
    assert(bad == 0)
  }

  test("dedup_hour keeps exactly one earliest row per hour") {
    val d = EtlOps.dedupHour(spark, sf)
    assert(d.groupBy("hour_ts").count().filter(col("count") > 1).count() == 0)
    // kept row's ts is the minimum of its hour
    val ev = Tables.events(spark, sf)
      .withColumn("hour_ts", date_trunc("hour", col("ts")).cast("timestamp_ntz"))
      .groupBy("hour_ts").agg(min("ts").as("min_ts"))
    val mismatch = d.join(ev, "hour_ts").filter(col("ts") =!= col("min_ts")).count()
    assert(mismatch == 0)
  }

  test("recent_runs returns 10 rows in strictly descending order") {
    val rows = EtlOps.recentRuns(spark, sf).collect()
    assert(rows.length == 10)
    val ts = rows.map(_.getAs[java.time.LocalDateTime]("ts"))
    assert(ts.sliding(2).forall { case Array(a, b) => !a.isBefore(b) })
  }

  test("freshness: exactly the rows older than max-2h are stale") {
    val f = EtlOps.freshness(spark, sf)
    val total = f.count()
    val stale = f.filter(col("is_stale")).count()
    assert(total > 0 && stale > 0 && stale < total)
  }

  test("gap_fill produces a dense hour grid and forward-fills gaps") {
    val gf = EtlOps.gapFill(spark, sf).cache()
    val types = gf.select("event_type").distinct().count()
    val hours = gf.select("hour_ts").distinct().count()
    assert(gf.count() == types * hours, "grid must be dense (hour x type)")
    // real gaps exist at type granularity and every gap after the
    // first observation carries a filled value
    assert(gf.filter(col("was_gap")).count() > 0)
    assert(gf.filter(col("was_gap") && col("filled_value").isNotNull).count() > 0)
    // observed rows: filled == observed
    assert(gf.filter(!col("was_gap") &&
      col("filled_value") =!= col("avg_value")).count() == 0)
    gf.unpersist()
  }

  test("zscore outliers: all |z| > 3 and match a driver-side recompute") {
    val out = EtlOps.zscoreOutliers(spark, TestSession.sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getDouble(3)) > 3.0))
    // recompute one event type's stats exactly as the operator defines them
    val et = out.head.getString(1)
    val vals = Tables.events(spark, TestSession.sf)
      .filter(col("event_type") === et).select("value").collect()
      .map(r => math.round(r.getDouble(0) * 100).toDouble)
    val s1 = vals.sum; val s2 = vals.map(v => v * v).sum; val n = vals.length
    val mean = s1 / n
    val std = math.sqrt((s2 - s1 * s1 / n) / n)
    val flagged = vals.count(v => math.abs((v - mean) / std) > 3.0)
    assert(out.count(_.getString(1) == et) == flagged)
  }

  test("interpolate: observed hours unchanged, gap fills lie between brackets") {
    val rows = EtlOps.interpolate(spark, TestSession.sf)
      .orderBy("event_type", "hour_ts").collect()
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(3)),
      "every grid hour must be filled")
    rows.filter(!_.getBoolean(4)).foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3), "observed hour must pass through")
    }
    // each gap's fill is within [min, max] of its bracketing values:
    // walk per type, tracking the previous/next observed values
    rows.groupBy(_.getString(0)).values.foreach { tr =>
      val obs = tr.zipWithIndex.filter(!_._1.getBoolean(4)).map(_._2)
      tr.zipWithIndex.filter(_._1.getBoolean(4)).foreach { case (r, i) =>
        val before = obs.filter(_ < i).lastOption.map(j => tr(j).getDouble(3))
        val after = obs.find(_ > i).map(j => tr(j).getDouble(3))
        val lo = Seq(before, after).flatten.min
        val hi = Seq(before, after).flatten.max
        val v = r.getDouble(3)
        assert(v >= lo - 1e-9 && v <= hi + 1e-9,
          s"fill $v outside bracket [$lo,$hi] at ${r.get(1)}")
      }
    }
  }

  test("etl_ewma: convex smoothing of the trailing hourly averages") {
    val rows = EtlOps.ewmaSmooth(spark, sf)
      .orderBy(col("event_type"), col("hour_ts")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).values.foreach { tr =>
      // first observed point: ewma == its own average
      assert(math.abs(tr.head.getDouble(3) -
        BigDecimal(tr.head.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      // every point: ewma within [min, max] of the trailing 8 averages
      tr.zipWithIndex.foreach { case (r, i) =>
        val windowVals = tr.slice(math.max(0, i - 7), i + 1).map(_.getDouble(2))
        assert(r.getDouble(3) >= windowVals.min - 1e-6 &&
          r.getDouble(3) <= windowVals.max + 1e-6,
          s"ewma ${r.getDouble(3)} outside window bounds at ${r.get(0)}")
      }
    }
  }

  test("mad outliers: median/MAD/outlier counts match an exact driver recompute") {
    val out = EtlOps.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    val byType = Tables.events(spark, sf).collect()
      .filter(!_.isNullAt(4))
      .map(r => r.getString(3) -> math.round(r.getDouble(4) * 100))
      .groupBy(_._1).map { case (t, a) => t -> a.map(_._2).sorted }
    def med2(xs: Array[Long]): Long =
      if (xs.length % 2 == 1) 2 * xs(xs.length / 2)
      else xs(xs.length / 2 - 1) + xs(xs.length / 2)
    byType.foreach { case (t, cents) =>
      val (n, medV, madV, nOut) = out(t)
      assert(n == cents.length)
      val m2 = med2(cents)
      assert(medV == m2, s"$t median (2x cents)")
      val dev2 = cents.map(c => math.abs(2 * c - m2)).sorted
      val m4 = med2(dev2)
      assert(madV == m4, s"$t mad (4x cents)")
      assert(nOut == dev2.count(d => 2 * d > 3 * m4).toLong, s"$t outliers")
      assert(nOut > 0 && nOut < n, s"$t rule should be non-vacuous on this corpus")
    }
  }

  test("islands partition the observed hours into maximal separated runs") {
    val out = EtlOps.islands(spark, sf).collect()
    val nHours = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts"))).distinct().count()
    assert(out.map(_.getLong(3)).sum == nHours)
    def epochH(v: Any): Long = v match {
      case t: java.time.LocalDateTime => t.toEpochSecond(java.time.ZoneOffset.UTC) / 3600
    }
    out.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val spans = rows.map(r => (epochH(r.get(1)), epochH(r.get(2)), r.getLong(3)))
        .sortBy(_._1)
      spans.foreach { case (h0, h1, n) =>
        assert(h1 - h0 + 1 == n, s"$t: island extent must equal its hour count") }
      spans.sliding(2).foreach {
        case Array((_, e0, _), (s1, _, _)) =>
          assert(s1 > e0 + 1, s"$t: adjacent islands separated by >=1 missing hour")
        case _ =>
      }
    }
  }

  test("green windows are maximal runs of green hours and nothing else") {
    val tau = 500000L
    // naive recompute: hourly clean share over the whole series
    val hourly = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .groupBy(expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type").isin("view", "click"), 1L).otherwise(0L)).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val green = hourly.filter { case (_, (n, c)) => c * 1000000L / n >= tau }.keySet
    def epochH(v: Any): Long = v match {
      case t: java.time.LocalDateTime => t.toEpochSecond(java.time.ZoneOffset.UTC) / 3600
    }
    val out = EtlOps.greenWindows(spark, sf).collect()
    // every window hour is green, extents are exact, windows are maximal
    assert(out.map(_.getLong(2)).sum == green.size,
      "windows must cover exactly the green hours")
    val spans = out.map(r => (epochH(r.get(0)), epochH(r.get(1)), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1)
    spans.foreach { case (h0, h1, n, avg, peak) =>
      assert(h1 - h0 + 1 == n, "window extent equals its hour count")
      assert((h0 to h1).forall(green.contains), "all hours in a window are green")
      assert(!green.contains(h0 - 1) && !green.contains(h1 + 1),
        "window is maximal (bordered by non-green/missing hours)")
      val (tn, tc) = (h0 to h1).map(hourly).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      assert(avg == tc * 1000000L / tn, "pooled window share is exact")
      assert(peak == (h0 to h1).map { h =>
        val (n2, c2) = hourly(h); c2 * 1000000L / n2 }.max, "peak share is exact")
      assert(peak >= avg && avg >= tau)
    }
  }

  test("weekly trend rolls the daily series up exactly with correct deltas") {
    val rows = EtlOps.weeklyTrend(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("week").toLocalDate.toEpochDay)
    assert(rows.nonEmpty)
    // samples sum to the event count; first delta is null; deltas are
    // consistent with consecutive shares
    assert(rows.map(_.getAs[Long]("samples")).sum ==
      Tables.events(spark, sf).filter(col("ts").isNotNull).count())
    assert(rows.head.isNullAt(rows.head.fieldIndex("delta_clean_ppm")))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("delta_clean_ppm") ==
          b.getAs[Long]("clean_ppm") - a.getAs[Long]("clean_ppm"))
      case _ =>
    }
    // weeks start on Monday (ISO truncation, same convention as the oracle)
    rows.foreach(r => assert(
      r.getAs[java.sql.Date]("week").toLocalDate.getDayOfWeek ==
        java.time.DayOfWeek.MONDAY))
  }

  test("late arrivals match a naive global running-max recompute") {
    val out = EtlOps.lateArrivals(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        expr("unix_timestamp(ts)").as("tse"))
      .orderBy("event_id").collect()
    var hwm = Long.MinValue
    val agg = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    ev.foreach { r =>
      val t = r.getString(0); val tse = r.getLong(2)
      val late = hwm != Long.MinValue && tse < hwm - 900
      val (n, nl, mb) = agg.getOrElse(t, (0L, 0L, -1L))
      agg(t) = (n + 1, nl + (if (late) 1L else 0L),
        if (late) math.max(mb, hwm - tse) else mb)
      hwm = math.max(hwm, tse)
    }
    assert(out == agg.toMap)
  }

  test("seasonal: cells cover every event; index recovers the hour/type ratio") {
    val out = EtlOps.seasonal(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == nEvents,
      "hour-of-day cells must partition the event stream")
    assert(out.map(_.getInt(1)).forall(h => h >= 0 && h <= 23))
    // independent recomputation of one cell's index
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).as("hod"), col("value"))
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.get(2)).map(_ => r.getDouble(2))))
    val sample = out.head
    val (st, sh) = (sample.getString(0), sample.getInt(1))
    def xmean(vs: Seq[Double]): Double =
      vs.map(v => math.round(v * 100)).sum.toDouble / 100 / vs.length
    val cellVals = ev.collect { case (t, h, Some(v)) if t == st && h == sh => v }
    val typeVals = ev.collect { case (t, _, Some(v)) if t == st => v }
    val want = BigDecimal(xmean(cellVals.toSeq) / xmean(typeVals.toSeq))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(sample.getDouble(4) - want) < 1e-9,
      s"seasonal_idx ${sample.getDouble(4)} vs recomputed $want")
  }

  test("dq rules: each violation count matches a direct filter") {
    val out = EtlOps.dqRules(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val expect = Map(
      "null_value" -> ev.filter(col("value").isNull).count(),
      "value_out_of_range" -> ev.filter(col("value").isNotNull &&
        (col("value") < 0.0 || col("value") > 1000.0)).count(),
      "unknown_type" -> ev.filter(col("event_type").isNull ||
        !col("event_type").isin("view", "click", "purchase", "signup", "error"))
        .count(),
      "null_ts" -> ev.filter(col("ts").isNull).count(),
      "null_user" -> ev.filter(col("user_id").isNull).count(),
      "malformed_props" -> ev.filter(col("props").isNotNull &&
        expr("try_parse_json(props)").isNull).count())
    assert(out.keySet == expect.keySet)
    expect.foreach { case (rule, n) =>
      assert(out(rule)._1 == n, s"$rule count")
      val want = BigDecimal(n * 100.0 / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(rule)._2 - want) < 1e-9, s"$rule pct")
    }
    // (the synthetic corpora are clean — every count may be 0; the
    // per-rule arithmetic and the melt shape are what's under test)
  }

  test("decay agg agrees with a driver-side exact recount") {
    val rows = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val mx = rows.map(_._2).max
    val byType = rows.groupBy(_._1)
    val got = EtlOps.decayAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, g) =>
      var sw = 0L
      var swv = 0L
      g.foreach { case (_, day, v) =>
        val age = math.min(
          java.time.temporal.ChronoUnit.DAYS.between(day, mx), 20L)
        val w = 1L << (20 - age)
        sw += w
        swv += w * math.round(v * 100)
      }
      val (n, dc, dv) = got(t)
      assert(n == g.size)
      assert(math.abs(dc - sw.toDouble / (1L << 20)) < 1e-6, s"$t count")
      assert(math.abs(dv - swv.toDouble / (1L << 20) / 100.0) < 1e-6, s"$t value")
      // decayed count is bounded by the raw count and must be positive
      assert(dc > 0 && dc <= n.toDouble)
    }
  }

  test("stickiness ratio agrees with a driver-side recount") {
    val rows = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).distinct
    val got = operators.RelationalOps.stickiness(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byMonth = rows.groupBy(p => p._1.withDayOfMonth(1))
    assert(got.keySet == byMonth.keySet)
    byMonth.foreach { case (m, g) =>
      val days = g.map(_._1).distinct.size
      val mau = g.map(_._2).distinct.size.toLong
      val sdau = g.groupBy(_._1).values.map(_.map(_._2).distinct.size.toLong).sum
      val (gd, gm, gs, ppm) = got(m)
      assert(gd == days && gm == mau && gs == sdau, s"month $m")
      assert(ppm == sdau * 1000000L / (days * mau), s"month $m ppm")
      // dau <= mau per day implies the ratio is within (0, 1]
      assert(ppm > 0 && ppm <= 1000000L)
    }
  }

  test("incident windows are maximal elevated-error runs") {
    val flagged = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      .filter(expr("err * 1000000 div total > 300000"))
      .select(expr("unix_timestamp(h) div 3600")).collect()
      .map(_.getLong(0)).sorted
    val got = EtlOps.incidents(spark, sf).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // every flagged hour is covered exactly once, runs are maximal
    val covered = got.flatMap { case (s0, e0, n, _, _) =>
      val h0 = s0.toEpochSecond(java.time.ZoneOffset.UTC) / 3600
      val h1 = e0.toEpochSecond(java.time.ZoneOffset.UTC) / 3600
      assert(h1 - h0 + 1 == n, "window span equals its hour count")
      (h0 to h1)
    }.sorted
    assert(covered.toSeq == flagged.toSeq, "windows tile the flagged hours")
    // maximality: no two windows are adjacent
    val spans = got.map { case (s0, e0, _, _, _) =>
      (s0.toEpochSecond(java.time.ZoneOffset.UTC) / 3600,
        e0.toEpochSecond(java.time.ZoneOffset.UTC) / 3600)
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array(a, b) => assert(b._1 > a._2 + 1, "adjacent runs must merge")
      case _ =>
    }
    assert(got.nonEmpty, "threshold must bite on this corpus")
  }

  test("rolling correlation agrees with a driver-side recount") {
    val hourly = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("x"),
        sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .orderBy("h").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val got = EtlOps.rollingCorr(spark, sf)
      .orderBy("hour_ts").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.length == hourly.length)
    hourly.indices.foreach { i =>
      val win = hourly.slice(math.max(0, i - 23), i + 1)
      val n = win.length.toLong
      assert(got(i)._1 == n, s"row $i window size")
      val (sx, sy) = (win.map(_._1).sum, win.map(_._2).sum)
      val sxy = win.map(t => t._1 * t._2).sum
      val sx2 = win.map(t => t._1 * t._1).sum
      val sy2 = win.map(t => t._2 * t._2).sum
      val (dxx, dyy, dxy) = (n * sx2 - sx * sx, n * sy2 - sy * sy,
        n * sxy - sx * sy)
      if (dxx > 0 && dyy > 0) {
        val want = dxy.toDouble / (math.sqrt(dxx.toDouble) * math.sqrt(dyy.toDouble))
        assert(math.abs(got(i)._2.get - want) < 1e-6, s"row $i corr")
        assert(got(i)._2.get >= -1.0 - 1e-9 && got(i)._2.get <= 1.0 + 1e-9)
      } else assert(got(i)._2.isEmpty, s"row $i degenerate window")
    }
  }

  test("benford chi2 agrees with a driver-side recount and flags uniform values") {
    val p = Seq(0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    val rows = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("value") >= 0.01)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = EtlOps.benford(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    val byType = rows.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, g) =>
      val digits = g.map { case (_, v) =>
        math.round(v * 100).toString.head.asDigit }
      val n = g.size.toDouble
      val chi2 = (1 to 9).map { d =>
        val e = n * p(d - 1)
        val o = digits.count(_ == d).toDouble
        (o - e) * (o - e) / e
      }.sum
      val (gn, gchi2, flag) = got(t)
      assert(gn == g.size)
      assert(math.abs(gchi2 - chi2) < 1e-6, s"$t chi2")
      assert(flag == (chi2 > 26.124), s"$t flag")
    }
    // uniform synthetic magnitudes are decidedly NOT Benford, but the
    // chi2 needs enough sample to clear the 0.001 critical value —
    // only assert the flag where the test has power (n >= 500)
    got.values.filter(_._1 >= 500).foreach { case (_, _, flag) =>
      assert(flag, "uniform values must be flagged at adequate n")
    }
    assert(got.values.forall(_._2 > 0), "chi2 is positive")
  }

  test("schema drift statuses agree with a driver-side key-set diff") {
    val keysByDay = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("props").isNotNull &&
        expr("try_parse_json(props)").isNotNull)
      .select(to_date(col("ts")).as("day"),
        explode(expr("json_object_keys(props)")).as("key"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = EtlOps.schemaDrift(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    val days = keysByDay.keySet
    days.foreach { day =>
      val cur = keysByDay(day).groupBy(identity).view.mapValues(_.size.toLong)
      val prev = keysByDay.get(day.minusDays(1)).map(_.toSet).getOrElse(Set.empty)
      cur.foreach { case (k, n) =>
        val want = if (prev(k)) "stable" else "new"
        assert(got((day, k)) == ((n, want)), s"$day $k")
      }
      prev.diff(cur.keySet).foreach { k =>
        assert(got((day, k)) == ((0L, "dropped")), s"$day $k dropped")
      }
    }
    assert(got.nonEmpty && got.values.exists(_._2 == "stable"))
    // the first observed day's keys are all 'new'
    val d0 = days.min
    assert(keysByDay(d0).toSet.forall(k => got((d0, k))._2 == "new"))
  }

  test("coverage grid agrees with a driver-side distinct-hour recount") {
    val cells = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .selectExpr("cast(ts as date) as day", "event_type", "hour(ts) as hod")
      .distinct().collect()
      .map(r => ((r.getDate(0).toLocalDate, r.getString(1)), r.getInt(2)))
    val want = cells.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val got = EtlOps.coverage(spark, sf).collect()
      .map(r => ((r.getDate(0).toLocalDate, r.getString(1)),
        (r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, ppm, full)) =>
      assert(n == want(k), s"$k hours")
      assert(ppm == n.toLong * 1000000L / 24, s"$k ppm")
      assert(full == (n == 24) && n >= 1 && n <= 24, s"$k flag")
    }
    // (completeness itself is data-dependent — sf0.001 is sparse —
    // so only the exact reconciliation above is asserted)
    assert(got.nonEmpty)
  }
}
