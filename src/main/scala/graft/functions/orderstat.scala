package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact order statistics over an integer column by adaptive
  * histogram refinement — the distributed selection algorithm behind
  * q_exact_median (RelationalOps.exactMedian) and any other operator
  * needing EXACT quantiles without a global sort.
  *
  * Every refinement round issues ONE scan whose histogram covers all
  * still-open target ranks (each bucketing within its own window via
  * a CASE router), so the number of full-table passes is the
  * convergence depth (log₁₀ₖ of the value range), not its multiple
  * per rank — at 100 TB each round IS a full-table scan, and asking
  * for the median's two ranks (p, p+1), deciles, or percentile grids
  * costs the same scans as asking for one.
  *
  * Driver state is bounded: ≤10k histogram buckets per distinct
  * window per round, never a value collect. All arithmetic is
  * integer — no IEEE interpolation anywhere, so the result is exact
  * under any partitioning and any engine.
  */
object orderstat {

  /** Value of column `c` of `rel` at each 0-indexed ascending order
    * statistic in `ps`, over the NON-NULL values (ranks index the
    * null-free sorted sequence; a rank must be < the non-null
    * count). `rel` needs an integral column named `c` — any width
    * (cast to bigint internally). */
  def valuesAt(rel: DataFrame, ps: Seq[Long]): Map[Long, Long] = {
    val rl = rel.filter(col("c").isNotNull)
      .select(col("c").cast("long").as("c"))
    val b0 = rl.agg(min("c"), max("c"), count(lit(1))).head()
    val n = b0.getLong(2)
    require(n > 0, "valuesAt on an empty (or all-NULL) relation")
    require(ps.forall(p => p >= 0 && p < n),
      s"ranks ${ps.filterNot(p => p >= 0 && p < n)} outside [0, $n)")
    valuesAtBounded(rl, ps, b0.getLong(0), b0.getLong(1))
  }

  /** As [[valuesAt]] with the (min, max) pre-computed — callers that
    * already ran the bounds aggregate skip the extra scan. `rel`
    * must be null-free with a BIGINT `c` here (valuesAt normalizes
    * both); the value span must also fit signed 64-bit arithmetic —
    * guarded below, because `maxC + 1` or `hiEx − lo` overflowing
    * would silently end refinement at the first window and return
    * minC for every rank. */
  def valuesAtBounded(rel: DataFrame, ps: Seq[Long],
                      minC: Long, maxC: Long): Map[Long, Long] = {
    // headroom analysis for every intermediate: w ≤ ceil(span/10⁴),
    // the ceil-divide computes hiEx−lo+9999 ≤ span+10⁴, and a
    // window's refined end lo+(bucket+1)·w ≤ maxC+1+10⁴ — so keeping
    // maxC AND the span 10⁴+2 away from Long.MaxValue makes all of
    // them wrap-free. (The BigInt span avoids the guard itself
    // overflowing for minC ≪ 0 < maxC.)
    val Headroom = 10002L
    require(maxC <= Long.MaxValue - Headroom,
      s"value domain reaches $maxC — window arithmetic needs " +
        s"$Headroom below Long.MaxValue")
    require((BigInt(maxC) - BigInt(minC)) < BigInt(Long.MaxValue - Headroom),
      s"value span [$minC, $maxC] exceeds signed-64 window arithmetic")
    // per-target state: (window lo, exclusive hi, rows below lo)
    val st = scala.collection.mutable.Map(
      ps.distinct.map(p => p -> (minC, maxC + 1, 0L)): _*)
    while (st.exists { case (_, (lo, hiEx, _)) => hiEx - lo > 1 }) {
      val open = st.toSeq.collect {
        case (p, (lo, hiEx, before)) if hiEx - lo > 1 => (p, lo, hiEx, before)
      }
      // two open windows are either IDENTICAL (targets still in the
      // same bucket) or DISJOINT (buckets split them apart) — never
      // partially overlapping: all targets start on the same window,
      // co-windowed targets refine on the same bucket grid, and
      // disjoint windows only shrink. Routing by DISTINCT window
      // therefore makes the CASE exact and shares one histogram
      // between co-located targets. ceil-divide each window into
      // ≤10k buckets: driver state stays bounded whatever the value
      // range is
      val windows = open.map { case (_, lo, hiEx, _) => (lo, hiEx) }.distinct
        .map { case (lo, hiEx) =>
          (lo, hiEx, math.max(1L, (hiEx - lo + 9999L) / 10000L)) }
      val router = windows.zipWithIndex.map { case ((lo, hiEx, w), i) =>
        s"WHEN c >= $lo AND c < $hiEx THEN named_struct('t', $i, 'b', (c - $lo) div $w)"
      }.mkString("CASE ", " ", " ELSE null END")
      val cover = windows.map { case (lo, hiEx, _) =>
        col("c") >= lo && col("c") < hiEx }.reduce(_ || _)
      val hist = rel.filter(cover)
        .select(expr(router).as("tb"))
        .groupBy(col("tb.t").as("t"), col("tb.b").as("b")).count()
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      open.foreach { case (p, lo, hiEx, before) =>
        val i = windows.indexWhere(win => win._1 == lo && win._2 == hiEx)
        val w = windows(i)._3
        val rows = hist.collect { case (t, b, c) if t == i => b -> c }
          .sortBy(_._1)
        var cum = before
        var bucket = -1L
        val it = rows.iterator
        while (bucket < 0 && it.hasNext) {
          val (b, c) = it.next()
          if (p < cum + c) bucket = b else cum += c
        }
        if (bucket < 0) throw new IllegalStateException(
          s"order statistic $p not found in [$lo,$hiEx)")
        st(p) = (lo + bucket * w,
          math.min(hiEx, lo + (bucket + 1) * w), cum)
      }
    }
    st.map { case (p, (lo, _, _)) => p -> lo }.toMap
  }
}
