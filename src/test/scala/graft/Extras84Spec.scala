package graft

import org.apache.spark.sql.functions._

class Extras84Spec extends QuerySuiteBase {
  Seq("q_ts_best_run", "q_evt_diff_in_diff", "q_agg_ratio_est",
    "q_agg_chisq_gof").foreach(checkDeclared(_))

  test("best run: segment sum recomputed by hand equals best_cents; " +
      "bounds inside the calendar") {
    val r = q("q_ts_best_run").head()
    val (startDt, endDt) = (r.getDate(0), r.getDate(1))
    assert(!startDt.after(endDt))
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .orderBy("dt").collect()
    val ys = daily.map(_.getLong(1)).sorted
    val med = ys((ys.length + 1) / 2 - 1)
    val seg = daily.filter(row => !row.getDate(0).before(startDt)
      && !row.getDate(0).after(endDt))
    assert(seg.map(_.getLong(1) - med).sum == r.getLong(3))
    assert(seg.length == r.getLong(2))
    // Kadane reference: best over all segments
    val xs = daily.map(_.getLong(1) - med)
    var best = Long.MinValue; var cur = 0L
    for (x <- xs) { cur = math.max(x, cur + x); best = math.max(best, cur) }
    assert(best == r.getLong(3))
  }

  test("diff in diff: four cells populated; DiD finite") {
    val r = q("q_evt_diff_in_diff").head()
    (0 to 3).foreach(i => assert(r.getLong(i) > 0))
    assert(!r.getDouble(4).isNaN)
  }

  test("ratio estimator: ratio equals total purchase cents over total " +
      "events; variance non-negative") {
    val r = q("q_agg_ratio_est").head()
    val ratio = r.getDouble(3)
    assert(math.abs(ratio - r.getLong(2).toDouble / r.getLong(1)) < 1e-5)
    assert(r.getDouble(4) >= 0.0)
  }

  test("chi-square gof: matches the direct computation") {
    val r = q("q_agg_chisq_gof").head()
    val counts = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("o"))
      .collect().map(_.getLong(1))
    val k = counts.length.toLong
    val n = counts.sum
    assert(r.getLong(0) == k && r.getLong(1) == n)
    val qNum = counts.map(o => { val d = o * k - n; BigInt(d) * BigInt(d) })
      .sum
    val chi2 = qNum.toDouble / (BigInt(k) * BigInt(n)).toDouble
    assert(math.abs(r.getDouble(2) - chi2) < 1e-4)
  }
}
