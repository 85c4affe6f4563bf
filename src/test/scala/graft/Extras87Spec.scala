package graft

import org.apache.spark.sql.functions._

class Extras87Spec extends QuerySuiteBase {
  Seq("q_ts_kpss", "q_ts_snht", "q_ts_buishand_range",
    "q_ts_von_neumann", "q_ts_bartels_rank", "q_ts_turning_points")
    .foreach(checkDeclared(_))

  private def series(): Array[Long] =
    Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .orderBy("dt").collect().map(_.getLong(1))

  test("kpss: statistic recomputed from scratch partial sums") {
    val r = q("q_ts_kpss").head()
    val y = series().map(_.toDouble)
    val n = y.length
    assert(r.getLong(0) == n)
    val mu = y.sum / n
    val e = y.map(_ - mu)
    val c = e.scanLeft(0.0)(_ + _).drop(1)
    def gamma(j: Int) = (j until n).map(t => e(t) * e(t - j)).sum / n
    val lrv = gamma(0) + 2 * (1 to 4).map(j => (1 - j / 5.0) * gamma(j)).sum
    val kpss = c.map(x => x * x).sum / (n.toDouble * n) / lrv
    assert(math.abs(r.getDouble(1) - kpss) / kpss < 1e-4)
  }

  test("snht: max T location and value recomputed") {
    val r = q("q_ts_snht").head()
    val y = series().map(_.toDouble)
    val n = y.length
    val mu = y.sum / n
    val sig = math.sqrt(y.map(v => (v - mu) * (v - mu)).sum / n)
    var best = Double.MinValue; var bestK = -1
    var sk = 0.0
    for (k <- 1 until n) {
      sk += y(k - 1)
      val z1 = (sk / k - mu) / sig
      val z2 = ((y.sum - sk) / (n - k) - mu) / sig
      val t = k * z1 * z1 + (n - k) * z2 * z2
      if (t > best) { best = t; bestK = k }
    }
    assert(r.getLong(2) == bestK)
    assert(math.abs(r.getDouble(3) - best) / best < 1e-6)
  }

  test("buishand: R/(sigma*sqrt(n)) recomputed") {
    val r = q("q_ts_buishand_range").head()
    val y = series().map(_.toDouble)
    val n = y.length
    val mu = y.sum / n
    val c = y.map(_ - mu).scanLeft(0.0)(_ + _)
    val sig = math.sqrt(y.map(v => (v - mu) * (v - mu)).sum / n)
    val rb = (c.max - c.min) / (sig * math.sqrt(n.toDouble))
    assert(math.abs(r.getDouble(1) - rb) / rb < 1e-4)
  }

  test("von neumann: ratio near 2 for shuffled-ish data and exact recompute") {
    val r = q("q_ts_von_neumann").head()
    val y = series().map(_.toDouble)
    val n = y.length
    val mu = y.sum / n
    val num = y.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
    val den = y.map(v => (v - mu) * (v - mu)).sum
    assert(math.abs(r.getDouble(1) - num / den) < 1e-4)
  }

  test("bartels: rank ratio recomputed with average ranks") {
    val r = q("q_ts_bartels_rank").head()
    val y = series()
    val n = y.length
    val sorted = y.sorted
    val rankOf = y.distinct.map { v =>
      val below = sorted.count(_ < v); val t = sorted.count(_ == v)
      v -> (below + (t + 1) / 2.0)
    }.toMap
    val rk = y.map(rankOf)
    val rbar = rk.sum / n
    val num = rk.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
    val den = rk.map(v => (v - rbar) * (v - rbar)).sum
    assert(math.abs(r.getDouble(1) - num / den) < 1e-4)
    assert(r.getLong(0) == n)
  }

  test("turning points: count matches scratch scan") {
    val r = q("q_ts_turning_points").head()
    val y = series()
    val t = (1 until y.length - 1).count(i =>
      (y(i - 1) < y(i) && y(i) > y(i + 1)) ||
        (y(i - 1) > y(i) && y(i) < y(i + 1)))
    assert(r.getLong(0) == y.length)
    assert(r.getLong(1) == t)
  }
}
