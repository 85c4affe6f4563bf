package graft

import org.apache.spark.sql.functions._

class Extras91Spec extends QuerySuiteBase {
  Seq("q_agg_welch_t", "q_agg_moods_median", "q_agg_jonckheere",
    "q_agg_ansari_bradley").foreach(checkDeclared(_))

  private def groups(): Map[String, Array[Long]] =
    Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (Det.dec(col("o_totalprice")) * 100).cast("long"))
      .collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.map(_.getLong(1))
      }

  test("welch t: statistic recomputed from scratch moments") {
    val r = q("q_agg_welch_t").head()
    val gs = groups()
    val (g1, g2) = (gs("1-URGENT"), gs("5-LOW"))
    def mv(xs: Array[Long]): (Double, Double) = {
      val m = xs.map(BigInt(_)).sum.toDouble / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1.0)
      (m, v)
    }
    val ((m1, v1), (m2, v2)) = (mv(g1), mv(g2))
    val t = (m1 - m2) / math.sqrt(v1 / g1.length + v2 / g2.length)
    assert(r.getLong(0) == g1.length && r.getLong(1) == g2.length)
    assert(math.abs(r.getDouble(2) - t) < 1e-4)
  }

  test("moods median: chi2 recomputed from the 2x5 table") {
    val r = q("q_agg_moods_median").head()
    val gs = groups()
    val all = gs.values.flatten.toArray.sorted
    val med = all((all.length + 1) / 2 - 1)
    val cells = gs.map { case (g, xs) =>
      g -> (xs.count(_ > med).toLong, xs.length.toLong)
    }
    val bigN = cells.values.map(_._2).sum
    val bigA = cells.values.map(_._1).sum
    val chi2 = cells.values.map { case (a, n) =>
      val ea = n.toDouble * bigA / bigN
      val eb = n.toDouble * (bigN - bigA) / bigN
      (a - ea) * (a - ea) / ea + ((n - a) - eb) * ((n - a) - eb) / eb
    }.sum
    assert(r.getLong(0) == bigN && r.getLong(1) == bigA)
    assert(math.abs(r.getDouble(2) - chi2) < 1e-3)
  }

  test("jonckheere: jt2 equals brute-force doubled pairwise count") {
    val gs = groups()
    val order = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    var jt2 = BigInt(0)
    for (j <- order.indices; k <- j + 1 until order.length) {
      val (xs, ys) = (gs(order(j)), gs(order(k)))
      val sortedY = ys.sorted
      for (x <- xs) {
        // 2*(#y>... below) + ties, via binary search on sorted ys
        val lo = lowerBound(sortedY, x)
        val hi = upperBound(sortedY, x)
        jt2 += 2 * lo + (hi - lo)
      }
    }
    val r = q("q_agg_jonckheere").head()
    assert(BigInt(r.getLong(1)) == jt2)
  }

  private def lowerBound(a: Array[Long], k: Long): Int = {
    var (lo, hi) = (0, a.length)
    while (lo < hi) { val m = (lo + hi) / 2
      if (a(m) < k) lo = m + 1 else hi = m }
    lo
  }
  private def upperBound(a: Array[Long], k: Long): Int = {
    var (lo, hi) = (0, a.length)
    while (lo < hi) { val m = (lo + hi) / 2
      if (a(m) <= k) lo = m + 1 else hi = m }
    lo
  }

  test("ansari-bradley: ab2 matches scratch doubled end-rank sum") {
    val rows = Tables.lineitem(spark, sf)
      .where(col("l_returnflag").isin("R", "N"))
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length
    val sorted = rows.map(_._2).sorted
    def r2of(v: Long): Long = {
      val below = lowerBound(sorted, v)
      val t = upperBound(sorted, v) - below
      2L * below + t + 1
    }
    val ab2 = rows.filter(_._1 == "R").map { case (_, v) =>
      val r2 = r2of(v)
      math.min(r2, 2L * (n + 1) - r2)
    }.sum
    val r = q("q_agg_ansari_bradley").head()
    assert(r.getLong(0) == n)
    assert(r.getLong(2) == ab2)
  }
}
