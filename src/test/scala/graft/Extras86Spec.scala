package graft

import org.apache.spark.sql.functions._

class Extras86Spec extends QuerySuiteBase {
  Seq("q_agg_kruskal_wallis", "q_agg_bartlett", "q_agg_mcnemar",
    "q_agg_bh_fdr", "q_agg_cohen_kappa").foreach(checkDeclared(_))

  private def sample(): Map[String, Array[Long]] =
    Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (Det.dec(col("o_totalprice")) * 100).cast("long"))
      .collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.map(_.getLong(1))
      }

  test("kruskal-wallis: H recomputed from scratch ranks") {
    val r = q("q_agg_kruskal_wallis").head()
    val groups = sample()
    val all = groups.values.flatten.toArray.sorted
    val n = all.length
    assert(r.getLong(0) == n)
    // average rank per value (1-based)
    val rankOf = all.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) =>
        v -> xs.map(_._2 + 1).sum.toDouble / xs.length
      }
    val sumT = all.groupBy(identity).values
      .map(g => math.pow(g.length.toDouble, 3) - g.length).sum
    val hRaw = 12.0 / (n.toDouble * (n + 1)) * groups.values.map { xs =>
      val rj = xs.map(rankOf).sum
      rj * rj / xs.length
    }.sum - 3.0 * (n + 1)
    val h = hRaw / (1.0 - sumT / (math.pow(n.toDouble, 3) - n))
    assert(math.abs(r.getDouble(2) - h) < 1e-3)
  }

  test("bartlett: statistic recomputed from per-group variances") {
    val r = q("q_agg_bartlett").head()
    val groups = sample().values.toSeq
    val k = groups.length
    val n = groups.map(_.length).sum
    def variance(xs: Array[Long]): Double = {
      val m = xs.map(BigInt(_)).sum.toDouble / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1.0)
    }
    val sp = groups.map(g => (g.length - 1) * variance(g)).sum /
      (n - k).toDouble
    val num = (n - k) * math.log(sp) -
      groups.map(g => (g.length - 1) * math.log(variance(g))).sum
    val corr = 1.0 + (groups.map(g => 1.0 / (g.length - 1)).sum
      - 1.0 / (n - k)) / (3.0 * (k - 1))
    assert(math.abs(r.getDouble(1) - sp) / sp < 1e-6)
    assert(math.abs(r.getDouble(2) - num / corr) < 1e-3)
  }

  test("mcnemar: chi2 consistent with discordant cells") {
    val r = q("q_agg_mcnemar").head()
    val (b, c) = (r.getLong(1), r.getLong(2))
    assert(b + c > 0)
    val chi2 = (b - c).toDouble * (b - c) / (b + c)
    assert(math.abs(r.getDouble(3) - chi2) < 1e-5)
    assert(r.getDouble(4) <= r.getDouble(3))
  }

  test("bh fdr: rejection set is a rank prefix and respects the cutoff") {
    val rows = q("q_agg_bh_fdr").collect().sortBy(_.getLong(4))
    val m = rows.length
    assert(m == 5)
    val rejected = rows.filter(_.getLong(5) == 1L)
    // prefix property
    rejected.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(4) == i + 1)
    }
    // every rejected rank at or below the last hit; p non-decreasing
    val ps = rows.map(_.getDouble(3))
    assert(ps.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("cohen kappa: table adds up; kappa in [-1, 1]") {
    val r = q("q_agg_cohen_kappa").head()
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)
      == r.getLong(0))
    assert(r.getDouble(5) >= -1.0 && r.getDouble(5) <= 1.0)
  }
}
