package graft

class Extras110Spec extends QuerySuiteBase {
  Seq("q_ts_detrended_seasonal_strength", "q_ts_gumbel_return", "q_ts_peak_days",
    "q_agg_qte_deciles").foreach(checkDeclared(_))

  test("seasonal strength: in [0,1], ratio consistent") {
    val r = q("q_ts_detrended_seasonal_strength").head()
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    assert(math.abs(r.getDouble(2) -
      math.max(1.0 - r.getDouble(1), 0.0)) < 1e-5)
  }

  test("gumbel: return level above the location parameter") {
    val r = q("q_ts_gumbel_return").head()
    assert(r.getLong(0) >= 12)
    assert(r.getDouble(3) > r.getDouble(1))
    assert(r.getDouble(2) > 0)
  }

  test("peak days: every z_excess > 2") {
    val rows = q("q_ts_peak_days").collect()
    rows.foreach(r => assert(r.getDouble(1) > 2))
  }

  test("qte: 9 deciles, quantiles nondecreasing within each class") {
    val rows = q("q_agg_qte_deciles").collect()
    assert(rows.length == 9)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) <= b.getLong(1))
        assert(a.getLong(2) <= b.getLong(2))
      case _ =>
    }
  }
}
