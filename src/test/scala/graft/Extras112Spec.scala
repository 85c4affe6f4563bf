package graft

class Extras112Spec extends QuerySuiteBase {
  Seq("q_ts_haar_energy", "q_agg_gini_stump", "q_agg_wilson_ci",
    "q_agg_risk_ratio").foreach(checkDeclared(_))

  test("haar: 8 levels, block counts halve as levels coarsen") {
    val rows = q("q_ts_haar_energy").collect()
    assert(rows.length == 8)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) <= a.getLong(1) / 2 + 1)
      case _ =>
    }
    rows.foreach(r => assert(r.getLong(2) >= 0))
  }

  test("stump: gain nonnegative, impurity below the root") {
    val r = q("q_agg_gini_stump").head()
    assert(r.getDouble(2) >= -1e-9)
    assert(r.getDouble(1) >= 0 && r.getDouble(1) <= 0.5)
  }

  test("wilson: interval brackets p_hat inside [0,1]") {
    val r = q("q_agg_wilson_ci").head()
    val (p, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= p && p <= hi)
    assert(lo >= 0 && hi <= 1)
  }

  test("risk ratio: CI brackets the point estimate") {
    val r = q("q_agg_risk_ratio").head()
    val (rr, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= rr && rr <= hi)
    assert(rr > 0)
  }
}
