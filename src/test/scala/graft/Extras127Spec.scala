package graft

class Extras127Spec extends QuerySuiteBase {
  Seq("q_ts_its_segmented", "q_ts_hoeffding_d", "q_agg_overdispersion")
    .foreach(checkDeclared(_))

  test("its: both segments populated, changes are consistent diffs") {
    val r = q("q_ts_its_segmented").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(math.abs((r.getDouble(3) - r.getDouble(2)) - r.getDouble(4))
      < 1e-5)
  }

  test("hoeffding: D within its theoretical range [-0.5, 1]") {
    val r = q("q_ts_hoeffding_d").head()
    val dd = r.getDouble(3)
    assert(dd >= -0.5 - 1e-9 && dd <= 1.0 + 1e-9)
  }

  test("overdispersion: identity chi2 = (n-1) * ratio holds") {
    val r = q("q_agg_overdispersion").head()
    val n = r.getLong(0).toDouble
    assert(math.abs(r.getDouble(4) - (n - 1) * r.getDouble(3))
      / r.getDouble(4) < 1e-3)
  }
}
