package graft

class Extras131Spec extends QuerySuiteBase {
  Seq("q_agg_tost", "q_ts_ar2_yw", "q_evt_power_mde")
    .foreach(checkDeclared(_))

  test("tost: flag consistent with the two one-sided statistics") {
    val r = q("q_agg_tost").head()
    val (diff, tLo, tHi) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    // t_lower - t_upper = 2*diff/se: the sign must track diff
    assert((tLo - tHi) * diff >= -1e-9)
    assert(r.getInt(5) == (if (tLo > 1.645 && tHi > 1.645) 1 else 0))
  }

  test("ar2: stationarity triangle on the fitted coefficients") {
    val r = q("q_ts_ar2_yw").head()
    val (p1, p2) = (r.getDouble(3), r.getDouble(4))
    assert(p2 > -1.0 && p2 < 1.0)
    assert(p2 + p1 < 1.0 + 1e-6 && p2 - p1 < 1.0 + 1e-6)
  }

  test("mde: non-saturated conversion, positive detectable effect") {
    val r = q("q_evt_power_mde").head()
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
    assert(r.getDouble(3) > 0.0)
    assert(r.getDouble(4) > 0.0)
  }
}
