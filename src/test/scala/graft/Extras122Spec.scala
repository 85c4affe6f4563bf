package graft

class Extras122Spec extends QuerySuiteBase {
  Seq("q_ts_cointegration", "q_evt_gap_trend", "q_win_hampel")
    .foreach(checkDeclared(_))

  test("cointegration: revenue tracks count, residual mean-reverts") {
    val r = q("q_ts_cointegration").head()
    assert(r.getDouble(1) > 0.0) // positive revenue-per-order slope
    assert(r.getDouble(3) < 0.0) // ADF t on residual is negative
  }

  test("gap trend: signs partition users") {
    val r = q("q_evt_gap_trend").head()
    assert(r.getLong(1) + r.getLong(2) <= r.getLong(0))
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("hampel: every flagged day violates the exact gate") {
    val rows = q("q_win_hampel").collect()
    rows.foreach { r =>
      val (v, med, mad) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(math.abs(v - med) * 10000 > mad * 44478)
    }
  }
}
