package graft

class Extras133Spec extends QuerySuiteBase {
  Seq("q_source_fixedwidth", "q_ts_dow_chi2", "q_agg_delta_method")
    .foreach(checkDeclared(_))

  test("fixedwidth: five priorities, positive checksums") {
    val rows = q("q_source_fixedwidth").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
    }
  }

  test("dow chi2: seven weekdays, nonnegative statistic") {
    val r = q("q_ts_dow_chi2").head()
    assert(r.getLong(0) == 7)
    assert(r.getDouble(2) >= 0.0)
  }

  test("delta method: positive SE, huge t on real revenue") {
    val r = q("q_agg_delta_method").head()
    assert(r.getDouble(1) > 0.0)
    assert(r.getDouble(2) > 0.0)
    assert(r.getDouble(3) > 10.0)
  }
}
