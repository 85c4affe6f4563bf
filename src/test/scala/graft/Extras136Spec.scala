package graft

class Extras136Spec extends QuerySuiteBase {
  Seq("q_ts_quarter_end_effect", "q_agg_cohens_h", "q_ts_mase")
    .foreach(checkDeclared(_))

  test("quarter end: both groups populated, rel and abs agree in sign") {
    val r = q("q_ts_quarter_end_effect").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getDouble(2) * r.getDouble(3) >= 0.0)
  }

  test("cohens h: within [-pi, pi], sign tracks the rate gap") {
    val r = q("q_agg_cohens_h").head()
    val h = r.getDouble(4)
    assert(h >= -math.Pi && h <= math.Pi)
    assert(h * (r.getDouble(2) - r.getDouble(3)) >= 0.0)
  }

  test("mase: positive, consistent with the two MAEs") {
    val r = q("q_ts_mase").head()
    val expected = r.getDouble(2) / r.getDouble(3)
    assert(math.abs(r.getDouble(4) - expected) < 1e-4)
  }
}
