package graft

class Extras109Spec extends QuerySuiteBase {
  Seq("q_agg_hill_tail", "q_ts_cusum_chart", "q_agg_meta_analysis")
    .foreach(checkDeclared(_))

  test("hill: alpha positive; large for the light-tailed revenue") {
    val r = q("q_agg_hill_tail").head()
    assert(r.getLong(0) == 100)
    assert(r.getDouble(2) > 0)
  }

  test("cusum: alarms bounded by days; max S covers the largest day") {
    val r = q("q_ts_cusum_chart").head()
    assert(r.getLong(1) >= 0 && r.getLong(1) < r.getLong(0))
    assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(0))
    assert(r.getDouble(3) >= 0)
  }

  test("meta: pooled effect lies within the per-year effect range") {
    val r = q("q_agg_meta_analysis").head()
    assert(r.getLong(0) >= 5)
    assert(r.getDouble(2) >= 0)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) < 1)
    assert(math.abs(r.getDouble(1)) < 10)
  }
}
