package graft

class Extras117Spec extends QuerySuiteBase {
  Seq("q_agg_wasserstein", "q_agg_energy_distance",
      "q_agg_anderson_darling")
    .foreach(checkDeclared(_))

  test("wasserstein: nonnegative; zero against itself would be zero") {
    val r = q("q_agg_wasserstein").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getDouble(3) >= 0.0)
  }

  test("energy distance: nonnegative (characteristic metric)") {
    val r = q("q_agg_energy_distance").head()
    assert(r.getDouble(5) >= -1e-9)
  }

  test("anderson-darling: three samples over the full quantity spine") {
    val r = q("q_agg_anderson_darling").head()
    assert(r.getLong(0) == 3)
    assert(r.getLong(2) <= 50)
    assert(r.getDouble(3) >= 0.0)
  }
}
