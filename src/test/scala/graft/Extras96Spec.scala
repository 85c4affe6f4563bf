package graft

class Extras96Spec extends QuerySuiteBase {
  Seq("q_agg_gk_gamma", "q_agg_somers_d", "q_agg_tau_c",
    "q_agg_gk_lambda").foreach(checkDeclared(_))

  test("gamma: in [-1, 1] and consistent with its own pair counts") {
    val r = q("q_agg_gk_gamma").head()
    val (c, dd, g) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(g >= -1 && g <= 1)
    assert(math.abs(g - (c - dd).toDouble / (c + dd)) < 1e-6)
  }

  test("somers d: |d_yx| <= |gamma| (denominator only grows)") {
    val g = q("q_agg_gk_gamma").head().getDouble(2)
    val dyx = q("q_agg_somers_d").head().getDouble(3)
    assert(math.abs(dyx) <= math.abs(g) + 1e-9)
    assert(dyx >= -1 && dyx <= 1)
  }

  test("tau-c: m_min is 5 on the 5x5 table and tau_c in [-1, 1]") {
    val r = q("q_agg_tau_c").head()
    assert(r.getLong(1) <= 5)
    assert(r.getDouble(2) >= -1 && r.getDouble(2) <= 1)
  }

  test("lambda: in [0, 1] and zero iff modal source dominates rows") {
    val r = q("q_agg_gk_lambda").head()
    val (n, srm, cm, l) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(srm >= cm && srm <= n)
    assert(l >= 0 && l <= 1)
    assert(math.abs(l - (srm - cm).toDouble / (n - cm)) < 1e-6)
  }
}
