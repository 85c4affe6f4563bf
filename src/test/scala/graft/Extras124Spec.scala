package graft

class Extras124Spec extends QuerySuiteBase {
  Seq("q_agg_gamma_mom", "q_agg_lognormal_fit", "q_ts_ami_lag1",
      "q_llm_lang_source_chi2")
    .foreach(checkDeclared(_))

  test("gamma mom: shape and scale positive, m = shape * scale") {
    val r = q("q_agg_gamma_mom").head()
    val (m, k, th) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
    assert(k > 0 && th > 0)
    assert(math.abs(k * th - m) / m < 1e-3)
  }

  test("lognormal: implied median below implied mean") {
    val r = q("q_agg_lognormal_fit").head()
    assert(r.getDouble(3) <= r.getDouble(4))
    assert(r.getDouble(2) >= 0.0)
  }

  test("ami: nonnegative, at most 2 bits for 4 bins") {
    val r = q("q_ts_ami_lag1").head()
    val ami = r.getDouble(2)
    assert(ami >= -1e-6 && ami <= 2.0)
    assert(r.getLong(1) <= 16)
  }

  test("lang-source chi2: V in [0,1]") {
    val r = q("q_llm_lang_source_chi2").head()
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getDouble(3) >= 0.0)
  }
}
