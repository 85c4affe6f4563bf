package graft

class Extras123Spec extends QuerySuiteBase {
  Seq("q_ts_variogram", "q_agg_ks_uniform", "q_llm_char_entropy")
    .foreach(checkDeclared(_))

  test("variogram: 30 lags, gamma nonnegative") {
    val rows = q("q_ts_variogram").collect()
    assert(rows.length == 30)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("ks uniform: D in [0, 1]") {
    val r = q("q_agg_ks_uniform").head()
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    assert(r.getLong(1) > 0)
  }

  test("char entropy: bounded by log2(alphabet)") {
    val rows = q("q_llm_char_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(3)
      val bound = math.log(r.getLong(2).toDouble) / math.log(2.0)
      assert(h >= 0.0 && h <= bound + 1e-6)
    }
  }
}
