package graft

class Extras71Spec extends QuerySuiteBase {
  Seq("q_ts_dickey_fuller", "q_ts_arch_lm", "q_llm_span_corrupt")
    .foreach(checkDeclared(_))

  test("dickey fuller: beta in (-2, 0] for a stationary-ish revenue series") {
    val r = q("q_ts_dickey_fuller").head()
    assert(r.getLong(0) > 100)
    val beta = r.getDouble(1)
    assert(beta <= 0.5 && beta > -2.5)
  }

  test("arch lm: R2 in [0,1]; LM = n*R2") {
    val r = q("q_ts_arch_lm").head()
    val (n, r2, lm) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(lm - n * r2) < 1e-2)
  }

  test("span corrupt: masked counts consistent; spans <= masked; ~20% mask rate") {
    val rows = q("q_llm_span_corrupt").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nm, ns) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nm <= nw && ns <= nm)
    }
    val tw = rows.map(_.getLong(1)).sum.toDouble
    val tm = rows.map(_.getLong(2)).sum.toDouble
    assert(tm / tw > 0.10 && tm / tw < 0.35, s"mask rate ${tm / tw}")
  }
}
