package graft

class Extras119Spec extends QuerySuiteBase {
  Seq("q_agg_quade", "q_agg_siegel_tukey", "q_agg_tukey_hsd",
      "q_agg_capability")
    .foreach(checkDeclared(_))

  test("quade: F nonnegative, B <= A (Cauchy-Schwarz over blocks)") {
    val r = q("q_agg_quade").head()
    val (a16, b16n) = (r.getLong(2), r.getLong(3))
    assert(b16n <= r.getLong(1) * a16)
    assert(r.getDouble(4) >= 0.0)
  }

  test("siegel-tukey: W within the exact rank-sum support") {
    val r = q("q_agg_siegel_tukey").head()
    val (n1, n2, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val n = n1 + n2
    assert(w >= n1 * (n1 + 1) / 2 && w <= n1 * (2 * n - n1 + 1) / 2)
  }

  test("tukey hsd: 10 pairs, q stats nonnegative") {
    val rows = q("q_agg_tukey_hsd").collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("capability: cpk <= cp and cpm <= cp (centering penalties)") {
    val r = q("q_agg_capability").head()
    val (cp, cpk, cpm) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(cpk <= cp + 1e-9 && cpm <= cp + 1e-9)
  }
}
