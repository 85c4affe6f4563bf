package graft

class Extras64Spec extends QuerySuiteBase {
  Seq("q_ts_kendall_tau", "q_ts_variance_ratio", "q_ts_parkinson")
    .foreach(checkDeclared(_))

  test("kendall tau: |S| bounded by pair count; tau in [-1, 1]") {
    val r = q("q_ts_kendall_tau").head()
    val (n, n0, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n0 == n * (n - 1) / 2)
    assert(math.abs(s) <= n0)
    val tau = r.getDouble(5)
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("variance ratio: counts consistent; vr positive") {
    val r = q("q_ts_variance_ratio").head()
    val (n1, n5) = (r.getLong(0), r.getLong(1))
    assert(n1 > n5 && n5 > 0)
    assert(n1 - n5 == 4) // s5 defined from rn=6; lr from rn=2
    assert(r.getDouble(2) > 0.0)
  }

  test("parkinson: volatility positive and term sum sane") {
    val r = q("q_ts_parkinson").head()
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) >= 0)
    assert(r.getDouble(2) >= 0.0)
  }
}
