package graft

class Extras62Spec extends QuerySuiteBase {
  Seq("q_ts_mann_kendall").foreach(checkDeclared(_))

  test("mann kendall: S bounded by pair count; pairs = C(n,2)") {
    val r = q("q_ts_mann_kendall").head()
    val (n, np, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(np == n * (n - 1) / 2)
    assert(math.abs(s) <= np)
    assert(r.getLong(3) <= np)  // tie pairs are pairs
    // Z magnitude sane for a revenue series
    assert(math.abs(r.getDouble(4)) < 50)
  }
}
