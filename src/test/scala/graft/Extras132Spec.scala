package graft

class Extras132Spec extends QuerySuiteBase {
  Seq("q_ts_approx_entropy", "q_ts_rqa", "q_dq_duplicate_rows")
    .foreach(checkDeclared(_))

  test("apen: nonnegative regularity statistic") {
    val r = q("q_ts_approx_entropy").head()
    assert(r.getDouble(2) >= -1e-6)
    assert(r.getLong(1) > 0)
  }

  test("rqa: rates in [0,1], determinism over recurrent points") {
    val r = q("q_ts_rqa").head()
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("duplicate profile: groups of size >= 2, ranked descending") {
    val rows = q("q_dq_duplicate_rows").collect()
    rows.foreach(r => assert(r.getLong(4) >= 2))
    val sizes = rows.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }
}
