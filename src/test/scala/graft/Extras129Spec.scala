package graft

class Extras129Spec extends QuerySuiteBase {
  Seq("q_evt_cindex", "q_ts_block_bootstrap", "q_agg_ipf_raking")
    .foreach(checkDeclared(_))

  test("cindex: in [0, 1], comparable pairs positive") {
    val r = q("q_evt_cindex").head()
    assert(r.getLong(0) > 0)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("block bootstrap: 50 resamples, positive standard error") {
    val r = q("q_ts_block_bootstrap").head()
    assert(r.getLong(0) == 50)
    assert(r.getDouble(1) > 0.0 && r.getDouble(2) > 0.0)
  }

  test("raking: 15 cells, row margins converge to n/5") {
    val rows = q("q_agg_ipf_raking").collect()
    assert(rows.length == 15)
    val total = rows.map(_.getLong(2)).sum.toDouble
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val rowMass = rs.map(_.getDouble(3)).sum
      assert(math.abs(rowMass - total / 5.0) / (total / 5.0) < 0.01)
    }
  }
}
