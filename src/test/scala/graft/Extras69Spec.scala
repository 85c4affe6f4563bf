package graft

class Extras69Spec extends QuerySuiteBase {
  Seq("q_ts_changepoint_binseg", "q_evt_srm", "q_ts_mann_kendall_seasonal")
    .foreach(checkDeclared(_))

  test("binseg: 3 rows; level-2 SSEs each at most the level-1 SSE") {
    val rows = q("q_ts_changepoint_binseg").collect()
    assert(rows.length == 3)
    val sse1 = rows.find(_.getLong(0) == 1L).get.getDouble(3)
    rows.filter(_.getLong(0) == 2L).foreach { r =>
      assert(r.getDouble(3) <= sse1 + 1e-6,
        s"level-2 sse ${r.getDouble(3)} exceeds level-1 $sse1")
    }
  }

  test("srm: ALL row present; chi2 = z^2") {
    val rows = q("q_evt_srm").collect()
    assert(rows.exists(_.getString(0) == "ALL"))
    rows.foreach { r =>
      val (chi2, z) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(chi2 - z * z) < 1e-4)
    }
  }

  test("seasonal MK: |S| bounded by pair count; 12 months at sf>=0.001") {
    val r = q("q_ts_mann_kendall_seasonal").head()
    assert(r.getLong(0) == 12)
    assert(math.abs(r.getLong(2)) <= r.getLong(1))
  }
}
