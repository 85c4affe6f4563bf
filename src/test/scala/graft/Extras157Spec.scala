package graft

class Extras157Spec extends QuerySuiteBase {
  Seq("q_ts_shesd", "q_ml_youden_cost", "q_ml_brier_decomp",
    "q_agg_mutual_info").foreach(checkDeclared(_))

  test("shesd: three rounds, deviations non-increasing, distinct days") {
    val rs = q("q_ts_shesd").collect().sortBy(_.getLong(0))
    assert(rs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rs.map(_.getDate(1).toString).distinct.length == 3)
    // each round's |n·r − Σr| is the max of a shrinking set, but n/Σr
    // change per round; assert the invariant that every pick is
    // nonzero-deviation on this fixture
    assert(rs.forall(r => math.abs(r.getLong(4)) > 0))
  }

  test("youden+cost: thresholds live on the spine, J in [0,1]") {
    val r = q("q_ml_youden_cost").collect().head
    assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 10)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    assert(r.getLong(3) >= 0)
  }

  test("brier decomposition: Murphy identity REL − RES + UNC = BS") {
    val r = q("q_ml_brier_decomp").collect().head
    val (rel, res, unc, bs) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs(rel - res + unc - bs) < 1e-5,
      s"identity violated: $rel - $res + $unc != $bs")
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25 + 1e-9)
  }

  test("mutual info: 0 <= MI <= min(Hx, Hy), NMI in [0,1]") {
    val r = q("q_agg_mutual_info").collect().head
    val (mi, hx, hy, nmi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(mi >= -1e-9)
    assert(mi <= math.min(hx, hy) + 1e-6)
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
  }
}
