package graft

class Extras111Spec extends QuerySuiteBase {
  Seq("q_evt_session_thresholds", "q_dq_benford_digit2", "q_evt_scd2",
    "q_agg_rank_biserial").foreach(checkDeclared(_))

  test("session thresholds: monotone — larger gaps merge sessions") {
    val rows = q("q_evt_session_thresholds").collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) >= b.getLong(1))
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(2) >= 1.0))
  }

  test("benford d2: expected shares sum to ~1 over the ten digits") {
    val rows = q("q_dq_benford_digit2").collect()
    assert(rows.length == 10)
    val totExp = rows.map(_.getDouble(3)).sum
    val totObs = rows.map(_.getDouble(2)).sum
    assert(math.abs(totExp - 1.0) < 1e-4)
    assert(math.abs(totObs - 1.0) < 1e-4)
  }

  test("scd2: intervals chain per user; exactly one current row") {
    val rows = q("q_evt_scd2").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.count(_.getInt(4) == 1) == 1)
      rs.sortBy(_.getLong(2)).sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) == b.getLong(2))
        case _ =>
      }
    }
  }

  test("rank biserial: in [-1, 1] and consistent with p_superiority") {
    val r = q("q_agg_rank_biserial").head()
    val (p, rb) = (r.getDouble(2), r.getDouble(3))
    assert(p >= 0 && p <= 1)
    assert(math.abs(rb - (2 * p - 1)) < 1e-5)
  }
}
