package graft

class Extras113Spec extends QuerySuiteBase {
  Seq("q_agg_stratified_ate", "q_ts_binary_segmentation", "q_ml_mcc",
    "q_ml_gain_curve").foreach(checkDeclared(_))

  test("stratified ate: five strata, magnitude sane") {
    val r = q("q_agg_stratified_ate").head()
    assert(r.getLong(0) == 5)
    assert(math.abs(r.getDouble(1)) < 1e6)
  }

  test("binary segmentation: 3 changepoints, children distinct from root") {
    val rows = q("q_ts_binary_segmentation").collect()
    assert(rows.length == 3)
    val days = rows.map(_.getDate(2).toString)
    assert(days.distinct.length == 3)
    assert(rows.head.getLong(0) == 1)
  }

  test("mcc: in [-1, 1]; balanced accuracy in [0, 1]") {
    val r = q("q_ml_mcc").head()
    assert(r.getDouble(2) >= -1 && r.getDouble(2) <= 1)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
  }

  test("gain curve: capture and frac both reach 1 at the lowest score") {
    val rows = q("q_ml_gain_curve").collect()
    val last = rows.last
    assert(math.abs(last.getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(last.getDouble(2) - 1.0) < 1e-9)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(2) <= b.getDouble(2) + 1e-12)
      case _ =>
    }
  }
}
