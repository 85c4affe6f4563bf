package graft

class Extras107Spec extends QuerySuiteBase {
  Seq("q_evt_attribution_shapley", "q_ts_holt_damped")
    .foreach(checkDeclared(_))

  test("shapley: four channels; efficiency within quantization slack") {
    val rows = q("q_evt_attribution_shapley").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
    // Σφ = v(full) − v(∅) when all coalitions are observed; with
    // missing coalitions valued 0 the sum is still bounded by 1
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total) <= 1.0 + 1e-6)
  }

  test("holt damped: 7 horizons per type; damping shrinks increments") {
    val rows = q("q_ts_holt_damped").collect()
    val types = rows.map(_.getString(0)).distinct
    assert(rows.length == types.length * 7)
    // per type: |f(h+1)−f(h)| non-increasing (damped trend)
    types.foreach { t =>
      val fs = rows.filter(_.getString(0) == t).sortBy(_.getLong(1))
        .map(_.getLong(2))
      val diffs = fs.sliding(2).map { case Array(a, b) =>
        math.abs(b - a) }.toSeq
      diffs.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a + 1)
        case _ =>
      }
    }
  }

}
