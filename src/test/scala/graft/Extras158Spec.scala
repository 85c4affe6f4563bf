package graft

class Extras158Spec extends QuerySuiteBase {
  Seq("q_llm_mrr", "q_llm_rbo", "q_ts_durbin_watson")
    .foreach(checkDeclared(_))

  test("mrr: reciprocal ranks match first_rank, mrr is their mean") {
    val rs = q("q_llm_mrr").collect()
    rs.foreach { r =>
      assert(r.getLong(1) >= 1)
      val expect = BigDecimal(math.round(1e9 / r.getLong(1)) / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expect) < 1e-9)
    }
    val mean = rs.map(r => math.round(1e9 / r.getLong(1))).sum / 1e9 /
      rs.length
    val got = rs.head.getDouble(3)
    assert(math.abs(got - BigDecimal(mean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("rbo: in [0,1], equals 1 only when rankings agree fully") {
    val r = q("q_llm_rbo").collect().head
    val rbo = r.getDouble(1)
    assert(rbo >= 0.0 && rbo <= 1.0 + 1e-9)
    assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
  }

  test("durbin-watson: dw in [0,4], rho consistent") {
    val r = q("q_ts_durbin_watson").collect().head
    val (dw, rho) = (r.getDouble(1), r.getDouble(2))
    assert(dw >= 0.0 && dw <= 4.0, s"dw=$dw outside [0,4]")
    assert(math.abs(rho - (1.0 - dw / 2)) < 1e-5)
  }
}
