package graft

class Extras128Spec extends QuerySuiteBase {
  Seq("q_llm_watermark_screen", "q_llm_source_kl", "q_dq_key_discovery")
    .foreach(checkDeclared(_))

  test("watermark: natural text sits near 1/2 green share") {
    val rows = q("q_llm_watermark_screen").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - 0.5) < 0.1)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("source kl: nonnegative (Gibbs inequality up to smoothing)") {
    val rows = q("q_llm_source_kl").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= -0.01))
  }

  test("key discovery: orderkey is the key, status is not") {
    val rows = q("q_dq_key_discovery").collect()
    val m = rows.map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(m("o_orderkey") == 1)
    assert(m("o_orderstatus") == 0)
  }
}
