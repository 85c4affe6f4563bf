package graft

class Extras114Spec extends QuerySuiteBase {
  Seq("q_llm_dedup_cascade", "q_llm_ngram_coverage", "q_agg_tau_b")
    .foreach(checkDeclared(_))

  test("cascade: survivor counts are monotone non-increasing") {
    val rows = q("q_llm_dedup_cascade").collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) >= b.getLong(2))
      case _ =>
    }
    assert(rows.head.getString(1) == "all_docs")
  }

  test("coverage: monotone in k and bounded by 1") {
    val rows = q("q_llm_ngram_coverage").collect()
    assert(rows.length == 3)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(3) + 1e-12)
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1))
  }

  test("tau-b: in [-1, 1], pair counts consistent") {
    val r = q("q_agg_tau_b").head()
    assert(r.getDouble(3) >= -1 && r.getDouble(3) <= 1)
    val w = r.getLong(0) * (r.getLong(0) - 1) / 2
    assert(r.getLong(1) + r.getLong(2) <= w)
  }
}
