package graft

class Extras106Spec extends QuerySuiteBase {
  Seq("q_llm_mmr", "q_llm_rrf", "q_llm_ndcg").foreach(checkDeclared(_))

  test("mmr: 10 distinct picks; first pick is the top-relevance doc") {
    val rows = q("q_llm_mmr").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).distinct.length == 10)
    val topk = q("q_llm_sim_topk").collect()
    assert(rows.head.getLong(1) == topk.head.getLong(0))
    // greedy scores are non-increasing only for the relevance part;
    // at least assert the first score dominates
    assert(rows.head.getDouble(2) >= rows.last.getDouble(2))
  }

  test("rrf: 10 rows, fused score consistent with ranks") {
    val rows = q("q_llm_rrf").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val e = 1.0 / (r.getLong(1) + 60) + 1.0 / (r.getLong(2) + 60)
      assert(math.abs(r.getDouble(3) - e) < 1e-5)
    }
  }

  test("ndcg: in [0, 1], idcg >= dcg") {
    val r = q("q_llm_ndcg").head()
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(2) >= r.getDouble(1) - 1e-9)
  }
}
