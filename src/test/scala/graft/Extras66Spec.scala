package graft

class Extras66Spec extends QuerySuiteBase {
  Seq("q_graph_eigencentrality", "q_llm_embed_pc1")
    .foreach(checkDeclared(_))

  test("eigencentrality: scores in (0, 1e6]; max attained") {
    val scores = q("q_graph_eigencentrality").collect().map(_.getLong(1))
    assert(scores.forall(s => s >= 0 && s <= 1000000L))
    assert(scores.max == 1000000L)
  }

  test("embed pc1: 16 loadings, max |loading| = 1e6") {
    val rows = q("q_llm_embed_pc1").collect()
    assert(rows.length == 16)
    val ls = rows.map(_.getLong(1))
    assert(ls.map(math.abs).max == 1000000L)
    assert(ls.forall(l => math.abs(l) <= 1000000L))
  }
}
