package graft

class Extras125Spec extends QuerySuiteBase {
  Seq("q_llm_ann_pq").foreach(checkDeclared(_))

  test("pq: 4 queries x 10 reranked results, true dist ascending") {
    val rows = q("q_llm_ann_pq").collect()
    assert(rows.length == 40)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.length == 10)
      val dists = sorted.map(_.getDouble(4))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("pq: distances nonnegative, self excluded") {
    val rows = q("q_llm_ann_pq").collect()
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      assert(r.getDouble(4) >= 0.0)
      assert(r.getLong(2) != r.getLong(0))
    }
  }
}
