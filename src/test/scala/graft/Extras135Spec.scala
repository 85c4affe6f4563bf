package graft

class Extras135Spec extends QuerySuiteBase {
  Seq("q_llm_embed_standardize", "q_llm_kmeans_elbow",
      "q_llm_label_margin")
    .foreach(checkDeclared(_))

  test("standardize: mean squared norm equals the dimension count") {
    val r = q("q_llm_embed_standardize").head()
    val dims = r.getLong(1).toDouble
    assert(math.abs(r.getDouble(2) - dims) / dims < 0.05)
    assert(r.getDouble(3) >= r.getDouble(2))
  }

  test("elbow: inertia monotonically non-increasing in k") {
    val rows = q("q_llm_kmeans_elbow").collect().sortBy(_.getLong(0))
    assert(rows.length == 5)
    val in = rows.map(_.getDouble(2))
    assert(in.zip(in.tail).forall { case (a, b) => b <= a + 1e-6 })
  }

  test("label margin: positive ratios, nearest is another label") {
    val rows = q("q_llm_label_margin").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(3))
      assert(r.getDouble(5) >= 0.0)
    }
  }
}
