package graft

class Extras105Spec extends QuerySuiteBase {
  Seq("q_agg_mahalanobis", "q_agg_hotelling_t2", "q_agg_box_m",
    "q_agg_lda_axis").foreach(checkDeclared(_))

  test("mahalanobis: 10 rows, distances positive and non-increasing") {
    val rows = q("q_agg_mahalanobis").collect()
    assert(rows.length == 10)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(2) > 0))
  }

  test("hotelling: T2 nonnegative, F consistent") {
    val r = q("q_agg_hotelling_t2").head()
    assert(r.getDouble(2) >= 0)
    val bigN = (r.getLong(0) + r.getLong(1)).toDouble
    val f = r.getDouble(2) * (bigN - 3) / ((bigN - 2) * 2)
    assert(math.abs(r.getDouble(3) - f) < 1e-3)
  }

  test("box m: nonnegative (pooled det dominates by concavity)") {
    val r = q("q_agg_box_m").head()
    assert(r.getDouble(2) >= 0)
    assert(r.getDouble(3) <= r.getDouble(2))
  }

  test("lda: separation nonnegative (quadratic form; ~0 when classes overlap)") {
    val r = q("q_agg_lda_axis").head()
    assert(r.getDouble(3) >= 0)
    assert(!r.getDouble(2).isNaN)
  }
}
