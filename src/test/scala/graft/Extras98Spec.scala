package graft

class Extras98Spec extends QuerySuiteBase {
  Seq("q_agg_brunner_munzel", "q_agg_cramer_von_mises",
    "q_agg_dagostino_k2").foreach(checkDeclared(_))

  test("brunner-munzel: p_hat in [0,1], near 1/2 on symmetric draws") {
    val r = q("q_agg_brunner_munzel").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val p = r.getDouble(2)
    assert(p >= 0 && p <= 1)
    assert(!r.getDouble(3).isNaN)
  }

  test("cramer-von mises: nonnegative and bounded by N/ (heuristic)") {
    val r = q("q_agg_cramer_von_mises").head()
    assert(r.getDouble(2) >= 0)
    assert(r.getDouble(2) < (r.getLong(0) + r.getLong(1)).toDouble)
  }

  test("dagostino: K2 = z1^2 + z2^2 and matches direct moments") {
    val r = q("q_agg_dagostino_k2").head()
    val (z1, z2, k2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(k2 - (z1 * z1 + z2 * z2)) < 1e-4)
    val qs = Tables.lineitem(spark, sf)
      .select("l_quantity").collect().map(_.getDouble(0))
    val n = qs.length.toDouble
    val mean = qs.sum / n
    val m2 = qs.map(v => (v - mean) * (v - mean)).sum / n
    val m3 = qs.map(v => math.pow(v - mean, 3)).sum / n
    val g1 = m3 / math.pow(m2, 1.5)
    // z_skew has the sign of g1 (uniform-ish quantity: |g1| small)
    assert(z1.sign == g1.sign || math.abs(g1) < 1e-3)
  }
}
