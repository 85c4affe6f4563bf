package graft

class Extras67Spec extends QuerySuiteBase {
  Seq("q_ts_granger", "q_agg_wilcoxon", "q_agg_theil_decomp")
    .foreach(checkDeclared(_))

  test("granger: F finite and non-negative-ish; n matches spine minus 1") {
    val r = q("q_ts_granger").head()
    val n = r.getLong(0)
    assert(n > 100)
    val f = r.getDouble(3)
    assert(!f.isNaN && !f.isInfinite)
  }

  test("wilcoxon: two_wplus bounded by doubled total rank sum") {
    val r = q("q_agg_wilcoxon").head()
    val (n, twoW) = (r.getLong(0), r.getLong(1))
    // sum of all doubled ranks = n(n+1); W+ is a subset
    assert(twoW >= 0 && twoW <= n * (n + 1))
    assert(!r.getDouble(3).isNaN)
  }

  test("theil decomposition: within + between ≈ total (quantization residual)") {
    val r = q("q_agg_theil_decomp").head()
    val (tot, w, b, resid) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(tot >= 0 && w >= 0 && b >= -1e-6)
    assert(math.abs(resid) < 1e-3, s"residual $resid too large")
    assert(math.abs(tot - w - b - resid) < 1e-5)
  }
}
