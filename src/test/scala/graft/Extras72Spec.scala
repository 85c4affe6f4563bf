package graft

class Extras72Spec extends QuerySuiteBase {
  Seq("q_agg_poisson_bootstrap", "q_ts_gumbel_maxima",
    "q_llm_tokenizer_fertility").foreach(checkDeclared(_))

  test("poisson bootstrap: CI brackets the mean; SE ~ sd/sqrt(n) order") {
    val r = q("q_agg_poisson_bootstrap").head()
    assert(r.getLong(0) == 32)
    val (mean, se, lo, hi) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(se > 0)
    assert(lo < mean && mean < hi)
    assert(math.abs((mean - lo) - 1.96 * se) < 1e-4)
  }

  test("gumbel: return level above location; beta positive") {
    val r = q("q_ts_gumbel_maxima").head()
    assert(r.getLong(0) > 10)
    val (mu, beta, rl) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(beta > 0)
    assert(rl > mu) // 99th percentile return level sits above location
  }

  test("fertility: regex tokens at least split the word count sanely") {
    val rows = q("q_llm_tokenizer_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.2 && r.getDouble(4) < 5.0)
    }
  }
}
