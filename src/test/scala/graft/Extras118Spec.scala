package graft

class Extras118Spec extends QuerySuiteBase {
  Seq("q_agg_mood_median", "q_agg_page_trend", "q_ts_runs_mean",
      "q_llm_zipf_per_source")
    .foreach(checkDeclared(_))

  test("mood median: five priority groups, chi2 nonnegative") {
    val r = q("q_agg_mood_median").head()
    assert(r.getLong(0) == 5)
    assert(r.getLong(2) > 0 && r.getLong(2) < r.getLong(1))
    assert(r.getDouble(3) >= 0.0)
  }

  test("page trend: L within its exact support") {
    val r = q("q_agg_page_trend").head()
    val b = r.getLong(1)
    val l = r.getDouble(3)
    // support of L for k=5: b*35 (reverse order) .. b*55 (perfect order)
    assert(l >= 35.0 * b && l <= 55.0 * b)
  }

  test("runs mean: runs count bounded by sign totals") {
    val r = q("q_ts_runs_mean").head()
    val (n1, n2, runs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(runs >= 1 && runs <= n1 + n2)
  }

  test("zipf per source: one slope per source, negative on real text") {
    val rows = q("q_llm_zipf_per_source").collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getLong(1) <= 50)
      assert(r.getDouble(2) < 0.0)
    }
  }
}
