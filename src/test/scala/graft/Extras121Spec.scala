package graft

class Extras121Spec extends QuerySuiteBase {
  Seq("q_ts_garman_klass", "q_agg_cuzick", "q_dq_drift_chi2",
      "q_llm_rake_keyphrases")
    .foreach(checkDeclared(_))

  test("garman-klass: OHLC bars well-ordered (l <= o,c <= h)") {
    val rows = q("q_ts_garman_klass").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("cuzick: T within the exact doubled-rank support") {
    val r = q("q_agg_cuzick").head()
    val n = r.getLong(0)
    val t2 = r.getLong(1)
    // every mr2 is in [2, 2N] and every g in [1, 7]
    assert(t2 >= 2 * n && t2 <= 7L * 2 * n * n)
  }

  test("drift chi2: halves cover all events, chi2 nonnegative") {
    val r = q("q_dq_drift_chi2").head()
    assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    assert(r.getDouble(3) >= 0.0)
  }

  test("rake: 15 phrases, scores descending, phrases stopword-free") {
    val rows = q("q_llm_rake_keyphrases").collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val stops = Set("a", "the", "and", "of", "to", "in", "is", "it")
    rows.foreach { r =>
      assert(r.getString(1).split(" ").forall(w => !stops.contains(w)))
    }
  }
}
