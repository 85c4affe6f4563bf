package graft

class Extras120Spec extends QuerySuiteBase {
  Seq("q_ts_lombscargle", "q_evt_winback", "q_llm_bigram_jaccard")
    .foreach(checkDeclared(_))

  test("lomb-scargle: 28 trial periods, power nonnegative") {
    val rows = q("q_ts_lombscargle").collect()
    assert(rows.length == 28)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(3) >= 0.0)
      // white-noise-ish order dates: no period should explain more
      // than a trivial share of the variance (power ≈ O(1) vs n/2)
      assert(r.getDouble(3) < r.getLong(1).toDouble / 2.0)
    }
  }

  test("winback: buckets ordered, gap averages inside bucket ranges") {
    val rows = q("q_evt_winback").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getLong(0)
      val avg = r.getDouble(3)
      assert(avg >= 90.0 * b - 1e-9)
      if (b < 8) assert(avg < 90.0 * (b + 1))
    }
  }

  test("bigram jaccard: bounded pair matrix, jaccard in [0,1]") {
    val rows = q("q_llm_bigram_jaccard").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }
}
