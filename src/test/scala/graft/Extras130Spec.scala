package graft

class Extras130Spec extends QuerySuiteBase {
  Seq("q_ts_welch", "q_ts_median_boot_ci", "q_llm_feature_corr")
    .foreach(checkDeclared(_))

  test("welch: 8 harmonics, nonnegative psd, same segment count") {
    val rows = q("q_ts_welch").collect()
    assert(rows.length == 8)
    val segs = rows.map(_.getLong(1)).distinct
    assert(segs.length == 1 && segs.head > 1)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("median boot: CI brackets the observed median") {
    val r = q("q_ts_median_boot_ci").head()
    val (obs, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= hi)
    assert(obs >= lo * 0.8 && obs <= hi * 1.2)
  }

  test("feature corr: near-perfect length-token correlation") {
    val rows = q("q_llm_feature_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c > 0.5 && c <= 1.0) // tokens scale with chars
    }
  }
}
