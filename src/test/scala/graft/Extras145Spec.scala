package graft

class Extras145Spec extends QuerySuiteBase {
  Seq("q_ml_f1_sweep", "q_ml_calibration", "q_llm_charclass",
    "q_agg_price_volume").foreach(checkDeclared(_))

  test("f1 sweep: tp monotone falls with threshold, f1 in [0,1]") {
    val rows = q("q_ml_f1_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
      .sortBy(_._1)
    rows.map(_._2).sliding(2).foreach(p =>
      if (p.length == 2) assert(p(0) >= p(1)))
    rows.foreach { case (_, _, f1) => assert(f1 >= 0.0 && f1 <= 1.0) }
  }

  test("calibration: ece is the count-weighted mean gap") {
    val rows = q("q_ml_calibration").collect()
      .map(r => (r.getLong(1), r.getDouble(5), r.getDouble(6)))
    val ece = rows.head._3
    assert(rows.forall(r => math.abs(r._3 - ece) < 1e-9))
    val expected = rows.map { case (n, gap, _) => n * gap }.sum /
      rows.map(_._1).sum
    assert(math.abs(ece - expected) < 1e-4)
  }

  test("charclass: classes partition the character total") {
    val r = q("q_llm_charclass").head()
    assert(r.getLong(0) ==
      r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4))
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
  }

  test("pvm: volume + price effects reconstruct the revenue delta") {
    q("q_agg_price_volume").collect().foreach { r =>
      val deltaUsd = r.getLong(1) / 100.0
      val sum = r.getDouble(2) + r.getDouble(3)
      assert(math.abs(sum - deltaUsd) < math.max(1.0, deltaUsd.abs * 1e-6),
        s"pvm $sum != delta $deltaUsd")
    }
  }
}
