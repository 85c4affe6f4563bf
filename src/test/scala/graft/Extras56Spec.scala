package graft

import org.apache.spark.sql.functions._

class Extras56Spec extends QuerySuiteBase {
  Seq("q_evt_markov_stationary", "q_evt_basket_rules")
    .foreach(checkDeclared(_))

  test("stationary: mass approximately conserved; all states positive") {
    val rows = q("q_evt_markov_stationary").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    // truncating division leaks at most (#edges × #iterations) micro-units
    assert(total <= 1000000L)
    assert(total >= 1000000L - 12L * 64 * 10)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("basket rules: thresholds honored; confidence exact") {
    val rows = q("q_evt_basket_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nAb, na) = (r.getLong(2), r.getLong(3))
      assert(nAb >= 20 && nAb * 10 >= na)
      assert(r.getLong(5) == nAb * 1000000L / na)
      assert(r.getString(0) != r.getString(1))
    }
    val confs = rows.map(_.getLong(5))
    confs.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }
}
