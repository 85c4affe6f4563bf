package graft

import org.apache.spark.sql.functions._

class Extras46Spec extends QuerySuiteBase {
  Seq("q_ts_yoy", "q_ts_pacf", "q_llm_rouge_overlap",
    "q_evt_type_affinity")
    .foreach(checkDeclared(_))

  test("yoy: growth recomputes from the emitted cents") {
    val rows = q("q_ts_yoy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, p, g) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(math.abs(g - (c - p).toDouble / p) < 1e-5)
    }
  }

  test("pacf: lag-1 pacf equals r1; all within [-1, 1]") {
    val r = q("q_ts_pacf").head()
    val vals = (1 to 6).map(r.getDouble)
    vals.foreach(v => assert(v >= -1.0 - 1e-6 && v <= 1.0 + 1e-6))
    assert(r.getDouble(1) == r.getDouble(4)) // r1 == pacf1 by construction
  }

  test("rouge: pair set equals the near-dup pair set; P/R/F consistent") {
    val rouge = q("q_llm_rouge_overlap").collect()
    val near = q("q_llm_dedup_near").collect()
    assert(rouge.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      near.map(r => (r.getLong(0), r.getLong(1))).toSet)
    rouge.foreach { r =>
      val (i, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(i <= math.min(na, nb))
      val (p, rr, f) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(math.abs(f - 2.0 * i / (na + nb)) < 1e-5)
      assert(p <= 1.0 + 1e-9 && rr <= 1.0 + 1e-9)
    }
  }

  test("type affinity: pair support bounded by both marginals") {
    val rows = q("q_evt_type_affinity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, n1, n2, lm) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nb <= math.min(n1, n2))
      assert(r.getString(0) < r.getString(1)) // canonical pair order
      assert(lm >= 0)
    }
    // ranking is by exact integer lift
    val lms = rows.map(_.getLong(5))
    lms.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }
}
