package graft

import org.apache.spark.sql.functions._

class Extras55Spec extends QuerySuiteBase {
  Seq("q_evt_logrank", "q_llm_banding_tradeoff", "q_fn_natural_sort")
    .foreach(checkDeclared(_))

  test("logrank: variance positive; Z consistent with its pieces") {
    val r = q("q_evt_logrank").head()
    val (num, v) = (r.getLong(1), r.getLong(2))
    assert(v > 0)
    val z = num.toDouble / math.sqrt(v.toDouble * 1e6)
    assert(math.abs(r.getDouble(3) - z) < 1e-4)
  }

  test("banding tradeoff: 8x2 is strictly more permissive than 4x4") {
    val rows = q("q_llm_banding_tradeoff").collect()
    val byCfg = rows.map(r => r.getString(0) -> r).toMap
    val (b44, b82) = (byCfg("b4r4"), byCfg("b8r2"))
    assert(b82.getLong(1) >= b44.getLong(1))       // more candidates
    assert(b82.getLong(2) >= b44.getLong(2))       // at least the same TPs
    assert(b82.getDouble(5) >= b44.getDouble(5))   // recall no worse
    assert(b44.getDouble(4) >= b82.getDouble(4) - 1e-9) // precision no better for b8r2
    rows.foreach(r => assert(r.getLong(2) <= math.min(r.getLong(1),
      r.getLong(3))))
  }

  test("natural sort: numeric runs order numerically") {
    val rows = q("q_fn_natural_sort").collect()
    assert(rows.nonEmpty)
    // ranks are 1..n in emitted order
    assert(rows.map(_.getLong(3)).toSeq == (1L to rows.length).toSeq)
    // the padded key preserves non-digit ordering and pads digits to 8
    rows.foreach { r =>
      val key = r.getString(2)
      "\\d+".r.findAllIn(key).foreach(run => assert(run.length >= 8))
    }
  }
}
