package graft

import org.apache.spark.sql.functions._

class Extras49Spec extends QuerySuiteBase {
  Seq("q_evt_attribution_ushape", "q_llm_prefix_dup", "q_ts_periodogram",
    "q_llm_dup_matrix")
    .foreach(checkDeclared(_))

  test("ushape: total credit equals converting users exactly") {
    val rows = q("q_evt_attribution_ushape").collect()
    assert(rows.nonEmpty)
    val totalMicro = rows.map(_.getLong(2)).sum
    // conversions with at least one pre-purchase touch
    val first = q("q_evt_attribution_first").collect()
    val converters = first.map(_.getLong(1)).sum
    assert(totalMicro == converters * 1000000L,
      s"credit $totalMicro != $converters conversions")
    assert(!rows.map(_.getString(0)).contains("purchase"))
  }

  test("prefix dup: families have >= 2 docs; hash recount on the top family") {
    val rows = q("q_llm_prefix_dup").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 2))
    val ns = rows.map(_.getLong(1))
    ns.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }

  test("periodogram: weekly amplitude present; amplitude recomputes") {
    val rows = q("q_ts_periodogram").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(7, 30))
    rows.foreach { r =>
      val (n, a, b) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val amp = math.sqrt(a.toDouble * a + b.toDouble * b) / n / 1e6
      assert(math.abs(r.getDouble(4) - amp) < 1e-4)
    }
  }

  test("dup matrix: pair totals reconcile with the near-dup pair count") {
    val m = q("q_llm_dup_matrix").collect()
    val near = q("q_llm_dedup_near").count()
    assert(m.map(_.getLong(2)).sum == near)
    m.foreach(r => assert(r.getString(0) <= r.getString(1)))
  }
}
