package graft

import org.apache.spark.sql.functions._

class Extras53Spec extends QuerySuiteBase {
  Seq("q_ts_leadlag_regr", "q_graph_rich_club",
    "q_llm_dedup_threshold_sweep")
    .foreach(checkDeclared(_))

  test("leadlag: r2 in [0,1]; day pairs bounded by the event span") {
    val r = q("q_ts_leadlag_regr").head()
    val r2 = r.getDouble(2)
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    val eventDays = Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    assert(r.getLong(0) <= eventDays)
  }

  test("rich club: phi in [0,1] when defined; edge bound holds") {
    val r = q("q_graph_rich_club").head()
    val (k, nRich, eRich) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(k >= 1)
    if (nRich >= 2) {
      assert(eRich <= nRich * (nRich - 1) / 2)
      val phi = r.getDouble(3)
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9)
    } else {
      assert(r.isNullAt(3)) // degenerate club: phi undefined by contract
    }
  }

  test("threshold sweep: monotone non-increasing; 0.6 row matches near-dup") {
    val rows = q("q_llm_dedup_threshold_sweep").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(5L, 6L, 7L, 8L, 9L))
    val ns = rows.map(_.getLong(2))
    ns.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    val near = q("q_llm_dedup_near").count()
    assert(rows.find(_.getLong(1) == 6L).get.getLong(2) == near)
  }
}
