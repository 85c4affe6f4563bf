package graft

import org.apache.spark.sql.functions._

class Extras60Spec extends QuerySuiteBase {
  Seq("q_evt_funnel_windowed", "q_agg_share_shift", "q_evt_dwell_time")
    .foreach(checkDeclared(_))

  test("windowed funnel: monotone step counts; conversion consistent") {
    val r = q("q_evt_funnel_windowed").head()
    val (n, s1, s2, s3) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(s1 <= n && s2 <= s1 && s3 <= s2)
    assert(math.abs(r.getDouble(4) - s3.toDouble / s1) < 1e-6)
  }

  test("share shift: halves sum to 1e6 each; shifts sum to ~0") {
    val rows = q("q_agg_share_shift").collect()
    assert(rows.length == 5)
    val s1 = rows.map(_.getLong(3)).sum
    val s2 = rows.map(_.getLong(4)).sum
    // integer division truncation leaves < n_groups micro-units
    assert(s1 > 1000000L - 5 && s1 <= 1000000L)
    assert(s2 > 1000000L - 5 && s2 <= 1000000L)
    rows.foreach(r =>
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3)))
  }

  test("dwell time: gap accounting matches the global inter-event count") {
    val rows = q("q_evt_dwell_time").collect()
    assert(rows.nonEmpty)
    val totalGaps = rows.map(_.getLong(1)).sum
    val events = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id")
      .distinct().count()
    assert(totalGaps == events - users) // one gap per event except each user's last
    rows.foreach(r => assert(r.getDouble(4) >= 0))
  }
}
