package graft

import org.apache.spark.sql.functions._

class Extras24Spec extends QuerySuiteBase {
  Seq("q_agg_anova", "q_evt_dau_wau", "q_ts_gaps", "q_agg_trimmed_mean",
    "q_ts_forecast_err", "q_evt_inter_event")
    .foreach(checkDeclared(_))

  test("anova: group sizes partition lineitem, F >= 0, eta_sq in [0,1)") {
    val r = q("q_agg_anova").head
    val total = Tables.lineitem(spark, sf).count()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) == total)
    assert(r.getDouble(3) >= 0)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) < 1.0)
  }

  test("dau/wau: dau <= wau, stickiness in (0,1]") {
    val rows = q("q_evt_dau_wau").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    }
  }

  test("gaps: missing days + active days = calendar span per customer") {
    val rows = q("q_ts_gaps").collect()
    assert(rows.nonEmpty)
    val spans = Tables.orders(spark, sf)
      .select(col("o_custkey").as("c"),
        to_date(col("o_orderdate")).as("dt")).distinct()
      .groupBy("c")
      .agg(count(lit(1)).as("active"),
        (datediff(max(col("dt")), min(col("dt"))) + 1).as("span"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    rows.foreach { r =>
      val (active, span) = spans(r.getLong(0))
      assert(active + r.getLong(2) == span) // active + missing = span
      assert(r.getInt(3) <= r.getLong(2))   // longest gap <= total missing
    }
  }

  test("trimmed mean: lies within the untrimmed min/max, trims 2k rows") {
    val rows = q("q_agg_trimmed_mean").collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("A", "N", "R"))
    rows.foreach { r =>
      val n = r.getLong(1)
      val k = r.getLong(2)
      assert(k == n / 20)
      assert(r.getDouble(3) > 0)
    }
  }

  test("forecast error: mae >= |bias|, wape positive and finite") {
    val r = q("q_ts_forecast_err").head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) >= math.abs(r.getDouble(2)))
    assert(r.getDouble(3) > 0 && !r.getDouble(3).isInfinite)
  }

  test("inter-event: med <= p90 <= max per type") {
    val rows = q("q_evt_inter_event").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) <= r.getDouble(3))
      assert(r.getDouble(3) <= r.getLong(4).toDouble)
    }
  }
}
