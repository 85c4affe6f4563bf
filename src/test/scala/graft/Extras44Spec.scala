package graft

import org.apache.spark.sql.functions._

class Extras44Spec extends QuerySuiteBase {
  Seq("q_ts_seasonal_strength", "q_dq_schema_fingerprint", "q_ts_lttb",
    "q_agg_gtest", "q_evt_power_law")
    .foreach(checkDeclared(_))

  test("seasonal strength: residual variance never exceeds series variance") {
    val r = q("q_ts_seasonal_strength").head()
    val (vy, vr, st) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(vy > 0 && vr >= 0)
    assert(vr <= vy + 1e-6)       // removing a fitted component cannot add variance
    assert(st >= -1e-6 && st <= 1.0)
    assert(math.abs(st - (1.0 - vr / vy)) < 1e-5)
  }

  test("schema fingerprint: covers all tables, matches live schemas") {
    val rows = q("q_dq_schema_fingerprint").collect()
    assert(rows.map(_.getString(0)).toSet == Tables.names.toSet)
    rows.foreach { r =>
      val live = Tables.load(spark, sf, r.getString(0))
        .schema.fieldNames.sorted
      assert(r.getLong(1) == live.length)
      assert(r.getString(2) == live.mkString(","))
      assert(r.getString(3).length == 16)
    }
  }

  test("lttb: one point per interior bucket; selected point maximizes area") {
    val rows = q("q_ts_lttb").collect()
    assert(rows.nonEmpty)
    val wids = rows.map(_.getLong(0))
    assert(wids.distinct.length == wids.length)
    // interior buckets only: neither the first nor the last wid appears
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    val nBuckets = (days + 15) / 16
    assert(!wids.contains(0L) && !wids.contains(nBuckets - 1))
    rows.foreach(r => assert(r.getLong(3) >= 0))
  }

  test("g-test: agrees with chi-squared to first order on the same table") {
    val g = q("q_agg_gtest").head()
    val chi = q("q_agg_cramers_v").head()
    assert(g.getLong(0) == chi.getLong(0))          // same n
    assert(g.getLong(2) == chi.getLong(2))          // same dof
    val gv = g.getDouble(3)
    val chiv = chi.getLong(1) / 1e6
    assert(gv >= 0)
    // G and chi2 are asymptotically equal; same order of magnitude here
    assert(gv < 4 * chiv + 10 && chiv < 4 * gv + 10)
  }

  test("power law: alpha above 1; tail count matches a recount") {
    val r = q("q_evt_power_law").head()
    val (n, alpha) = (r.getLong(0), r.getDouble(2))
    val recount = Tables.events(spark, sf)
      .groupBy("user_id").count().where(col("count") >= 5).count()
    assert(n == recount && n > 0)
    assert(alpha > 1.0 && alpha < 10.0)
  }
}
