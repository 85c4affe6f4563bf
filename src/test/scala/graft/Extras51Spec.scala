package graft

import org.apache.spark.sql.functions._

class Extras51Spec extends QuerySuiteBase {
  Seq("q_evt_dispersion", "q_ts_ljung_box", "q_evt_entropy_trend",
    "q_llm_len_ci", "q_scan_merge_on_read")
    .foreach(checkDeclared(_))

  test("dispersion: VMR recomputes from the exact moments") {
    val r = q("q_evt_dispersion").head()
    val (n, sx, sxx) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val vmr = (n.toDouble * sxx - sx.toDouble * sx) / (n.toDouble * sx)
    assert(math.abs(r.getDouble(3) - vmr) < 1e-5)
    assert(vmr > 0)
  }

  test("ljung box: Q non-negative and consistent with the r's") {
    val r = q("q_ts_ljung_box").head()
    val n = r.getLong(0).toDouble
    val (r1, r2, r3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val q0 = n * (n + 2) *
      (r1 * r1 / (n - 1) + r2 * r2 / (n - 2) + r3 * r3 / (n - 3))
    assert(r.getDouble(4) >= 0)
    assert(math.abs(r.getDouble(4) - q0) < 1e-3)
  }

  test("entropy trend: weekly deltas telescope") {
    val rows = q("q_evt_entropy_trend").collect()
    assert(rows.nonEmpty)
    val e = rows.map(_.getLong(2))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(4) == b.getLong(2) - a.getLong(2))
      case _ =>
    }
    assert(rows.head.isNullAt(4)) // first week has no predecessor
    e.foreach(v => assert(v >= 0))
  }

  test("len ci: interval brackets the mean; moments recount") {
    val rows = q("q_llm_len_ci").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, m, hi) = (r.getDouble(6), r.getDouble(4), r.getDouble(7))
      assert(lo <= m && m <= hi)
    }
    val direct = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("l"))
      .agg(sum(col("l"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == direct)
  }

  test("merge on read: row and delta accounting reconcile") {
    val r = q("q_scan_merge_on_read").head()
    val orders = Tables.orders(spark, sf)
    val base = orders.count()
    val inserts = orders.where(expr("o_orderkey % 1000 = 1")).count()
    val updates = orders.where(expr("o_orderkey % 10 = 0")).count()
    assert(r.getLong(0) == base + inserts)        // upserts add only inserts
    assert(r.getLong(1) == updates + inserts)     // delta-sourced rows
  }
}
