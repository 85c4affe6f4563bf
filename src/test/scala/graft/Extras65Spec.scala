package graft

class Extras65Spec extends QuerySuiteBase {
  Seq("q_evt_hazard", "q_dq_drift_ks", "q_evt_time_to_nth")
    .foreach(checkDeclared(_))

  test("hazard: at-risk monotone decreasing; cum hazard monotone increasing") {
    val rows = q("q_evt_hazard").collect()
    val risks = rows.map(_.getLong(3))
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getLong(5))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    // h_ppm = d_events*1e6 div n_risk exactly
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) * 1000000L / r.getLong(3))
    }
  }

  test("drift ks: D in [0,1]; halves partition the table") {
    val r = q("q_dq_drift_ks").head()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(r.getLong(0) + r.getLong(1) == total)
    val dstat = r.getDouble(3)
    assert(dstat >= 0.0 && dstat <= 1.0)
  }

  test("time to nth: order statistics are ordered") {
    val r = q("q_evt_time_to_nth").head()
    assert(r.getLong(0) > 0)
    val (mn, p50, p90, mx) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(mn <= p50 && p50 <= p90 && p90 <= mx)
  }
}
