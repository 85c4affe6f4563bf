package graft

import org.apache.spark.sql.functions._

class Extras19Spec extends QuerySuiteBase {
  Seq("q_evt_markov", "q_agg_chi2", "q_agg_hhi", "q_misc_skyline",
    "q_ts_vwap", "q_stream_live_louter").foreach(checkDeclared(_))

  test("markov: probabilities sum to 1 per source state") {
    val r = q("q_evt_markov")
    val sums = r.groupBy("src").agg(sum(col("p")).as("ps")).collect()
    sums.foreach(row =>
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9, row.toString))
  }

  test("chi2: totals consistent, contributions non-negative") {
    val rows = q("q_agg_chi2").collect()
    val n = rows.head.getLong(5)
    assert(rows.map(_.getLong(2)).sum == n) // Σ observed = N
    rows.foreach { r =>
      assert(r.getDouble(7) >= 0.0) // contrib
      assert(r.getDouble(6) > 0.0)  // expected
    }
    // row totals: per status, Σ o == rt
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.map(_.getLong(2)).sum == g.head.getLong(3))
    }
  }

  test("hhi: bp2 within [tot/n bound, 10^8], shares near 10^4") {
    q("q_agg_hhi").collect().foreach { r =>
      val hhi = r.getLong(3)
      // perfectly even split floor(10^4/n)^2*n <= hhi <= monopoly 10^8
      assert(hhi > 0 && hhi <= 100000000L, r.toString)
    }
  }

  test("skyline: no point dominates another on the frontier") {
    val pts = q("q_misc_skyline").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for (p <- pts; qq <- pts if p != qq)
      assert(!(qq._1 <= p._1 && qq._2 >= p._2
          && (qq._1 < p._1 || qq._2 > p._2)),
        s"$qq dominates $p")
    // paying more must buy strictly more size along the frontier
    val sorted = pts.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, s1), (_, s2)) => assert(s2 > s1)
      case _ =>
    }
  }

  test("vwap: within per-day [min,max] unit price band") {
    val li = Tables.lineitem(spark, sf)
      .groupBy(to_date(col("l_shipdate")).as("dt"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("lo"),
        max(col("l_extendedprice") / col("l_quantity")).as("hi"))
    val j = q("q_ts_vwap").join(li, "dt")
      .where(col("vwap") < col("lo") - lit(0.01)
        || col("vwap") > col("hi") + lit(0.01))
    assert(j.count() == 0)
  }

  test("louter: matched rows equal the inner ssjoin; nulls respect cutoff") {
    val lo = q("q_stream_live_louter")
    val inner = q("q_stream_live_ssjoin")
    assert(fingerprint(lo.where(col("c_id").isNotNull)
        .select("p_id", "p_user", "c_id", "p_us", "c_us")
        .orderBy("p_id", "c_id"))
      == fingerprint(inner.orderBy("p_id", "c_id")))
    val mx = Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts").cast("timestamp")))).head.getLong(0)
    assert(lo.where(col("c_id").isNull
      && col("p_us") >= mx - 5400000000L).count() == 0)
    // and at least one never-matched purchase actually surfaced
    assert(lo.where(col("c_id").isNull).count() > 0)
  }
}
