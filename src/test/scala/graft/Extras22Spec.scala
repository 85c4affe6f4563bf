package graft

import org.apache.spark.sql.functions._

class Extras22Spec extends QuerySuiteBase {
  Seq("q_agg_share_hierarchy", "q_ts_changepoint", "q_llm_vocab_coverage",
    "q_graph_modularity", "q_source_csv_corrupt", "q_evt_ab_test")
    .foreach(checkDeclared(_))

  test("hierarchy shares: region shares sum to 1 within each region") {
    val rows = q("q_agg_share_hierarchy").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("changepoint: sse no greater than any sampled candidate") {
    val best = q("q_ts_changepoint").head
    val sse = best.getDouble(1)
    // recompute the single-segment (no-break) SSE — the two-segment
    // optimum can never exceed it
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("y"))
    val stats = daily.agg(count(lit(1)).as("n"),
      sum(col("y")).as("s1"),
      sum(col("y").cast("decimal(38,0)") * col("y").cast("decimal(38,0)"))
        .as("s2")).head
    val n = stats.getLong(0).toDouble
    val s1 = stats.getLong(1).toDouble
    val s2 = stats.getDecimal(2).doubleValue()
    assert(sse <= s2 - s1 * s1 / n + 1e-6)
  }

  test("vocab coverage: monotone in k, within (0,1]") {
    val rows = q("q_llm_vocab_coverage").collect()
    // tiny SFs may have a vocabulary under 100 (or 50) entries; the
    // emitted ranks are whatever sampling points exist
    assert(Set(10L, 50L, 100L).intersect(rows.map(_.getLong(0)).toSet)
      == rows.map(_.getLong(0)).toSet && rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getDouble(3) >= a.getDouble(3))
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
  }

  test("modularity: degree masses sum to 2m, contributions bounded") {
    val rows = q("q_graph_modularity").collect()
    // Σ d_c = 2m (handshake), so it must be even, and intra-edge totals
    // can never exceed m; within one component l_c <= d_c/2 as well
    val sumD = rows.map(_.getLong(2)).sum
    assert(sumD % 2 == 0)
    assert(rows.map(_.getLong(1)).sum <= sumD / 2)
    rows.foreach { r =>
      assert(2 * r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) <= 1.0 && r.getDouble(3) >= -1.0)
    }
  }

  test("csv corrupt: exactly 7 bad rows, cents total preserved") {
    val r = q("q_source_csv_corrupt").head
    val nOrders = Tables.orders(spark, sf).count()
    assert(r.getLong(0) == nOrders + 7)
    assert(r.getLong(1) == 7)
    val cents = Tables.orders(spark, sf)
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))).head.getLong(0)
    assert(r.getLong(2) == cents)
  }

  test("ab test: arms partition the users, z finite") {
    val r = q("q_evt_ab_test").head
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(r.getLong(0) + r.getLong(2) == users)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    if (!r.isNullAt(4)) // NULL iff the pooled conversion is 0% or 100%
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite)
  }
}
