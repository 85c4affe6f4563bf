package graft

import org.apache.spark.sql.functions._

class Extras18Spec extends QuerySuiteBase {
  Seq("q_join_asof_tolerance", "q_graph_cluster_coeff", "q_agg_rfm",
    "q_ts_benford", "q_set_symdiff").foreach(checkDeclared(_))

  test("asof tolerance: matches are a subset of the unbounded asof") {
    val tol = q("q_join_asof_tolerance")
    val unb = q("q_join_asof")
    // every tolerance match equals the unbounded match for that purchase
    // (tolerance can only null out, never change, a match)
    val j = tol.as("t").join(unb.as("u"), col("t.event_id") === col("u.event_id"))
      .where(col("t.prev_click_id").isNotNull
        && col("t.prev_click_id") =!= col("u.prev_click_id"))
    assert(j.count() == 0)
    // and the tolerance must actually null out at least one stale match
    val nulledCount = tol.where(col("prev_click_id").isNull).count()
    val unbNull = unb.where(col("prev_click_id").isNull).count()
    assert(nulledCount >= unbNull)
  }

  test("clustering coefficient: cc in [0,1], triangle total consistent") {
    val r = q("q_graph_cluster_coeff")
    assert(r.where(col("cc") < 0 || col("cc") > 1).count() == 0)
    // sum of per-node triangle counts = 3 × total triangles
    val perNode = r.agg(sum(col("n_tri"))).head().getLong(0)
    val total = q("q_graph_triangles").head().getLong(1)
    assert(perNode == 3 * total, s"$perNode != 3*$total")
  }

  test("rfm: segment digits in 1..5, customer total preserved") {
    val r = q("q_agg_rfm").collect()
    r.foreach { row =>
      val seg = row.getLong(0)
      assert(seg >= 111 && seg <= 555, s"segment $seg out of range")
      Seq(seg / 100, (seg / 10) % 10, seg % 10).foreach(dg =>
        assert(dg >= 1 && dg <= 5))
    }
    val total = r.map(_.getLong(1)).sum
    val nCust = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(total == nCust)
  }

  test("benford: 9 digit rows, shares sum to 1, digit-1 most frequent") {
    val rows = q("q_ts_benford").collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
  }

  test("symdiff counts match |a-b| per key") {
    val ev = Tables.events(spark, sf)
    def cnt(t: String) = ev.where(col("event_type") === t)
      .groupBy("user_id").agg(count(lit(1)).as(s"n_$t"))
    val exp = cnt("view").join(cnt("click"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        abs(coalesce(col("n_view"), lit(0L))
          - coalesce(col("n_click"), lit(0L))).as("n_sym"))
      .where(col("n_sym") > 0).orderBy("user_id")
    assert(fingerprint(q("q_set_symdiff")) == fingerprint(exp))
  }
}
