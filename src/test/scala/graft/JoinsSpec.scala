package graft

import org.apache.spark.sql.functions._

class JoinsSpec extends QuerySuiteBase {
  Seq("q_join_inner_hash", "q_join_sortmerge", "q_join_broadcast",
    "q_join_left", "q_join_full", "q_join_semi", "q_join_anti",
    "q_join_theta_range", "q_join_asof", "q_join_interval",
    "q_join_multiway").foreach(checkDeclared(_))

  test("semi + anti partition: with + without big orders = all customers") {
    val all = Tables.customer(spark, sf).count()
    val withO = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).where(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val without = q("q_join_anti").count()
    assert(withO + without == all)
  }

  test("left join preserves every customer exactly once after group") {
    assert(q("q_join_left").count() == Tables.customer(spark, sf).count())
  }

  test("inner join row count equals orders with matching customers") {
    assert(q("q_join_inner_hash").count() == Tables.orders(spark, sf).count())
  }

  test("as-of join: prev click is really the latest click <= purchase ts") {
    // Independent oracle via SQL correlated subquery on a small slice.
    val e = Tables.events(spark, sf)
    e.createOrReplaceTempView("ev")
    val expected = spark.sql(
      """SELECT p.event_id,
                (SELECT max_by(c.event_id, struct(c.ts, c.event_id))
                 FROM ev c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts <= p.ts) AS prev_click_id
         FROM ev p WHERE p.event_type = 'purchase'
         ORDER BY p.event_id""").collect()
    val got = q("q_join_asof").select("event_id", "prev_click_id").collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("broadcast join plan actually broadcasts the part side") {
    val plan = q("q_join_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("theta join: pairs only within the same region, k1 < k2") {
    val bad = q("q_join_theta_range").where(col("k1") >= col("k2")).count()
    assert(bad == 0)
  }
}
