package graft

import org.apache.spark.sql.functions._

class Extras11Spec extends QuerySuiteBase {
  Seq("q_merge_upsert", "q_scd2", "q_ts_sessionize", "q_ts_acf",
    "q_ts_interp", "q_graph_degree", "q_graph_bfs",
    "q_evt_attribution").foreach(checkDeclared(_))

  test("merge_upsert: action partition is exact and lossless") {
    val o = Tables.orders(spark, sf)
    val nTgt = o.where(expr("o_orderkey % 5 != 0")).count()
    val nSrc = o.where(expr("o_orderkey % 2 = 0")).count()
    val byAction = q("q_merge_upsert").groupBy("action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts are source-only keys (multiples of 2 that are also %5==0,
    // i.e. o_orderkey % 10 == 0); updates are source ∩ target
    val nIns = o.where(expr("o_orderkey % 10 = 0")).count()
    assert(byAction("insert") == nIns)
    assert(byAction("update") == nSrc - nIns)
    assert(byAction("keep") == nTgt - (nSrc - nIns))
    // updated rows carry exactly +100.00 over the original price
    val bumped = q("q_merge_upsert").where(col("action") === "update")
      .join(o, "o_orderkey")
      .where(abs(col("totalprice") - col("o_totalprice") - 100.0) > 1e-6)
      .count()
    assert(bumped == 0, s"$bumped updated rows without the +100 delta")
  }

  test("scd2 islands partition each user's event stream exactly") {
    // island n_events sum == events; within a user, islands do not
    // overlap in time (valid_from > previous valid_to)
    val r = q("q_scd2")
    val total = r.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("seq")
    val overlaps = r
      .withColumn("prev_to", lag(col("to_us"), 1).over(w))
      .where(col("prev_to").isNotNull && col("from_us") <= col("prev_to"))
      .count()
    assert(overlaps == 0, s"$overlaps overlapping SCD2 intervals")
  }

  test("sessionize: intra-session gaps <= 30min, session starts > 30min apart") {
    val s = q("q_ts_sessionize")
    // sessions cover all events
    assert(s.agg(sum("n_events")).head().getLong(0)
      == Tables.events(spark, sf).count())
    // per user, next session starts strictly more than 30min after the
    // previous session's end
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_seq")
    val bad = s.withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .where(col("prev_end").isNotNull
        && col("start_us") - col("prev_end") <= 1800000000L)
      .count()
    assert(bad == 0, s"$bad session boundaries violate the 30min gap rule")
  }

  test("acf values are correlations (|acf| <= 1) at 3 lags") {
    val r = q("q_ts_acf").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(r.forall(x => math.abs(x.getDouble(2)) <= 1.0))
  }

  test("interp: calendar is dense and forward-fill carries observed values") {
    val r = q("q_ts_interp")
    val n = r.count()
    val span = r.agg((datediff(max("dt"), min("dt")) + 1).as("d"))
      .head().getInt(0)
    assert(n == span, s"calendar not dense: $n rows over $span days")
    // filled rows only ever repeat the previous value — the set of
    // distinct rev_ff values equals the set of observed (unfilled) values
    val observed = r.where(!col("filled")).select("rev_ff")
      .distinct().collect().map(_.getDouble(0)).toSet
    val all = r.select("rev_ff").distinct().collect()
      .map(_.getDouble(0)).toSet
    assert(all == observed, "forward-fill invented a value")
  }

  test("bfs hops agree with degree reachability on the shared graph") {
    val bfs = q("q_graph_bfs").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(bfs.nonEmpty)
    // seeds are exactly the %35 nodes at hop 0
    bfs.foreach { case (u, h) =>
      if (u % 35 == 0) assert(h == 0, s"seed $u at hop $h")
      else assert(h >= 1 && h <= 3, s"node $u at hop $h")
    }
    // graph degree histogram mass equals the node count of the edge set
    val nNodes = q("q_graph_degree").agg(sum("n_nodes")).head().getLong(0)
    assert(bfs.length <= nNodes, "BFS reached more nodes than exist")
  }

  test("attribution: every purchase is credited exactly once") {
    val credited = q("q_evt_attribution").agg(sum("n")).head().getLong(0)
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(credited == purchases)
  }
}
