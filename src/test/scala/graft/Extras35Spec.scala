package graft

import org.apache.spark.sql.functions._

class Extras35Spec extends QuerySuiteBase {
  Seq("q_llm_mix_weights", "q_evt_lifecycle", "q_llm_len_quantiles",
    "q_evt_session_hist", "q_graph_two_hop", "q_sql_pivot")
    .foreach(checkDeclared(_))

  test("mix weights: shares sum to ~1, temperature flattens the mix") {
    val rows = q("q_llm_mix_weights").collect()
    val mix = rows.map(_.getDouble(4))
    val nat = rows.map(_.getDouble(5))
    assert(math.abs(mix.sum - 1.0) < 1e-9)
    assert(math.abs(nat.sum - 1.0) < 1e-9)
    // n^0.7 compresses the range: the mix max/min ratio must be strictly
    // smaller than the natural one (unless the corpus is perfectly flat)
    if (nat.max / nat.min > 1.0001)
      assert(mix.max / mix.min < nat.max / nat.min)
  }

  test("lifecycle: active decomposes as new + retained + resurrected") {
    val rows = q("q_evt_lifecycle").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"wk ${r.getLong(0)}: active != new+retained+resurrected")
      assert(r.getLong(5) >= 0) // dormant
    }
    // first week: everyone is new
    val f = rows.minBy(_.getLong(0))
    assert(f.getLong(1) == f.getLong(2))
  }

  test("length quantiles: monotone p25<=p50<=p75<=p95, real data values") {
    val rows = q("q_llm_len_quantiles").collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, sf).select(col("n_chars"))
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (p25, p50, p75, p95) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
      assert(Seq(p25, p50, p75, p95).forall(lens.contains))
    }
  }

  test("session histogram: sessions and events reconcile with raw totals") {
    val rows = q("q_evt_session_hist").collect()
    val events = rows.map(_.getLong(2)).sum
    assert(events == Tables.events(spark, sf).count())
    assert(rows.map(_.getLong(1)).sum >= 1)
  }

  test("two-hop: no self, no direct neighbors, bounded by component") {
    // independent rebuild of the query's co-occurrence graph (user%3)
    val v = Tables.events(spark, sf)
      .where(pmod(col("user_id"), lit(3L)) === 0)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    val und = v.as("x").join(v.as("y"),
        col("x.h") === col("y.h") && col("x.t") === col("y.t")
          && col("x.u") < col("y.u"))
      .select(col("x.u").as("a"), col("y.u").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v2) => k -> v2.map(_._2).toSet }
    val all = direct.keySet
    q("q_graph_two_hop").collect().foreach { r =>
      val (u, n) = (r.getLong(0), r.getLong(1))
      assert(n >= 1)
      // reach excludes self and direct neighbors
      assert(n <= all.size - 1 - direct.getOrElse(u, Set.empty).size)
      assert(!direct.getOrElse(u, Set.empty).isEmpty || n == 0)
    }
  }

  test("sql pivot: per-priority counts reconcile with plain group-by") {
    val rows = q("q_sql_pivot").collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(3) + r.getLong(5)).sum
    assert(total == Tables.orders(spark, sf).count())
  }
}
