package graft

import org.apache.spark.sql.functions._

class Extras85Spec extends QuerySuiteBase {
  Seq("q_agg_dixon_q", "q_ts_runs_updown", "q_graph_ktruss",
    "q_llm_zipf_source", "q_fn_base64").foreach(checkDeclared(_))

  test("dixon q: ratios recomputed from the sorted nation sample") {
    val r = q("q_agg_dixon_q").head()
    val rev = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long"))
        .as("cents"))
      .collect().map(_.getLong(1)).sorted
    val n = rev.length
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == rev.head && r.getLong(2) == rev.last)
    val range = (rev.last - rev.head).toDouble
    assert(math.abs(r.getDouble(4) - (rev(1) - rev(0)) / range) < 1e-5)
    assert(math.abs(r.getDouble(5) - (rev(n - 1) - rev(n - 2)) / range)
      < 1e-5)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

  test("runs up/down: run count recomputed from the daily series") {
    val r = q("q_ts_runs_updown").head()
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .orderBy("dt").collect().map(_.getLong(1))
    val moves = daily.sliding(2).map(p => p(1) - p(0)).filter(_ != 0L)
      .map(_ > 0L).toArray
    val runs = 1 + moves.sliding(2).count(p => p.length == 2
      && p(0) != p(1))
    assert(r.getLong(0) == moves.length)
    assert(r.getLong(1) == moves.count(identity))
    assert(r.getLong(2) == runs)
    assert(!r.getDouble(3).isNaN)
  }

  test("k-truss: counts non-increasing, fixed point reached, round 0 " +
      "is the full edge set") {
    val rows = q("q_graph_ktruss").collect()
    assert(rows.length == 4)
    val counts = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(counts.sliding(2).forall(p => p(1) <= p(0)))
    // converged on testdata: last two peel rounds agree
    assert(counts(2) == counts(3))
    val v = Tables.events(spark, sf)
      .where(pmod(col("user_id"), lit(7L)) === 0)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    val full = v.as("x").join(v.as("y"),
        col("x.h") === col("y.h") && col("x.t") === col("y.t")
          && col("x.u") < col("y.u"))
      .select(col("x.u").as("a"), col("y.u").as("b"))
      .distinct().count()
    assert(counts(0) == full)
  }

  test("zipf per source: slopes negative, ranks bounded by 50") {
    val rows = q("q_llm_zipf_source").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 50)
      assert(r.getDouble(2) < 0.0)
    }
  }

  test("base64: hex is 2x bytes, all docs round-trip, expansion in " +
      "[4/3, 1.5)") {
    val rows = q("q_fn_base64").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) == 2 * r.getLong(2))
      assert(r.getLong(5) == r.getLong(1))
      val exp = r.getDouble(6)
      assert(exp >= 4.0 / 3.0 - 1e-9 && exp < 1.5)
    }
  }
}
