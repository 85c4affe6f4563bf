package graft

class Extras74Spec extends QuerySuiteBase {
  Seq("q_ts_hodges_lehmann", "q_evt_price_elasticity", "q_ts_cusum_squares")
    .foreach(checkDeclared(_))

  test("hodges lehmann: pair count = n(n+1)/2; HL between daily min and max") {
    val r = q("q_ts_hodges_lehmann").head()
    import org.apache.spark.sql.functions._
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate"))).agg(sum(col("o_totalprice")).as("y"))
    val n = daily.count()
    assert(r.getLong(0) == n * (n + 1) / 2)
    val mn = daily.agg(min(col("y"))).head().getDouble(0)
    val mx = daily.agg(max(col("y"))).head().getDouble(0)
    val hl = r.getDouble(2)
    assert(hl >= mn - 1 && hl <= mx + 1)
  }

  test("elasticity: slope finite; R2 in [0,1]") {
    val r = q("q_evt_price_elasticity").head()
    assert(!r.getDouble(1).isNaN)
    val r2 = r.getDouble(2)
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("cusum squares: break inside the series; statistic in [0,1]") {
    val r = q("q_ts_cusum_squares").head()
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(k >= 1 && k <= n)
    val s = r.getDouble(3)
    assert(s >= 0.0 && s <= 1.0)
  }
}
