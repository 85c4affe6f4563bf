package graft

import org.apache.spark.sql.functions._

class Extras93Spec extends QuerySuiteBase {
  Seq("q_evt_interpurchase_cv", "q_win_skew_rolling",
    "q_ts_drawdown_duration").foreach(checkDeclared(_))

  test("interpurchase cv: buckets partition the eligible users") {
    val rows = q("q_evt_interpurchase_cv").collect()
    val eligible = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .where(col("n") >= 3).count()
    assert(rows.map(_.getLong(1)).sum == eligible)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("rolling skew: one row per day from day 28; values finite") {
    val rows = q("q_win_skew_rolling").collect()
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(rows.length == days - 27)
    rows.foreach(r => assert(!r.getDouble(1).isNaN))
  }

  test("rolling skew: first emitted value matches a scratch computation") {
    val y = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .orderBy("dt").limit(28).collect().map(_.getLong(1).toDouble)
    val n = y.length
    val mu = y.sum / n
    val m2 = y.map(v => (v - mu) * (v - mu)).sum / n
    val m3 = y.map(v => (v - mu) * (v - mu) * (v - mu)).sum / n
    val skew = m3 / math.pow(m2, 1.5)
    val first = q("q_win_skew_rolling").orderBy("dt").head()
    assert(math.abs(first.getDouble(1) - skew) < 1e-4)
  }

  test("drawdown duration: island is genuinely underwater") {
    val r = q("q_ts_drawdown_duration").head()
    val dur = r.getLong(0)
    assert(dur >= 1)
    val days = r.getDate(2).toLocalDate.toEpochDay -
      r.getDate(1).toLocalDate.toEpochDay + 1
    assert(days >= dur)
  }
}
