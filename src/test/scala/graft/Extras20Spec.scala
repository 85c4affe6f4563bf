package graft

import org.apache.spark.sql.functions._

class Extras20Spec extends QuerySuiteBase {
  Seq("q_dq_profile", "q_dq_constraints", "q_agg_itemsets",
    "q_join_nullsafe", "q_win_running_distinct", "q_stream_live_timeout")
    .foreach(checkDeclared(_))

  test("profile: 6 columns, orderkey unique, no lexicographic min/max") {
    val rows = q("q_dq_profile").collect()
    assert(rows.length == 6)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    val n = rows.head.getLong(1)
    assert(byName("o_orderkey").getLong(3) == n) // key is unique
    // native-type min/max: numeric min must be <= max numerically
    val mk = byName("o_orderkey")
    assert(mk.getString(4).toLong <= mk.getString(5).toLong)
    val mp = byName("o_totalprice")
    assert(BigDecimal(mp.getString(4)) <= BigDecimal(mp.getString(5)))
  }

  test("constraints: 4 checks, clean data yields zero violations") {
    val rows = q("q_dq_constraints").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("dup_event_ids",
      "nonpositive_price", "null_user_id", "orphan_orders"))
    rows.foreach(r => assert(r.getLong(1) >= 0))
  }

  test("itemsets: pa < pb, counts descending, <= 20 rows") {
    val rows = q("q_agg_itemsets").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(2) >= y.getLong(2))
      case _ =>
    }
  }

  test("nullsafe: null bucket carries counts from both sides") {
    val rows = q("q_join_nullsafe").collect()
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(!nullRow.isNullAt(1) && !nullRow.isNullAt(2),
      "NULL<=>NULL must match, merging both sides' counts")
    // total of side a equals the orders row count
    val total = rows.filterNot(_.isNullAt(1)).map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  test("running distinct: cumulative is monotone, ends at total users") {
    val rows = q("q_win_running_distinct").collect()
    rows.sliding(2).foreach {
      case Array(x, y) => assert(y.getLong(2) >= x.getLong(2))
      case _ =>
    }
    val totalUsers = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(rows.last.getLong(2) == totalUsers)
    assert(rows.map(_.getLong(1)).sum == totalUsers)
  }

  test("timeout sessions: match the batch gaps-and-islands twin") {
    // independent recomputation: 30-min gaps-and-islands sessions with
    // the same end_us < max - 40min cutoff
    val e = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val mx = e.agg(max(col("us"))).head.getLong(0)
    val twin = e
      .withColumn("brk", when(lag(col("us"), 1).over(w).isNull
        || col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
        .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .where(col("end_us") < mx - 2400000000L)
      .select("user_id", "start_us", "end_us", "n_events")
      .orderBy("user_id", "start_us")
    assert(fingerprint(q("q_stream_live_timeout")) == fingerprint(twin))
  }
}
