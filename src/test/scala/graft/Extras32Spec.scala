package graft

import org.apache.spark.sql.functions._

class Extras32Spec extends QuerySuiteBase {
  Seq("q_ts_m4", "q_llm_zipf", "q_sink_dynamic_overwrite",
    "q_evt_mau_rolling", "q_evt_ltv_cohort")
    .foreach(checkDeclared(_))

  test("m4: envelope invariants hold per bucket") {
    val rows = q("q_ts_m4").collect()
    assert(rows.map(_.getString(0)).distinct.length == 5)
    rows.foreach { r =>
      val (first, last, mn, mx) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(mn <= mx)
      assert(first >= mn && first <= mx)
      assert(last >= mn && last <= mx)
      assert(r.getLong(1) >= 0 && r.getLong(1) < 16)
    }
    // downsampling: per series at most 16 buckets
    rows.groupBy(_.getString(0)).values
      .foreach(g => assert(g.length <= 16))
  }

  test("zipf: 25 ranks, counts non-increasing, shares consistent") {
    val rows = q("q_llm_zipf").collect()
    assert(rows.length == 25)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 25))
    val counts = rows.map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
    val total = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w")).count()
    rows.foreach(r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / total.toDouble))
  }

  test("dynamic overwrite: only the P partition was repriced") {
    val rows = q("q_sink_dynamic_overwrite").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows("F") == base("F"))
    assert(rows("O") == base("O"))
    assert(rows("P")._1 == base("P")._1)
    assert(rows("P")._2 == base("P")._2 * 2)
  }

  test("mau rolling: trailing window dominates the daily DAU") {
    val mau = q("q_evt_mau_rolling").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val dau = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    dau.foreach { case (d, n) => assert(mau(d) >= n) }
    // window accumulates: last day's MAU >= first day's
    val sorted = mau.toSeq.sortBy(_._1)
    assert(sorted.last._2 >= sorted.head._2)
  }

  test("ltv cohort: conversions bounded by signups, cents only from converters") {
    val rows = q("q_evt_ltv_cohort").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(2) == 0) assert(r.getLong(3) == 0)
      assert(r.getDouble(4) ==
        r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }
}
