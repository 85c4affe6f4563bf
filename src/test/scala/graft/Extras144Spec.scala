package graft

import org.apache.spark.sql.functions._

class Extras144Spec extends QuerySuiteBase {
  Seq("q_fn_string4", "q_sql_unpivot", "q_dq_temporal_order",
    "q_evt_new_vs_returning").foreach(checkDeclared(_))

  test("string4: translate preserves length, repeat = 3x left(2)") {
    val r = q("q_fn_string4").head()
    val rawLen = Tables.part(spark, sf)
      .agg(sum(length(col("p_name")).cast("long"))).head().getLong(0)
    assert(r.getLong(1) == rawLen)           // translate is 1:1
    assert(r.getLong(3) == r.getLong(0) * 6) // repeat(left(2), 3) = 6 chars
  }

  test("unpivot: melted counts total to the order count") {
    val rows = q("q_sql_unpivot").collect()
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("f_cnt", "o_cnt", "p_cnt"))
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  test("temporal order: rates in [0,1], lines total to the join size") {
    val rows = q("q_dq_temporal_order").collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("new vs returning: n_new totals to distinct customers, shares valid") {
    val rows = q("q_evt_new_vs_returning").collect()
    val nNew = rows.map(_.getLong(3)).sum
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(nNew == nCust)
    rows.foreach(r => assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0))
  }
}
