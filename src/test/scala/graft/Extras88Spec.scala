package graft

import org.apache.spark.sql.functions._

class Extras88Spec extends QuerySuiteBase {
  Seq("q_evt_rfm", "q_agg_jackknife_ratio", "q_agg_topk_share")
    .foreach(checkDeclared(_))

  test("rfm: cells partition the user base; scores in 1..5") {
    val rows = q("q_evt_rfm").collect()
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == users)
    rows.foreach { r =>
      (0 to 2).foreach(i => assert(r.getLong(i) >= 1 && r.getLong(i) <= 5))
    }
  }

  test("jackknife: estimate close to plain ratio; se positive") {
    val r = q("q_agg_jackknife_ratio").head()
    val ratio = r.getDouble(1)
    assert(math.abs(r.getDouble(2) - ratio) / ratio < 0.01)
    assert(r.getDouble(3) > 0)
  }

  test("topk share: cr4 <= cr8 <= 1 and matches scratch") {
    val r = q("q_agg_topk_share").head()
    val per = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey"))
      .agg(sum((Det.dec(col("l_extendedprice")) * 100).cast("long")))
      .collect().map(_.getLong(1)).sortBy(-_)
    val tot = per.map(BigInt(_)).sum
    val cr4 = (BigDecimal(per.take(4).map(BigInt(_)).sum) /
      BigDecimal(tot)).toDouble
    assert(math.abs(r.getDouble(1) - cr4) < 1e-6)
    assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= 1.0)
  }
}
