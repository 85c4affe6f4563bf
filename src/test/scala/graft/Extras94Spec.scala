package graft

import org.apache.spark.sql.functions._

class Extras94Spec extends QuerySuiteBase {
  Seq("q_ts_adf_lag1", "q_agg_partial_corr", "q_agg_cronbach_alpha",
    "q_agg_icc").foreach(checkDeclared(_))

  test("adf lag1: gamma negative and t more negative than plain DF direction") {
    val r = q("q_ts_adf_lag1").head()
    assert(r.getDouble(1) < 0) // daily revenue is mean-reverting
    assert(r.getDouble(3) < 0)
  }

  test("partial corr: identity holds vs scratch pairwise corrs") {
    val r = q("q_agg_partial_corr").head()
    val (rxy, rxz, ryz, pr) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val expect = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(pr - expect) < 1e-5)
    assert(pr >= -1 && pr <= 1)
  }

  test("cronbach: alpha recomputed from scratch item variances") {
    val conds = Seq("click", "error", "purchase", "signup", "view")
      .map(t => sum((col("event_type") === t).cast("long")).as(t))
    val rows = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(conds.head, conds.tail: _*)
      .collect()
    val items = (1 to 5).map(i => rows.map(_.getLong(i).toDouble))
    val totals = rows.map(r => (1 to 5).map(r.getLong).sum.toDouble)
    def svar(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(v => (v - m) * (v - m)).sum / (xs.length - 1)
    }
    val alpha = 1.25 * (1 - items.map(svar).sum / svar(totals))
    val r = q("q_agg_cronbach_alpha").head()
    assert(math.abs(r.getDouble(3) - alpha) < 1e-4)
  }

  test("icc: between/within decomposition is consistent") {
    val r = q("q_agg_icc").head()
    assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
    val icc = r.getDouble(4)
    assert(icc >= -1 && icc <= 1)
  }
}
