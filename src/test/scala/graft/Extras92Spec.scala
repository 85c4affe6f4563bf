package graft

import org.apache.spark.sql.functions._

class Extras92Spec extends QuerySuiteBase {
  Seq("q_agg_capture_recapture", "q_agg_tost_equivalence",
    "q_agg_poisson_rate_test", "q_agg_ridge2").foreach(checkDeclared(_))

  test("capture-recapture: estimate bounded below by observed users") {
    val r = q("q_agg_capture_recapture").head()
    val (n1, n2, m, users) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m <= math.min(n1, n2))
    val lp = r.getDouble(4)
    assert(math.abs(lp - n1.toDouble * n2 / m) < 1e-3)
    // LP >= union of the two samples
    assert(lp >= (n1 + n2 - m) - 1e-9)
    assert(users >= math.max(n1, n2))
  }

  test("tost: t_lower > t_upper always; flag consistent") {
    val r = q("q_agg_tost_equivalence").head()
    val (tl, tu) = (r.getDouble(3), r.getDouble(4))
    assert(tl > tu)
    val eq = tl > 1.645 && tu < -1.645
    assert(r.getLong(5) == (if (eq) 1L else 0L))
  }

  test("poisson rate: counts split the purchase total; z recomputed") {
    val r = q("q_agg_poisson_rate_test").head()
    val total = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(r.getLong(0) + r.getLong(1) == total)
    val (c1, c2, d1, d2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val p = d1.toDouble / (d1 + d2)
    val z = (c1 - (c1 + c2) * p) / math.sqrt((c1 + c2) * p * (1 - p))
    assert(math.abs(r.getDouble(5) - z) < 1e-4)
  }

  test("ridge2: prediction at the feature means recovers the mean price") {
    val r = q("q_agg_ridge2").head()
    // betas finite (the synthetic data has near-zero qty/price corr,
    // so no sign assumption holds — the intercept identity does)
    assert(!r.getDouble(1).isNaN && !r.getDouble(2).isNaN)
    // ridge with centered predictors passes exactly through the means
    val base = Tables.lineitem(spark, sf).agg(
      avg(col("l_quantity")).as("mq"),
      avg(Det.dec(col("l_discount")) * 10000).as("md"),
      avg(Det.dec(col("l_extendedprice"))).as("mp")).head()
    val pred = r.getDouble(1) * base.getDouble(0) / 100 +
      r.getDouble(2) * base.getDecimal(1).doubleValue() / 100 +
      r.getDouble(3)
    assert(math.abs(pred - base.getDecimal(2).doubleValue())
      / base.getDecimal(2).doubleValue() < 0.01)
  }
}
