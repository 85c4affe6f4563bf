package graft

import org.apache.spark.sql.functions._

class Extras59Spec extends QuerySuiteBase {
  Seq("q_agg_kurtosis_test", "q_ts_mean_reversion")
    .foreach(checkDeclared(_))

  test("kurtosis: z scales with sqrt(n/24); uniform-ish values read platykurtic") {
    val rows = q("q_agg_kurtosis_test").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, g2, z) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(z - g2 * math.sqrt(n / 24.0)) < 1e-3)
      assert(g2 > -3.0) // hard lower bound of excess kurtosis
    }
  }

  test("mean reversion: |rho| < 1 on a stationary-ish revenue series") {
    val r = q("q_ts_mean_reversion").head()
    val rho = r.getDouble(1)
    assert(rho > -1.0 && rho < 1.0)
    if (rho > 0 && rho < 1)
      assert(math.abs(r.getDouble(2) + math.log(2.0) / math.log(rho))
        < math.abs(r.getDouble(2)) * 1e-3 + 1e-6)
    else assert(r.isNullAt(2))
  }
}
