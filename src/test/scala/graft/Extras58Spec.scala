package graft

import org.apache.spark.sql.functions._

class Extras58Spec extends QuerySuiteBase {
  Seq("q_source_tsv", "q_agg_skew_test", "q_evt_burstiness")
    .foreach(checkDeclared(_))

  test("tsv: round-trip exact vs direct parquet aggregate") {
    val tsv = q("q_source_tsv").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(tsv == direct)
  }

  test("skew test: z scales with sqrt(n); sign matches skewness") {
    val rows = q("q_agg_skew_test").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, g1, z) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(z - g1 * math.sqrt(n / 6.0)) < 1e-3)
      assert(math.signum(z) == math.signum(g1) || g1 == 0.0)
    }
  }

  test("burstiness: in (-1, 1); moments positive") {
    val rows = q("q_evt_burstiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
      val b = r.getDouble(4)
      assert(b > -1.0 && b < 1.0)
    }
  }
}
