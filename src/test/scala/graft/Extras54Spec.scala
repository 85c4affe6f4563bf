package graft

import org.apache.spark.sql.functions._

class Extras54Spec extends QuerySuiteBase {
  Seq("q_evt_decay_fit", "q_dq_table_checksum", "q_agg_histogram_kl")
    .foreach(checkDeclared(_))

  test("decay fit: hazard positive, half-life consistent with lambda") {
    val r = q("q_evt_decay_fit").head()
    val (lam, hl) = (r.getDouble(1), r.getDouble(2))
    assert(lam < 0)                       // survival declines
    assert(hl > 0)
    assert(math.abs(hl + math.log(2.0) / lam) < math.abs(hl) * 1e-3)
  }

  test("checksum: row counts match; checksums are content-sensitive") {
    val rows = q("q_dq_table_checksum").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("customer", "lineitem", "orders"))
    val counts = Map(
      "customer" -> Tables.customer(spark, sf).count(),
      "lineitem" -> Tables.lineitem(spark, sf).count(),
      "orders" -> Tables.orders(spark, sf).count())
    rows.foreach(r => assert(r.getLong(1) == counts(r.getString(0))))
    // distinct tables yield distinct fingerprints
    assert(rows.map(_.getLong(2)).distinct.length == 3)
  }

  test("kl: non-negative (smoothed); totals cover all orders") {
    val r = q("q_agg_histogram_kl").head()
    assert(r.getLong(0) + r.getLong(1) == Tables.orders(spark, sf).count())
    assert(r.getDouble(4) >= -1e-3) // KL ≥ 0 up to quantization noise
    assert(r.getLong(2) <= 20)
  }
}
