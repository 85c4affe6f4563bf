package graft

import org.apache.spark.sql.functions._

class Extras82Spec extends QuerySuiteBase {
  Seq("q_ts_decompose", "q_ts_fourier", "q_graph_degree_dist",
    "q_graph_powerlaw_alpha").foreach(checkDeclared(_))

  test("decompose: 7 weekday rows; seasonal indices roughly sum to " +
      "zero; strength in [0, 1]") {
    val rows = q("q_ts_decompose").collect()
    assert(rows.length == 7)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L to 6L))
    // the per-dow means of a zero-mean-ish detrended series nearly
    // cancel: |Σ seasonal| bounded by 7 × one day's revenue in micro
    val sumSeas = rows.map(_.getLong(2)).sum
    val maxAbs = rows.map(r => math.abs(r.getLong(2))).max
    assert(math.abs(sumSeas) <= 7 * (maxAbs + 1000000L))
    rows.foreach { r =>
      val st = r.getDouble(3)
      assert(st >= -0.01 && st <= 1.0)
    }
  }

  test("fourier: 8 harmonics; amplitude bounded by the mean absolute " +
      "level") {
    val rows = q("q_ts_fourier").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    val maxDaily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")))
      .agg(sum(col("o_totalprice")).as("y"))
      .agg(max(col("y"))).head().getDouble(0)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= maxDaily + 1)
    }
  }

  test("degree dist: node total matches the distinct-node count; " +
      "edge total is even") {
    val rows = q("q_graph_degree_dist").collect()
    val degSum = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(degSum % 2 == 0) // handshake lemma
    rows.foreach(r => assert(r.getLong(0) >= 1))
  }

  test("powerlaw alpha: > 1 by construction; tail bounded by node " +
      "count") {
    val r = q("q_graph_powerlaw_alpha").head()
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) >= 2L)
    val a = r.getDouble(3)
    assert(a > 1.0 && a < 100.0)
  }
}
