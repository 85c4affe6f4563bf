package graft

import org.apache.spark.sql.functions._

class Extras95Spec extends QuerySuiteBase {
  Seq("q_evt_power_sample_size", "q_agg_corr_ci", "q_win_beta_rolling",
    "q_graph_cc_by_degree").foreach(checkDeclared(_))

  test("power: n_per_arm recomputed from the base rate") {
    val r = q("q_evt_power_sample_size").head()
    val p1 = r.getDouble(2)
    val p2 = p1 + (if (p1 > 0.5) -0.02 else 0.02)
    val pbar = (p1 + p2) / 2
    val num = 1.96 * math.sqrt(2 * pbar * (1 - pbar)) +
      0.8416 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    assert(math.abs(r.getDouble(3) - num * num / 0.0004) < 1e-3)
    assert(r.getDouble(3) > 100)
  }

  test("corr ci: interval brackets r and is inside [-1, 1]") {
    val r = q("q_agg_corr_ci").head()
    val (rv, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo < rv && rv < hi)
    assert(lo >= -1 && hi <= 1)
  }

  test("beta rolling: emits from day 28 of the joined spine") {
    val rows = q("q_win_beta_rolling").collect()
    val joined = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("dt")).distinct()
      .join(Tables.lineitem(spark, sf)
        .select(to_date(col("l_shipdate")).as("dt")).distinct(), Seq("dt"))
      .count()
    assert(rows.length == joined - 27)
    rows.foreach(r => assert(!r.getDouble(1).isNaN))
  }

  test("cc by degree: buckets cover every node with degree >= 2") {
    val rows = q("q_graph_cc_by_degree").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1.0)
    }
    val nodes = rows.map(_.getLong(1)).sum
    val edges = Extras11Probe.edges(spark, sf)
    val degs = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map(_._2.size)
    assert(nodes == degs.count(_ >= 2))
  }
}
