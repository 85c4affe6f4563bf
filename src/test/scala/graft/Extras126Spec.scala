package graft

class Extras126Spec extends QuerySuiteBase {
  Seq("q_evt_decile_mobility", "q_graph_centralization",
      "q_agg_ecf_distance")
    .foreach(checkDeclared(_))

  test("mobility: deciles in 0..9, row shares sum to 1 per row") {
    val rows = q("q_evt_decile_mobility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 9)
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    }
  }

  test("centralization: in [0, 1], handshake identity holds") {
    val r = q("q_graph_centralization").head()
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getLong(2) <= r.getLong(0) - 1) // dmax < n
  }

  test("ecf: |phi| differences bounded by 2, dist2 consistent") {
    val rows = q("q_agg_ecf_distance").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (dre, dim, d2) = (r.getDouble(3), r.getDouble(4),
        r.getDouble(5))
      assert(math.abs(dre) <= 2.0 && math.abs(dim) <= 2.0)
      assert(math.abs(d2 - (dre * dre + dim * dim)) < 1e-5)
    }
  }
}
