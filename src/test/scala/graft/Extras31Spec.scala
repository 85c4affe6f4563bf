package graft

import org.apache.spark.sql.functions._

class Extras31Spec extends QuerySuiteBase {
  Seq("q_graph_label_prop", "q_ts_twa", "q_join_right",
    "q_evt_depth_hist", "q_llm_shard_assign", "q_agg_distinct_filtered")
    .foreach(checkDeclared(_))

  test("label prop: labels only shrink and land on real node ids") {
    val rows = q("q_graph_label_prop").collect()
    val ids = rows.map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0)) // min-update can only shrink
      assert(ids.contains(r.getLong(1)))   // labels are node ids
    }
    // propagation actually merged something: fewer labels than nodes
    assert(rows.map(_.getLong(1)).distinct.length < rows.length)
  }

  test("twa: durations partition first-event..midnight exactly") {
    val rows = q("q_ts_twa").collect()
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(2) <= 86400L * 1000000L)
      val twa = r.getDouble(4)
      assert(twa == r.getLong(3).toDouble / r.getLong(2).toDouble / 100.0)
    }
  }

  test("right join: every customer survives, P-less customers get NULLs") {
    val rows = q("q_join_right").collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(0)).distinct.length == nCust)
    val withNull = rows.filter(_.isNullAt(2))
    assert(withNull.nonEmpty) // status P is rare — some customers miss
    // a customer appears with NULL only when they have no P orders at all
    val nullCust = withNull.map(_.getLong(0)).toSet
    val matchedCust = rows.filter(!_.isNullAt(2)).map(_.getLong(0)).toSet
    assert(nullCust.intersect(matchedCust).isEmpty)
  }

  test("depth hist: weighted cell count reconciles to total events") {
    val rows = q("q_evt_depth_hist").collect()
    val total = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("shard assign: all 8 shards hit, shares sum to 1") {
    val rows = q("q_llm_shard_assign").collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
  }

  test("filtered distinct: buyers never exceed that day's distinct users") {
    val rows = q("q_agg_distinct_filtered").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getDouble(3) ==
          r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }
}
