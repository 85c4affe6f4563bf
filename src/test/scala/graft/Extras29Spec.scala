package graft

import org.apache.spark.sql.functions._

class Extras29Spec extends QuerySuiteBase {
  Seq("q_sink_partitioned", "q_evt_conversion_lag",
    "q_llm_importance_sample", "q_source_json_multiline",
    "q_agg_percentile_disc", "q_agg_pivot_multi")
    .foreach(checkDeclared(_))

  test("sink partitioned: per-status read-back equals the base table") {
    val rows = q("q_sink_partitioned").collect()
    val truth = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == truth)
  }

  test("conversion lag: non-negative, purchase at or after signup") {
    val rows = q("q_evt_conversion_lag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0)
      assert(r.getLong(2) >= r.getLong(1)) // purchase_us >= signup_us
    }
    // one row per converting user
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("importance sample: keep rate rises with doc length weighting") {
    val rows = q("q_llm_importance_sample").collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))          // kept <= docs
      val rate = r.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // corpus-wide the weighted filter keeps a strict, non-trivial subset
    val (docs, kept) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(kept > 0 && kept < docs)
  }

  test("json multiline: one top-level array round-trips per-segment sums") {
    val rows = q("q_source_json_multiline").collect()
    val truth = Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"))
      .agg(sum((col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap == truth)
  }

  test("percentile disc: emitted values are actual data order statistics") {
    val rows = q("q_agg_percentile_disc").collect()
    assert(rows.map(_.getString(0)).distinct.sorted.sameElements(Array("A", "N", "R")))
    val byG = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted }
    rows.foreach { r =>
      val sortedVals = byG(r.getString(0))
      val rank = math.ceil(sortedVals.length * r.getInt(1) / 100.0).toInt
      assert(r.getLong(2) == sortedVals(rank - 1))
    }
  }

  test("pivot multi: both measures reconcile against direct aggregation") {
    val rows = q("q_agg_pivot_multi").collect()
    val nTotal = Tables.lineitem(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(3)).sum == nTotal)
    val centsTotal = Tables.lineitem(spark, sf)
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long"))).head.getLong(0)
    assert(rows.map(r => r.getLong(2) + r.getLong(4)).sum == centsTotal)
  }
}
