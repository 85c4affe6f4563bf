package graft

import org.apache.spark.sql.functions._

class Extras16Spec extends QuerySuiteBase {
  Seq("q_ts_drawdown", "q_agg_gini", "q_ts_interval_merge",
    "q_agg_weighted_median", "q_graph_jaccard", "q_llm_embed_quantize")
    .foreach(checkDeclared(_))

  test("drawdown: non-negative and bounded by the peak-to-trough range") {
    val r = q("q_ts_drawdown")
    assert(r.where(col("max_drawdown") < 0).count() == 0)
    // a drawdown never exceeds peak - (global minimum cumulative sum),
    // and a 1-event series has drawdown exactly 0
    assert(r.where(col("n_events") === 1 && col("max_drawdown") =!= 0.0)
      .count() == 0)
  }

  test("gini lies in [0,1) and matches a local recomputation") {
    val rows = q("q_agg_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val g = row.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    }
    // independent recomputation for one group
    val pri = rows.head.getString(0)
    val xs = Tables.orders(spark, sf)
      .where(col("o_orderpriority") === pri)
      .select(Det.dec(col("o_totalprice")).cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val n = xs.length.toLong
    val num = xs.zipWithIndex.map { case (x, i0) =>
      (2L * (i0 + 1) - n - 1) * x }.sum
    val g = num / (n * xs.sum)
    assert(math.abs(rows.head.getDouble(3) - g) < 1e-9)
  }

  test("interval merge: covered time within [5min, span] bounds") {
    val r = q("q_ts_interval_merge")
    // each island covers at least one 5-minute interval; total covered
    // time never exceeds the first-start..last-end span
    assert(r.where(col("covered_us") < lit(300000000L)
      || col("covered_us") > col("span_us")).count() == 0)
    assert(r.where(col("covered_us") < 300000000L).count() == 0)
  }

  test("weighted median is a data value inside the group's price range") {
    val r = q("q_agg_weighted_median").collect()
    r.foreach { row =>
      val rf = row.getString(0)
      val hit = Tables.lineitem(spark, sf)
        .where(col("l_returnflag") === rf &&
          Det.dec(col("l_extendedprice")).cast("double") === row.getDouble(1))
        .count()
      assert(hit > 0, s"median ${row.getDouble(1)} not a data value for $rf")
    }
  }

  test("jaccard: common <= union, similarity in (0,1], symmetric keys a<b") {
    val r = q("q_graph_jaccard")
    assert(r.where(col("common") > col("union_size")).count() == 0)
    assert(r.where(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    assert(r.where(col("a") >= col("b")).count() == 0)
  }

  test("int8 quantization: every dim saturates at 127 and |sum_q| bounded") {
    val r = q("q_llm_embed_quantize")
    // the max-abs component of each dim quantizes to exactly ±127, so
    // every dim has at least one saturated value
    assert(r.where(col("n_saturated") < 1).count() == 0)
    assert(r.where(abs(col("sum_q")) > col("n_vecs") * 127L).count() == 0)
    assert(r.count() == 64)
  }
}
