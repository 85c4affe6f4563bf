package graft

import org.apache.spark.sql.functions._

class Extras17Spec extends QuerySuiteBase {
  Seq("q_stream_live_foreachbatch", "q_graph_kcore", "q_llm_embed_cov",
    "q_agg_abc_pareto").foreach(checkDeclared(_))

  test("foreachBatch merge equals the one-shot batch reduction") {
    // the accumulated multi-batch merge must equal latest-wins + count
    // computed in a single pass over the full table — batch-split
    // invariance, the property the merge operator's associativity buys
    val r = q("q_stream_live_foreachbatch")
    val ev = Tables.events(spark, sf)
    val exp = ev.select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type").as("etype"),
        (col("value").cast(Det.D2) * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("us"), col("event_id"), col("etype"),
          col("cents")), struct(col("us"), col("event_id"))).as("r"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("r.us"), col("r.event_id"),
        col("r.etype"), col("r.cents"), col("n_events"))
      .orderBy("user_id")
    assert(fingerprint(r) == fingerprint(exp))
  }

  test("kcore: every surviving node keeps degree >= 2") {
    val r = q("q_graph_kcore")
    assert(r.where(col("degree") < 2).count() == 0)
  }

  test("cov matrix: diagonal is a non-negative variance, 136 pairs") {
    val r = q("q_llm_embed_cov")
    assert(r.count() == 136)
    assert(r.where(col("i") === col("j") && col("cov_units") < 0)
      .count() == 0)
    assert(r.where(col("i") > col("j")).count() == 0)
  }

  test("pareto: shares sum to 1, class A covers at most 80%") {
    val rows = q("q_agg_abc_pareto").collect()
    val share = rows.map(_.getDouble(3)).sum
    assert(math.abs(share - 1.0) < 1e-9, s"shares sum to $share")
    rows.find(_.getString(0) == "A").foreach { a =>
      assert(a.getDouble(3) <= 0.8 + 1e-9)
    }
  }
}
