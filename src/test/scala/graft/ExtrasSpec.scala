package graft

import org.apache.spark.sql.functions._

class ExtrasSpec extends QuerySuiteBase {
  Seq("q_win_distribution", "q_agg_stats", "q_agg_percentile",
    "q_scan_sample_hash", "q_fn_string2", "q_fn_bit", "q_fn_date2",
    "q_fn_generator", "q_fn_regexp_all", "q_agg_histogram", "q_fn_null",
    "q_llm_dedup_keep", "q_set_except_all", "q_set_intersect_all")
    .foreach(checkDeclared(_))

  test("dedup_keep: removes exactly the doc_b side of near-dup pairs") {
    val dropped = q("q_llm_dedup_near").select("doc_b").distinct().count()
    val kept = q("q_llm_dedup_keep").count()
    assert(kept == Tables.documents(spark, sf).count() - dropped)
  }

  test("histogram buckets partition all orders") {
    assert(q("q_agg_histogram").agg(sum("n")).head().getLong(0)
      == Tables.orders(spark, sf).count())
  }

  test("hash sample rate is ~10% and is a subset of the table") {
    val n = Tables.orders(spark, sf).count().toDouble
    val k = q("q_scan_sample_hash").count().toDouble
    assert(k / n > 0.05 && k / n < 0.15, s"rate ${k / n}")
  }

  test("algebraic variance matches Spark's built-in var_samp closely") {
    val ours = q("q_agg_stats").select("l_returnflag", "var_qty")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(var_samp("l_quantity").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) => assert(math.abs(v - builtin(k)) < 1e-6) }
  }

  test("percent_rank spans [0,1] inside each segment") {
    val mm = q("q_win_distribution").agg(min("pr"), max("pr")).head()
    assert(mm.getDouble(0) == 0.0 && mm.getDouble(1) == 1.0)
  }

  test("exceptAll keeps multiplicity: |A exceptAll B| = sum max(0, ca-cb)") {
    def counts(t: String) = Tables.events(spark, sf)
      .where(col("event_type") === t).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = counts("view"); val b = counts("error")
    val expected = a.map { case (k, ca) => math.max(0L, ca - b.getOrElse(k, 0L)) }.sum
    assert(q("q_set_except_all").count() == expected)
  }
}
