package graft

import org.apache.spark.sql.functions._

class MiscSpec extends QuerySuiteBase {
  Seq("q_subquery_scalar", "q_subquery_in", "q_subquery_correlated",
    "q_agg_pivot", "q_agg_typed_udaf", "q_llm_multimodal_features")
    .foreach(checkDeclared(_))

  test("pivot row sums equal per-user event counts") {
    val p = q("q_agg_pivot")
    val total = p.select(
      (col("click") + col("error") + col("purchase") + col("signup") + col("view"))
        .as("t"), col("user_id"))
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
    val bad = total.join(counts, "user_id")
      .where(col("t") =!= col("count")).count()
    assert(bad == 0)
  }

  test("typed UDAF equals the decimal-sum built-in aggregation") {
    val udaf = q("q_agg_typed_udaf").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg((sum(Det.dec(col("l_extendedprice"))
        * (lit(1).cast(Det.D2) - Det.dec(col("l_discount"))))
        .cast("double")).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(udaf.keySet == builtin.keySet)
    udaf.foreach { case (k, v) => assert(math.abs(v - builtin(k)) < 1e-6) }
  }

  test("scalar subquery: every returned order is above the mean") {
    val mean = Tables.orders(spark, sf)
      .agg((Det.dsum(col("o_totalprice")) / count(lit(1)))).head().getDouble(0)
    val below = q("q_subquery_scalar").where(col("o_totalprice") <= mean).count()
    assert(below == 0)
  }

  test("multimodal features: digest matches Spark's own md5 function") {
    val viaSql = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(encode(col("text"), "utf-8")).as("d"))
    val bad = q("q_llm_multimodal_features").join(viaSql, "doc_id")
      .where(col("digest") =!= col("d")).count()
    assert(bad == 0)
  }
}
