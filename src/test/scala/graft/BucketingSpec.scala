package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: pre-shuffling both fact tables into the
  * same bucket layout removes the per-query Exchange entirely — the
  * standard way to amortize the big-join shuffle across every downstream
  * query at 100 TB. The spec proves the plan really contains no shuffle
  * and that results equal the plain join. */
class BucketingSpec extends QuerySuiteBase {

  test("bucketed join on the bucket key plans with zero Exchange") {
    Tables.lineitem(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    // hint("merge") pins SMJ so the test exercises the co-located shuffle
    // path (a broadcast join would trivially have no exchange on one side).
    // The plan is asserted on the JOIN alone — a downstream aggregation
    // would add its own (legitimate) exchange.
    val j = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_orderpriority"), col("l_extendedprice"))
    assert(j.count() > 0)
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      "bucketed join must read both sides co-located, no shuffle:\n" + p)

    // Same result as the unbucketed join.
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val got = j.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().map(_.toString).toSeq
    val want = plain.orderBy("o_orderpriority").collect().map(_.toString).toSeq
    assert(got == want)
  }
}
