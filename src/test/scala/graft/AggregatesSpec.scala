package graft

import org.apache.spark.sql.functions._

class AggregatesSpec extends QuerySuiteBase {
  Seq("q1_pricing_summary", "q_agg_global", "q_agg_group", "q_agg_distinct",
    "q_agg_rollup", "q_agg_cube", "q_agg_gsets", "q_agg_filtered",
    "q_agg_collect").foreach(checkDeclared(_))

  test("q1: group sums reconcile with the global sum") {
    val global = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .agg(Det.dsum(col("l_quantity"))).head().getDouble(0)
    val grouped = q("q1_pricing_summary").agg(sum("sum_qty")).head().getDouble(0)
    assert(math.abs(global - grouped) < 1e-9)
  }

  test("q1: parity with spark.sql over the oracle-equivalent SQL") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect()
    val viaDsl = q("q1_pricing_summary")
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(viaSql.toSeq == viaDsl.toSeq)
  }

  test("rollup totals: grand total row equals ungrouped aggregate") {
    val grand = q("q_agg_rollup").where(col("g") === 3).head()
    val n = Tables.supplier(spark, sf).count()
    assert(grand.getAs[Long]("n_supp") == n)
  }

  test("cube contains all four grouping levels") {
    val gs = q("q_agg_cube").select("g").distinct()
      .collect().map(_.getAs[Number](0).intValue).sorted.toSeq
    assert(gs == Seq(0, 1, 2, 3))
  }

  test("partial aggregation (map-side combine) is in the plan") {
    val plan = q("q_agg_group").queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
  }
}
