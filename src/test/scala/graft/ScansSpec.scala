package graft

import org.apache.spark.sql.functions._

class ScansSpec extends QuerySuiteBase {
  Seq("q_scan_full", "q_scan_offset", "q_scan_offset_filtered",
    "q_scan_batch", "q_source_json_lines",
    "q_project", "q_filter_int_range", "q_filter_int_value",
    "q_filter_blob_value", "q_filter_compound", "q_filter_like")
    .foreach(checkDeclared(_))

  test("q_scan_offset: offset semantics — exactly the rows >= start") {
    val n = Tables.events(spark, sf).count()
    assert(q("q_scan_offset").count() == n - 500)
    val ids = q("q_scan_offset").agg(min("event_id"), max("event_id")).head()
    assert(ids.getLong(0) == 500 && ids.getLong(1) == n - 1)
  }

  test("q_scan_batch: batched read returns exactly the batch size") {
    assert(q("q_scan_batch").count() == 100)
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = q("q_filter_int_range").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(p_size,10)"),
      s"expected p_size pushdown in:\n$plan")
  }

  test("projection prunes the read schema to selected columns") {
    val plan = q("q_filter_int_range").queryExecution.executedPlan.toString
    assert(!plan.contains("p_retailprice"),
      "unused column p_retailprice should be pruned from the scan")
  }

  test("declared filter query matches an independently built filter") {
    val independent = Tables.events(spark, sf)
      .where(col("user_id") === 7)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
    assert(q("q_filter_int_value").collect().toSeq == independent.collect().toSeq)
  }

  test("SearchForward shape: all three predicates pushed to the scan") {
    // simpleString elides long PushedFilters lists with '…' — use the
    // formatted explain, which prints them in full.
    val plan = q("q_scan_offset_filtered").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
      .replaceAll("\\s", "")
    assert(plan.contains("GreaterThanOrEqual(event_id,200)") &&
      plan.contains("GreaterThanOrEqual(user_id,3)") &&
      plan.contains("LessThanOrEqual(user_id,11)") &&
      plan.contains("EqualTo(event_type,click)"), plan)
  }

  test("events.ts nanosecond column reads as µs-truncated timestamp") {
    val ts = Tables.events(spark, sf).select("ts").head().getTimestamp(0)
    assert(ts.toInstant.toString.startsWith("2024-01-01T00:09:58.778549"))
  }
}
