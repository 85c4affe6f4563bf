package graft

import org.apache.spark.sql.functions._

class WindowsSetsFnsSpec extends QuerySuiteBase {
  Seq("q_win_rank", "q_win_analytic", "q_win_frame_rows", "q_win_frame_range",
    "q_sort_multi", "q_topk", "q_topk_per_group", "q_limit_offset",
    "q_set_union", "q_set_union_all", "q_set_intersect", "q_set_except",
    "q_fn_string", "q_fn_date", "q_fn_math", "q_fn_array", "q_fn_map",
    "q_fn_json", "q_fn_cond").foreach(checkDeclared(_))

  test("running sum: final per-user value equals the user's total") {
    val finalRunning = q("q_win_frame_rows")
      .groupBy("user_id").agg(max("running_v").as("rv"))
    val totals = Tables.events(spark, sf)
      .groupBy("user_id").agg(Det.dsum(col("value")).as("tv"))
    val joined = finalRunning.join(totals, "user_id")
      .where(abs(col("rv") - col("tv")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("topk is the sorted prefix of the full sort") {
    val full = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(50).collect()
    assert(q("q_topk").collect().toSeq == full.toSeq)
  }

  test("topk per group: no group exceeds k rows") {
    val over = q("q_topk_per_group").groupBy("o_custkey").count()
      .where(col("count") > 3).count()
    assert(over == 0)
  }

  test("limit/offset page is disjoint from the first page and contiguous") {
    val page = q("q_limit_offset").select("o_orderkey").collect().map(_.getLong(0))
    val all = Tables.orders(spark, sf).select("o_orderkey")
      .orderBy("o_orderkey").limit(150).collect().map(_.getLong(0))
    assert(page.toSeq == all.drop(100).toSeq)
  }

  test("set algebra vs Scala Set model") {
    val click = Tables.events(spark, sf).where(col("event_type") === "click")
      .select("user_id").collect().map(_.getLong(0)).toSet
    val purchase = Tables.events(spark, sf).where(col("event_type") === "purchase")
      .select("user_id").collect().map(_.getLong(0)).toSet
    def dayPairs(t: String) = Tables.events(spark, sf)
      .where(col("event_type") === t)
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(q("q_set_intersect").collect().map(_.getLong(0)).toSet == (click & purchase))
    assert(q("q_set_except").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == (dayPairs("view") -- dayPairs("error")))
  }

  test("window rank: rn is 1..n within each brand") {
    val counts = q("q_win_rank").groupBy("p_brand")
      .agg(count(lit(1)).as("n"), max("rn").as("maxrn"), min("rn").as("minrn"))
      .where(col("n") =!= col("maxrn") || col("minrn") =!= 1)
    assert(counts.count() == 0)
  }

  test("q_fn_math: pmod is always in [0,7)") {
    val bad = q("q_fn_math").where(col("pm") < 0 || col("pm") >= 7).count()
    assert(bad == 0)
  }

  test("q_fn_array: dims all 64, n_pos <= dim") {
    val bad = q("q_fn_array")
      .where(col("dim") =!= 64 || col("n_pos") > col("dim")).count()
    assert(bad == 0)
  }
}
