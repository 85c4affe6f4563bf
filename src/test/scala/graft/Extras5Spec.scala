package graft

class Extras5Spec extends QuerySuiteBase {
  Seq("q_source_partitioned", "q_join_bucketed", "q_source_orc",
    "q_win_ignore_nulls", "q_stream_live_session", "q_fn_variant",
    "q_fn_url", "q_scan_sample_stratified", "q_ts_ohlc",
    "q_win_range_time", "q_agg_hll_union", "q_llm_contamination",
    "q_llm_pii_scrub", "q_llm_repetition")
    .foreach(checkDeclared(_))

  test("contamination: broadcast semi-check, ratios in (0,1]") {
    import org.apache.spark.sql.functions._
    val df = q("q_llm_contamination")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("Broadcast"),
      "benchmark shingle set should broadcast, not shuffle the corpus")
    assert(df.where(col("ratio") <= 0 || col("ratio") > 1).count() == 0)
  }

  test("pii scrub: zero raw addresses survive, counts match plants") {
    import org.apache.spark.sql.functions._
    val df = q("q_llm_pii_scrub")
    assert(df.where(col("scrubbed").rlike("@ex\\.org")
      || col("scrubbed").rlike("555-[0-9]{4}")).count() == 0,
      "redaction left raw PII behind")
    // Every synthesized contact line plants exactly one email + one phone.
    assert(df.where(col("n_email") =!= 1 || col("n_phone") =!= 1).count() == 0)
  }

  test("HLL sketches: within-bound verdicts true, exact side verified") {
    import org.apache.spark.sql.functions._
    val exact = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    val rows = q("q_agg_hll_union").collect()
    assert(rows.map(_.getString(0)).contains("ALL"))
    rows.foreach { r =>
      val (status, ex, ok) = (r.getString(0), r.getLong(1), r.getBoolean(2))
      val truth = if (status == "ALL") exactAll else exact(status)
      assert(ex == truth, s"$status: exact_custs $ex vs recomputed $truth")
      assert(ok, s"$status: HLL estimate strayed past 5% of $truth")
    }
  }

  test("OHLC: high >= open/close >= low, bars partition the events") {
    import org.apache.spark.sql.functions._
    val bars = q("q_ts_ohlc")
    val bad = bars.where(col("high") < col("low")
      || col("open") > col("high") || col("open") < col("low")
      || col("close") > col("high") || col("close") < col("low")).count()
    assert(bad == 0)
    assert(bars.agg(sum(col("n"))).head().getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("stratified sample hits each stratum near its configured rate") {
    val rates = Map("F" -> 0.20, "O" -> 0.10, "P" -> 0.50)
    val totals = Tables.orders(spark, sf).groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q_scan_sample_stratified").collect().foreach { r =>
      val (status, n) = (r.getString(0), r.getLong(1))
      val expect = totals(status) * rates(status)
      assert(math.abs(n - expect) <= 4 * math.sqrt(expect) + 3,
        s"$status: sampled $n, expected ~$expect of ${totals(status)}")
    }
  }

  test("partitioned source: status predicate prunes partitions, not rows") {
    val df = q("q_source_partitioned")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s", "").contains("o_orderstatus"),
      s"expected a partition filter on o_orderstatus:\n$p")
  }

  test("bucketed join: no shuffle anywhere — bucketing replaced it") {
    val df = q("q_join_bucketed")
    df.collect() // finalize AQE so the executed plan is the real one
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected a merge join:\n$p")
    // The join AND the per-order aggregation must both be served by the
    // bucketed HashPartitioning: the only allowed exchange is the final
    // presentation sort (rangepartitioning).
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not hash-shuffle either side:\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"scan should report bucket selection:\n$p")
  }

  test("live session windows agree with the gaps-and-islands batch twin") {
    val live = q("q_stream_live_session")
      .select("user_id", "start_us", "end_us", "n", "sum_v")
    val twin = q("q_stream_session")
      .select("user_id", "start_us", "end_us", "n", "sum_v")
    assert(live.exceptAll(twin).isEmpty && twin.exceptAll(live).isEmpty,
      "streaming session_window diverged from the batch definition")
  }

  test("ignore-nulls forward fill only ever carries non-null values") {
    import org.apache.spark.sql.functions._
    // ff_v may be null only before the first observation; afterwards it
    // must equal the most recent non-null v — spot-check the invariant
    // that ff_v is never one of the synthesized nulls' positions' values.
    val bad = q("q_win_ignore_nulls")
      .where(col("ff_v").isNull && col("prev_v").isNotNull)
      .count()
    assert(bad == 0, "forward fill lost a preceding non-null observation")
  }
}
