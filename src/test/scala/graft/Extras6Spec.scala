package graft

import org.apache.spark.sql.functions._

/** Round-5 operator suite: bitmap exact-distinct, median family, interval
  * arithmetic, Z-order clustering, metadata row positions, nearest as-of,
  * URL dedup, bigram-LM scoring, and the two new live streaming queries. */
class Extras6Spec extends QuerySuiteBase {
  Seq("q_agg_median", "q_fn_bitmap", "q_fn_interval", "q_layout_zorder",
    "q_scan_rowindex", "q_join_asof_nearest", "q_llm_dedup_url",
    "q_llm_ngram_lm", "q_stream_live_sliding", "q_stream_live_ssjoin")
    .foreach(checkDeclared(_))

  test("bitmap distinct counts equal exact COUNT(DISTINCT) per status") {
    val exact = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("exact_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = Tables.orders(spark, sf)
      .agg(countDistinct(col("o_custkey"))).head().getLong(0)
    q("q_fn_bitmap").collect().foreach { r =>
      val expected =
        if (r.getString(0) == "ALL") global else exact(r.getString(0))
      assert(r.getLong(1) == expected,
        s"bitmap distinct for ${r.getString(0)}: ${r.getLong(1)} != $expected")
    }
  }

  test("z-order buckets bound BOTH dimensions (the file-skipping property)") {
    // bucket = zval >> 16 pins the top 4 bits of each 12-bit dim, so any
    // bucket's x-span and y-span are each < 4096/16 = 256 — the reason a
    // single-dimension predicate can prune z-laid-out files by stats.
    val rows = q("q_layout_zorder").collect()
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 255,
        s"bucket ${r.getLong(0)}: x-span ${r.getLong(3) - r.getLong(2)}")
      assert(r.getLong(5) - r.getLong(4) <= 255,
        s"bucket ${r.getLong(0)}: y-span ${r.getLong(5) - r.getLong(4)}")
    }
    // And the buckets jointly cover every order exactly once.
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, sf).count())
  }

  test("row_index equals the logical id on the id-ordered fixture") {
    assert(q("q_scan_rowindex")
      .where(col("row_idx") =!= col("event_id")).count() == 0,
      "parquet physical position must equal event_id on this fixture")
  }

  test("nearest as-of: unique match per purchase, inside the band, minimal") {
    val df = q("q_join_asof_nearest").cache()
    val n = df.count()
    assert(df.select("p_id").distinct().count() == n, "duplicate purchases")
    assert(df.where(abs(col("c_us") - col("p_us")) > 3600000000L).count() == 0,
      "match outside the ±1h band")
    df.unpersist()
  }

  test("URL dedup partitions the corpus: variant counts sum to |documents|") {
    val df = q("q_llm_dedup_url")
    assert(df.agg(sum(col("n_variants"))).head().getLong(0) ==
      Tables.documents(spark, sf).count())
    assert(df.where(col("keep_doc") < 0).count() == 0)
  }

  test("bigram-LM mass is positive and bounded by the bigram count") {
    // Each p ∈ (0, 1] ⇒ 0 < lm_sum ≤ n_bigrams.
    assert(q("q_llm_ngram_lm")
      .where(col("lm_sum") <= 0 || col("lm_sum") > col("n_bigrams"))
      .count() == 0)
  }

  test("live sliding windows equal the batch twin exactly") {
    assert(fingerprint(q("q_stream_live_sliding")) ==
      fingerprint(q("q_stream_sliding")),
      "MicroBatchExecution sliding agg diverged from the batch window()")
  }

  test("live stream-stream join equals the batch range join") {
    import graft.Det._
    val ev = Tables.events(spark, sf)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val batch = p.join(c, col("p_user") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("p_user"), col("c_id"),
        tsUs(col("p_ts")).as("p_us"), tsUs(col("c_ts")).as("c_us"))
      .orderBy("p_id", "c_id")
    assert(fingerprint(q("q_stream_live_ssjoin")) == fingerprint(batch),
      "stream-stream join under AvailableNow diverged from the batch join")
  }

  test("median sits between the group's min and max") {
    val bounds = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    q("q_agg_median").collect().foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getDouble(1) >= lo && r.getDouble(1) <= hi)
    }
  }

  test("interval arithmetic: shifts preserve deltas exactly") {
    // plus90m is exactly 90 min ahead; minutes-since-midnight ∈ [0, 1439].
    val df = q("q_fn_interval")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), graft.Det.tsUs(col("ts")).as("us"))
    assert(df.join(ev, "event_id")
      .where(col("plus90m_us") - col("us") =!= 5400000000L).count() == 0)
    assert(df.where(col("min_since_midnight") < 0
      || col("min_since_midnight") > 1439).count() == 0)
  }
}
