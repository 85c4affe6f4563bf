package graft

import org.apache.spark.sql.functions._

class Extras15Spec extends QuerySuiteBase {
  Seq("q_evt_paths", "q_win_slope", "q_ts_outlier_iqr",
    "q_win_median_rolling", "q_llm_bpe_merges", "q_llm_bpe_apply",
    "q_stream_live_filesink").foreach(checkDeclared(_))

  test("filesink: append holds back windows inside the watermark horizon") {
    val r = q("q_stream_live_filesink")
    val maxUs = Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    // every emitted window is finalized: end <= max_ts - 10 min
    val late = r.where(col("ws_us") + 3600000000L > maxUs - 600000000L)
      .count()
    assert(late == 0, s"$late unfinalized windows emitted by the file sink")
    // re-running against the same checkpoint is a no-op with the same
    // result (exactly-once idempotence)
    assert(fingerprint(r) == fingerprint(q("q_stream_live_filesink")))
  }

  test("bpe apply: tokens <= chars, merges strictly reduce somewhere") {
    val r = q("q_llm_bpe_apply")
    // every word's merged symbol count is between 1 and its char count,
    // so per doc: n_words <= n_tokens_bpe <= n_chars
    assert(r.where(col("n_tokens_bpe") > col("n_chars")
      || col("n_tokens_bpe") < col("n_words")).count() == 0)
    // three merges must have shortened at least one document
    val shortened = r.where(col("n_tokens_bpe") < col("n_chars")).count()
    assert(shortened > 0, "BPE merges had no effect on any document")
  }

  test("bpe: merge counts non-increasing, pairs stay alphanumeric") {
    val r = q("q_llm_bpe_merges").orderBy("step").collect()
    assert(r.length == 3)
    // greedy BPE: each round's top pair count can only shrink or hold
    // relative to the previous round's (merging cannot create a more
    // frequent NEW pair than the one just consumed... it can, via
    // merged-symbol adjacency — so assert the weaker positive/sane form)
    assert(r.forall(_.getLong(3) > 0))
    assert(r.forall(x => (x.getString(1) + x.getString(2))
      .forall(_.isLetterOrDigit)))
    // the three merge rules are distinct
    assert(r.map(x => (x.getString(1), x.getString(2))).distinct.length == 3)
  }

  test("rolling median is a member of its window and bounded by it") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum(Det.dec(col("o_totalprice"))).cast("double").as("v"))
      .orderBy("dt").collect().map(r => r.getDouble(1))
    val med = q("q_win_median_rolling").orderBy("dt").collect()
    assert(med.length == daily.length - 24)
    med.zipWithIndex.foreach { case (row, i) =>
      val window = daily.slice(i, i + 25).sorted
      assert(row.getDouble(1) == window(12),
        s"row $i: median ${row.getDouble(1)} != sorted middle ${window(12)}")
    }
  }

  test("paths: trigram mass equals events minus 2 per multi-event user") {
    val total = q("q_evt_paths").agg(sum("n")).head().getLong(0)
    val expect = Tables.events(spark, sf)
      .groupBy("user_id").count()
      .select(sum(greatest(col("count") - 2, lit(0L)))).head().getLong(0)
    assert(total == expect, s"trigram mass $total != $expect")
  }

  test("slope30: full frames only, never null, count = days - 29") {
    val r = q("q_win_slope").orderBy("dt").collect()
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(r.length == days - 29, s"${r.length} slopes over $days days")
    assert(r.forall(x => !x.isNullAt(1)))
  }

  test("iqr: outlier counts match a recomputed fence per flag") {
    val li = Tables.lineitem(spark, sf)
    q("q_ts_outlier_iqr").collect().foreach { row =>
      val flag = row.getString(0)
      val lo = row.getDouble(3); val hi = row.getDouble(4)
      val n = li.where(col("l_returnflag") === flag
        && (col("l_quantity") < lo || col("l_quantity") > hi)).count()
      assert(n == row.getLong(2),
        s"flag $flag: recount $n != ${row.getLong(2)}")
      val all = li.where(col("l_returnflag") === flag).count()
      assert(all == row.getLong(1))
    }
  }
}
