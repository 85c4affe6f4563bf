package graft

import org.apache.spark.sql.functions._

class Extras21Spec extends QuerySuiteBase {
  Seq("q_graph_assortativity", "q_ts_dow_hour", "q_ts_peaks",
    "q_set_union_evolve", "q_source_merge_schema", "q_stream_live_union")
    .foreach(checkDeclared(_))

  test("assortativity: r in [-1,1], symmetric sums agree") {
    val r = q("q_graph_assortativity").head
    assert(r.getLong(1) == r.getLong(2)) // sx == sy over both directions
    assert(r.getLong(4) == r.getLong(5)) // sxx == syy
    if (!r.isNullAt(6)) { // NULL iff zero-variance (regular) graph
      val coef = r.getDouble(6)
      assert(coef >= -1.0 - 1e-9 && coef <= 1.0 + 1e-9)
    }
  }

  test("dow_hour: dows 1..7, hours 0..23, total preserved") {
    val rows = q("q_ts_dow_hour").collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 7)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
    }
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
  }

  test("peaks: each peak strictly exceeds its neighbors") {
    // re-derive neighbors and verify every reported peak
    val e = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value").cast("decimal(18,2)").as("v"))
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(r => (r.getLong(1), r.getLong(2))))
    q("q_ts_peaks").collect().foreach { p =>
      val series = e(p.getLong(0))
      val i = series.indexWhere(_.getLong(1) == p.getLong(1))
      assert(i > 0 && i < series.length - 1)
      val v = series(i).getDecimal(3)
      assert(v.compareTo(series(i - 1).getDecimal(3)) > 0)
      assert(v.compareTo(series(i + 1).getDecimal(3)) > 0)
    }
  }

  test("union evolve: one key NULL per row, both sides accounted") {
    val rows = q("q_set_union_evolve").collect()
    rows.foreach(r => assert(r.isNullAt(0) ^ r.isNullAt(1)))
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, sf).count()
      + Tables.events(spark, sf).count())
  }

  test("merge schema: null-priority bucket holds exactly the odd keys") {
    val rows = q("q_source_merge_schema").collect()
    val nullRow = rows.find(_.isNullAt(0)).get
    val oddCount = Tables.orders(spark, sf)
      .where(col("o_orderkey") % 2 === 1).count()
    assert(nullRow.getLong(1) == oddCount)
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
  }

  test("stream union equals the batch twin") {
    val twin = Tables.events(spark, sf)
      .where(col("event_type").isin("purchase", "click"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
        col("n"), col("sum_v"))
      .orderBy("ws_us", "event_type")
    assert(fingerprint(q("q_stream_live_union")) == fingerprint(twin))
  }
}
