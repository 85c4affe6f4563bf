package graft

import org.apache.spark.sql.functions._

class Extras140Spec extends QuerySuiteBase {
  Seq("q_llm_cdc_chunk", "q_stream_live_complete", "q_ts_page_hinkley_two",
    "q_scan_sample_weighted").foreach(checkDeclared(_))

  test("cdc chunk: lengths positive, total tokens conserved") {
    val rows = q("q_llm_cdc_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (len, n) => len >= 1 && n >= 1 })
    val totalTokens = rows.map { case (len, n) => len * n }.sum
    val expected = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(totalTokens == expected,
      s"chunked tokens $totalTokens != corpus tokens $expected")
  }

  test("complete-mode stream equals the batch aggregate") {
    val live = q("q_stream_live_complete").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_v"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(live.toSeq == batch.toSeq)
  }

  test("two-sided PH: up row matches the one-sided key, stats nonneg") {
    val two = q("q_ts_page_hinkley_two").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDate(3).toString)).toMap
    val one = q("q_ts_page_hinkley").head()
    assert(two("up")._1 == one.getLong(0))
    assert(two("up")._2 == one.getLong(1))
    assert(two("up")._3 == one.getDate(2).toString)
    assert(two("down")._2 >= 0L)
  }

  test("weighted sample: high-spend orders overrepresented vs uniform") {
    val picked = q("q_scan_sample_weighted").collect()
    assert(picked.length == 100)
    val pickedMean = picked.map(_.getLong(1)).sum.toDouble / picked.length
    val corpusMean = Tables.orders(spark, sf)
      .agg(avg((Det.dec(col("o_totalprice")) * 100).cast("long")))
      .head().getDouble(0)
    assert(pickedMean > corpusMean,
      s"weighted sample mean $pickedMean not above corpus mean $corpusMean")
  }
}
