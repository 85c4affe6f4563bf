package graft

import org.apache.spark.sql.functions._

class Extras30Spec extends QuerySuiteBase {
  Seq("q_dq_uniqueness", "q_dq_freshness", "q_llm_novelty",
    "q_source_csv_gzip", "q_llm_vocab_growth", "q_ts_concurrency")
    .foreach(checkDeclared(_))

  test("uniqueness: true keys pass, the non-key composite is caught") {
    val m = q("q_dq_uniqueness").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m.size == 4)
    Seq("events.event_id", "documents.doc_id", "orders.o_orderkey")
      .foreach(k => assert(m(k)._3 == 0, s"$k has dup rows"))
    // the synthetic lineitem violates (l_orderkey, l_linenumber) — the
    // audit's whole job is to report that, not assume it away
    val li = m("lineitem.(l_orderkey,l_linenumber)")
    assert(li._3 > 0 && li._3 == li._1 - li._2)
  }

  test("freshness: one stream is the global max, lags non-negative") {
    val rows = q("q_dq_freshness").collect()
    assert(rows.length == 5)
    assert(rows.count(_.getLong(2) == 0) >= 1)
    rows.foreach(r => assert(r.getLong(2) >= 0))
  }

  test("novelty: first doc fully novel, ratios in (0,1]") {
    val rows = q("q_llm_novelty").collect()
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(2) == first.getLong(1)) // every gram fresh
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("csv gzip: per-brand sums survive the compressed round-trip") {
    val rows = q("q_source_csv_gzip").collect()
    val truth = Tables.part(spark, sf)
      .groupBy(col("p_brand"))
      .agg(sum((col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap == truth)
  }

  test("vocab growth: monotone non-decreasing, 100% = full vocab") {
    val rows = q("q_llm_vocab_growth").collect().sortBy(_.getInt(0))
    assert(rows.length == 4)
    val vocab = rows.map(_.getLong(2))
    assert(vocab.sliding(2).forall(p => p(0) <= p(1)))
    val full = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct(col("w"))).head.getLong(0)
    assert(vocab.last == full)
  }

  test("concurrency: per-day peak bounded by that day's touching sessions") {
    val rows = q("q_ts_concurrency").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 1))
    // global peak can never exceed the total session count
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).max <= total)
  }
}
