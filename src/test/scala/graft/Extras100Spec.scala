package graft

import org.apache.spark.sql.functions._

class Extras100Spec extends QuerySuiteBase {
  Seq("q_llm_bm25", "q_ts_imr_chart", "q_ts_western_electric",
    "q_agg_newsvendor").foreach(checkDeclared(_))

  test("bm25: 20 docs, scores positive and non-increasing") {
    val rows = q("q_llm_bm25").collect()
    assert(rows.length == 20)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(1) >= b.getDouble(1))
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(1) > 0))
  }

  test("bm25: the rare term 'dup' pushes its docs up the ranking") {
    val top = q("q_llm_bm25").collect().map(_.getLong(0)).toSet
    val dupDocs = Tables.documents(spark, sf)
      .where(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // high-idf term: most of its docs should rank in the top 20
    assert((top intersect dupDocs).size >= math.min(10, dupDocs.size) / 2)
  }

  test("imr chart: limits bracket the center, violations sane") {
    val r = q("q_ts_imr_chart").head()
    assert(r.getDouble(3) < r.getDouble(1) && r.getDouble(1) < r.getDouble(2))
    assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(0))
  }

  test("western electric: rule counts bounded by day count") {
    val r = q("q_ts_western_electric").head()
    val n = r.getLong(0)
    (1 to 4).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) <= n))
  }

  test("newsvendor: q_star is the 0.75 ECDF crossing") {
    val r = q("q_agg_newsvendor").head()
    assert(r.getDouble(2) >= 0.75)
    val dems = Tables.lineitem(spark, sf)
      .groupBy(to_date(col("l_shipdate")))
      .agg(sum(col("l_quantity").cast("long")).as("d"))
      .collect().map(_.getLong(1)).sorted
    val idx = math.ceil(dems.length * 0.75).toInt - 1
    assert(r.getLong(1) == dems(idx))
  }
}
