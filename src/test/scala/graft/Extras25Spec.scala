package graft

import org.apache.spark.sql.functions._

class Extras25Spec extends QuerySuiteBase {
  Seq("q_scan_sample_fixed", "q_llm_minhash_fidelity", "q_evt_burst",
    "q_source_json_nested", "q_ts_pattern", "q_llm_filter_funnel")
    .foreach(checkDeclared(_))

  test("fixed sample: exactly 100 rows, hashes ascending, keys real") {
    val rows = q("q_scan_sample_fixed").collect()
    assert(rows.length == 100)
    val pris = rows.map(_.getLong(3))
    assert(pris.sameElements(pris.sorted))
    val keys = rows.map(_.getLong(0)).toSet
    val present = Tables.orders(spark, sf)
      .where(col("o_orderkey").isin(keys.toSeq: _*)).count()
    assert(present == 100)
  }

  test("minhash fidelity: est/jaccard in [0,1], est from 16 coords") {
    val rows = q("q_llm_minhash_fidelity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(2)
      val j = r.getDouble(3)
      assert(est >= 0 && est <= 1.0)
      assert(j >= 0 && j <= 1.0)
      assert((est * 16).round.toDouble == est * 16) // k/16 grid
    }
  }

  test("burst days: each flagged count strictly above its own mean") {
    val rows = q("q_evt_burst").collect()
    rows.foreach { r =>
      assert(r.getLong(2).toDouble > r.getDouble(3))
    }
  }

  test("json nested: exploded totals equal the base-table join") {
    val rows = q("q_source_json_nested").collect()
    val truth = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == truth.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) == truth(r.getString(0))) // n_items
      assert(r.getLong(1) <= r.getLong(2))          // orders <= items
    }
  }

  test("pattern: every match is a strict V in the daily series") {
    val rows = q("q_ts_pattern").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(1)) // trough < start
      assert(r.getLong(2) < r.getLong(3)) // trough < end
    }
  }

  test("funnel: monotone nonincreasing stage counts from total") {
    val r = q("q_llm_filter_funnel").head
    val n = (0 to 4).map(r.getLong)
    assert(n(0) == Tables.documents(spark, sf).count())
    n.sliding(2).foreach { case Seq(a, b) => assert(b <= a); case _ => }
  }
}
