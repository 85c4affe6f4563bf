package graft

import org.apache.spark.sql.functions._

class Extras150Spec extends QuerySuiteBase {
  Seq("q_graph_core_decomp", "q_ts_esd_outliers", "q_ts_dominant_period",
    "q_ml_isotonic_calibration", "q_sql_named_window", "q_llm_curriculum")
    .foreach(checkDeclared(_))

  test("core decomp: monotone — higher k never keeps more nodes/edges") {
    val rows = q("q_graph_core_decomp").collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to 4L))
    rows.sliding(2).foreach { case Array((_, n1, m1), (_, n2, m2)) =>
      assert(n2 <= n1 && m2 <= m1)
    }
  }

  test("esd outliers: rounds pick distinct days, deviations shrink-safe") {
    val rows = q("q_ts_esd_outliers").collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 3)
    assert(rows.map(_.get(1)).distinct.length == 3)
    // n decrements by one per removal round
    val ns = rows.map(_.getLong(4))
    assert(ns(1) == ns(0) - 1 && ns(2) == ns(1) - 1)
  }

  test("dominant period: full lag spectrum, rank is the ac_num order") {
    val rows = q("q_ts_dominant_period").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sorted.toSeq == (2L to 60L))
    val byRank = rows.sortBy(_._1)
    byRank.sliding(2).foreach { case Array((_, _, a1), (_, _, a2)) =>
      assert(a1 >= a2)
    }
  }

  test("isotonic calibration: nondecreasing fit, pooled-mean bounds") {
    val rows = q("q_ml_isotonic_calibration").collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val rates = rows.map(_.getDouble(3))
    rates.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-9, s"isotonic violated: $a then $b")
    }
    // global mean is preserved inside [min, max] of the fit
    val (xs, ns) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(1)).sum)
    val gmean = xs.toDouble / ns
    assert(rates.head <= gmean + 1e-9 && rates.last >= gmean - 1e-9)
  }

  test("named window: rank and running count agree per customer") {
    val rows = q("q_sql_named_window").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      // unique (date, orderkey) ordering → rank == running count
      sorted.foreach { case (_, rnk, runN) => assert(rnk == runN) }
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
    }
  }

  test("curriculum: stages cover the corpus, cum_words telescopes") {
    val rows = q("q_llm_curriculum").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to 4L))
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == docs)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) == cum)
    }
    // curriculum axis: mean words nondecreasing across stages
    val means = rows.map(_.getDouble(4))
    means.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
  }
}
