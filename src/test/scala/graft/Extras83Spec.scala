package graft

import org.apache.spark.sql.functions._

class Extras83Spec extends QuerySuiteBase {
  Seq("q_llm_cluster_size_dist", "q_evt_anomaly_days",
    "q_llm_token_len_hist", "q_evt_retention_curve")
    .foreach(checkDeclared(_))

  test("cluster size dist: sizes >= 2 (pairs imply no singletons in " +
      "the pair graph); totals reconcile with clusters") {
    val rows = q("q_llm_cluster_size_dist").collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 2)
      assert(r.getLong(2) == (r.getLong(0) - 1) * r.getLong(1))
    }
    val nClusters = q("q_llm_dedup_clusters")
      .select(col("cluster_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nClusters)
  }

  test("anomaly days: every emitted day actually violates the gate; " +
      "directions consistent") {
    val rows = q("q_evt_anomaly_days").collect()
    rows.foreach { r =>
      val (y, med, mad) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(math.abs(y - med) * 10 > mad * 30)
      assert(r.getString(4) == (if (y > med) "high" else "low"))
    }
  }

  test("token length hist: accounts for every token; lengths 1..15") {
    val rows = q("q_llm_token_len_hist").collect()
    val tot = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == tot)
    rows.foreach(r => assert(r.getLong(0) >= 1 && r.getLong(0) <= 15))
  }

  test("retention curve: user base constant; retained bounded; " +
      "rates consistent") {
    val rows = q("q_evt_retention_curve").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 7L, 14L))
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3)
        - r.getLong(2).toDouble / r.getLong(1)) < 1e-5)
    }
  }
}
