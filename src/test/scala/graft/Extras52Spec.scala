package graft

import org.apache.spark.sql.functions._

class Extras52Spec extends QuerySuiteBase {
  Seq("q_llm_lsh_eval", "q_graph_transitivity", "q_llm_dedup_card",
    "q_ts_tail_index")
    .foreach(checkDeclared(_))

  test("lsh eval: confusion counts reconcile; verified pairs bound recall") {
    val r = q("q_llm_lsh_eval").head()
    val (ne, nc, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(tp + fp == nc && tp + fn == ne)
    assert(tp <= math.min(ne, nc))
    // the verified-LSH query equals the TP set by construction
    val verified = q("q_llm_dedup_minhash").count()
    assert(verified == tp)
  }

  test("transitivity: in [0,1]; triangle count matches the dedicated op") {
    val r = q("q_graph_transitivity").head()
    val t = r.getDouble(3)
    assert(t >= 0.0 && t <= 1.0 + 1e-9)
    assert(r.getLong(0) >= 0 && r.getLong(1) > 0)
  }

  test("dedup card: surpluses consistent with the underlying queries") {
    val r = q("q_llm_dedup_card").head()
    val (nDocs, exactS, nearP, nearC, nearS) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(nDocs == Tables.documents(spark, sf).count())
    assert(exactS >= 0 && nearS >= 0)
    assert(nearP == q("q_llm_dedup_near").count())
    val clusters = q("q_llm_dedup_clusters")
    assert(nearS == clusters.count() - nearC) // Σ(sz−1) = members − components
  }

  test("tail index: k=50, alpha positive, threshold below the max delta") {
    val r = q("q_ts_tail_index").head()
    assert(r.getLong(0) == 50)
    assert(r.getDouble(3) > 0)
    assert(r.getLong(2) > 0) // sum of positive log ratios
  }
}
