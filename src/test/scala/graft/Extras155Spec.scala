package graft

import org.apache.spark.sql.functions._

class Extras155Spec extends QuerySuiteBase {
  Seq("q_dq_l_diversity", "q_dq_t_closeness", "q_ml_auc_delong",
    "q_source_xml").foreach(checkDeclared(_))

  test("l_diversity: l values bounded by the 5-priority domain") {
    val rs = q("q_dq_l_diversity").collect()
    rs.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 5)
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val lmin = rs.head.getLong(2)
    assert(rs.map(_.getLong(0)).min == lmin,
      "l_min must equal the smallest histogram bucket")
  }

  test("t_closeness: three worst classes, t in [0,1], descending") {
    val rs = q("q_dq_t_closeness").collect().sortBy(_.getLong(0))
    assert(rs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val ts = rs.map(_.getDouble(5))
    assert(ts.forall(t => t >= 0.0 && t <= 1.0))
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b })
  }

  test("delong: CI brackets the point AUC and matches q_ml_roc_auc") {
    val r = q("q_ml_auc_delong").collect().head
    val (auc, se, lo, hi) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(se > 0.0)
    assert(lo < auc && auc < hi)
    val point = q("q_ml_roc_auc").collect().head.getDouble(2)
    assert(math.abs(auc - point) < 1e-9,
      "DeLong point estimate must equal the midrank AUC identity")
  }

  test("xml: round-trip preserves every customer row exactly") {
    val got = q("q_source_xml").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long"), col("c_mktsegment"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == expect)
  }
}
