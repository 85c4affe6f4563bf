package graft

class Extras108Spec extends QuerySuiteBase {
  Seq("q_ml_confusion", "q_ml_roc_auc", "q_ml_ap", "q_ml_ks_separation",
    "q_ml_brier").foreach(checkDeclared(_))

  test("confusion: cells partition the rows; F1 is the harmonic mean") {
    val r = q("q_ml_confusion").head()
    val total = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    val rn = Tables.lineitem(spark, sf)
      .where(org.apache.spark.sql.functions.col("l_returnflag")
        .isin("R", "N")).count()
    assert(total == rn)
    val (p, rr, f1) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(math.abs(f1 - 2 * p * rr / (p + rr)) < 1e-5)
  }

  test("roc auc: in [0,1]; ~0.5 when score is uninformative") {
    val r = q("q_ml_roc_auc").head()
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
  }

  test("ap: at least the base rate (AP of a random ranking)") {
    val auc = q("q_ml_ap").head().getDouble(0)
    val m = q("q_ml_roc_auc").head()
    val base = m.getLong(0).toDouble / (m.getLong(0) + m.getLong(1))
    assert(auc >= base - 0.05)
    assert(auc <= 1.0)
  }

  test("ks: in [0,1] and 0 iff distributions identical") {
    val r = q("q_ml_ks_separation").head()
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
  }

  test("brier: bounded by p(1-p) of the base rate for the binned model") {
    val r = q("q_ml_brier").head()
    val m = q("q_ml_roc_auc").head()
    val p = m.getLong(0).toDouble / (m.getLong(0) + m.getLong(1))
    assert(r.getDouble(1) <= p * (1 - p) + 1e-6)
    assert(r.getDouble(1) >= 0)
  }
}
