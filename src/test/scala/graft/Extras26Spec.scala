package graft

import org.apache.spark.sql.functions._

class Extras26Spec extends QuerySuiteBase {
  Seq("q_llm_ann_recall", "q_ts_xcorr", "q_dq_psi", "q_agg_lorenz",
    "q_evt_overlap", "q_agg_diversity")
    .foreach(checkDeclared(_))

  test("ann recall: hits within [0,5], recall = hits/5") {
    val r = q("q_llm_ann_recall").head
    assert(r.getLong(0) == 5L)
    Seq((1, 2), (3, 4)).foreach { case (h, rc) =>
      assert(r.getLong(h) >= 0 && r.getLong(h) <= 5)
      assert(r.getDouble(rc) == r.getLong(h).toDouble / 5.0)
    }
  }

  test("xcorr: four lags, each |r| <= 1") {
    val rows = q("q_ts_xcorr").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    rows.foreach { r =>
      assert(r.getLong(1) > 2)
      assert(math.abs(r.getDouble(2)) <= 1.0)
    }
  }

  test("psi: probability columns sum to 1 on each side") {
    val rows = q("q_dq_psi").collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      if (!r.isNullAt(5)) // each present term is finite
        assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite)
    }
  }

  test("lorenz: cumulative share strictly increasing to exactly 1") {
    val rows = q("q_agg_lorenz").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val shares = rows.map(_.getDouble(3))
    shares.sliding(2).foreach {
      case Array(a, b) => assert(b > a)
      case _ =>
    }
    assert(shares.last == 1.0)
    // concavity of spend concentration: top decile's slice >= bottom's
    assert(rows.last.getLong(2) >= rows.head.getLong(2))
  }

  test("overlap: 10 type pairs, jaccard consistent with counts") {
    val rows = q("q_evt_overlap").collect()
    assert(rows.length == 10) // C(5,2) event types
    rows.foreach { r =>
      val (na, nb, i) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(i <= math.min(na, nb))
      assert(r.getDouble(5) == i.toDouble / (na + nb - i).toDouble)
    }
  }

  test("diversity: simpson in [0,1], segment mix real") {
    val rows = q("q_agg_diversity").collect()
    assert(rows.length == 5) // regions
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 5)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
    }
  }
}
