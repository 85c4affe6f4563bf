package graft

import org.apache.spark.sql.functions._

class Extras48Spec extends QuerySuiteBase {
  Seq("q_llm_containment", "q_evt_attribution_first", "q_win_expanding",
    "q_llm_lm_holdout")
    .foreach(checkDeclared(_))

  test("containment: integer membership predicate; superset of near-dups") {
    val cont = q("q_llm_containment").collect()
    cont.foreach { r =>
      val (i, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(i * 10 >= na * 8 || i * 10 >= nb * 8)
      assert(i <= math.min(na, nb))
    }
    // every Jaccard-0.6 near-dup pair also passes 0.8 containment at the
    // planted >= 0.89 similarity level
    val near = q("q_llm_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cset = cont.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.subsetOf(cset))
  }

  test("first touch: shares sum to 1; purchase never credits itself") {
    val rows = q("q_evt_attribution_first").collect()
    assert(rows.nonEmpty)
    assert(!rows.map(_.getString(0)).contains("purchase"))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-5)
  }

  test("expanding: monotone cum_n/cum max; mean reconciles") {
    val rows = q("q_win_expanding").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val o = rs.sortBy(_.getLong(2))
      o.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) == a.getLong(2) + 1)
          assert(b.getLong(4) >= a.getLong(4)) // running max monotone
        case _ =>
      }
    }
    rows.foreach(r => assert(
      math.abs(r.getDouble(5) - r.getLong(3).toDouble / r.getLong(2))
        < 1e-5))
  }

  test("lm holdout: unseen rate bounded; bits positive") {
    val rows = q("q_llm_lm_holdout").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) > 0)     // cross-entropy positive
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
    }
  }
}
