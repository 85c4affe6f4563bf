package graft

class Extras116Spec extends QuerySuiteBase {
  Seq("q_agg_by_fdr", "q_agg_hartley_fmax", "q_ts_jenks_breaks")
    .foreach(checkDeclared(_))

  test("by-fdr: ranks are a permutation; discoveries form a prefix") {
    val rows = q("q_agg_by_fdr").collect()
    val ranks = rows.map(_.getLong(4)).sorted
    assert(ranks.toSeq == (1L to rows.length).toSeq)
    val flags = rows.sortBy(_.getLong(4)).map(_.getInt(5))
    val firstZero = flags.indexOf(0)
    if (firstZero >= 0)
      assert(flags.drop(firstZero).forall(_ == 0))
  }

  test("hartley: f_max >= 1 with five groups") {
    val r = q("q_agg_hartley_fmax").head()
    assert(r.getLong(0) == 5)
    assert(r.getDouble(3) >= 1.0)
  }

  test("jenks: goodness of fit in [0,1); split nontrivial") {
    val r = q("q_ts_jenks_breaks").head()
    assert(r.getDouble(3) >= 0 && r.getDouble(3) < 1)
    assert(r.getLong(1) > 0)
  }
}
