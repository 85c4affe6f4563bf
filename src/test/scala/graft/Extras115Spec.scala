package graft

class Extras115Spec extends QuerySuiteBase {
  Seq("q_agg_permutation_test", "q_ts_sax_paa16", "q_agg_negbin_fit")
    .foreach(checkDeclared(_))

  test("permutation test: 50 perms, p in (0, 1]") {
    val r = q("q_agg_permutation_test").head()
    assert(r.getLong(1) == 50)
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 50)
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1)
  }

  test("sax: 16 segments, z-ordered symbols consistent") {
    val rows = q("q_ts_sax_paa16").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val (z, sym) = (r.getDouble(2), r.getString(3))
      val expect = if (z < -0.6745) "a" else if (z < 0) "b"
        else if (z < 0.6745) "c" else "d"
      assert(sym == expect)
    }
  }

  test("negbin: overdispersed counts give positive r and p in (0,1)") {
    val r = q("q_agg_negbin_fit").head()
    assert(r.getDouble(2) > r.getDouble(1)) // var > mean
    assert(r.getDouble(3) > 0)
    assert(r.getDouble(4) > 0 && r.getDouble(4) < 1)
  }
}
