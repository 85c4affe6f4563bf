package graft

class Extras97Spec extends QuerySuiteBase {
  Seq("q_agg_cochran_armitage", "q_agg_mantel_haenszel", "q_agg_mh_chi2",
    "q_evt_nelson_aalen").foreach(checkDeclared(_))

  test("cochran-armitage: counts cover all orders, z finite") {
    val r = q("q_agg_cochran_armitage").head()
    val orders = Tables.orders(spark, sf).count()
    assert(r.getLong(0) == orders)
    assert(r.getLong(1) > 0 && r.getLong(1) < orders)
    assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
  }

  test("mantel-haenszel: OR positive, log consistent") {
    val r = q("q_agg_mantel_haenszel").head()
    assert(r.getLong(0) >= 5)
    assert(r.getDouble(1) > 0)
    assert(math.abs(math.log(r.getDouble(1)) - r.getDouble(2)) < 1e-4)
  }

  test("mh chi2: nonnegative with the same strata count") {
    val r = q("q_agg_mh_chi2").head()
    assert(r.getLong(0) == q("q_agg_mantel_haenszel").head().getLong(0))
    assert(r.getDouble(2) >= 0)
  }

  test("nelson-aalen: hazard is nondecreasing, risk set shrinks") {
    val rows = q("q_evt_nelson_aalen").collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(3) <= b.getDouble(3) + 1e-12)
        assert(a.getLong(1) >= b.getLong(1))
      case _ =>
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }
}
