package graft

import org.apache.spark.sql.functions._

class Extras50Spec extends QuerySuiteBase {
  Seq("q_evt_survival", "q_agg_odds_ratio", "q_graph_harmonic",
    "q_fn_slug")
    .foreach(checkDeclared(_))

  test("survival: monotone non-increasing curve in (0, 1]; risk set shrinks") {
    val rows = q("q_evt_survival").collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getDouble(5))
    s.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9)
      case _ =>
    }
    assert(s.forall(v => v > 0 && v <= 1.0))
    val risk = rows.map(_.getLong(3))
    risk.sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ =>
    }
    // at-risk never exceeds the number of customers
    val nCust = Tables.orders(spark, sf).select("o_custkey")
      .distinct().count()
    assert(risk.head <= nCust)
  }

  test("odds ratio: cells cover all orders; OR reconstructs") {
    val r = q("q_agg_odds_ratio").head()
    val (a, b, c, dd) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(a + b + c + dd == Tables.orders(spark, sf).count())
    assert(r.getLong(4) == a * dd * 1000000L / (b * c))
    assert(r.getDouble(6) > 0) // SE positive
  }

  test("harmonic: hop counts disjoint; sixths reconstruct") {
    val rows = q("q_graph_harmonic").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2, n3, hs) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hs == n1 * 6 + n2 * 3 + n3 * 2)
      assert(math.abs(r.getDouble(5) - hs / 6.0) < 1e-9)
    }
  }

  test("slug: lowercase alnum and single dashes only, no edge dashes") {
    val rows = q("q_fn_slug").collect()
    assert(rows.nonEmpty)
    val re = "^[a-z0-9]+(-[a-z0-9]+)*$".r
    rows.foreach { r =>
      val slug = r.getString(2)
      assert(re.findFirstIn(slug).isDefined, s"bad slug '$slug'")
    }
  }
}
