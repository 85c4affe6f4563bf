package graft

import org.apache.spark.sql.functions._

class Extras146Spec extends QuerySuiteBase {
  Seq("q_evt_attribution_decay", "q_dq_domain", "q_agg_trimean",
    "q_fn_array3").foreach(checkDeclared(_))

  test("decay attribution: shares sum to 1 over non-purchase types") {
    val rows = q("q_evt_attribution_decay").collect()
    assert(!rows.map(_.getString(0)).contains("purchase"))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    rows.foreach(r => assert(r.getLong(2) > 0))
  }

  test("domain: both whitelists hold on the synthetic tables") {
    val rows = q("q_dq_domain").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(2) == 0 && r.getBoolean(3), s"domain drift: $r")
    }
  }

  test("trimean sits between q1 and q3, quartiles ordered") {
    val r = q("q_agg_trimean").head()
    val (q1, q2, q3, tm) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(q1 <= q2 && q2 <= q3)
    assert(tm * 100 >= q1 - 1 && tm * 100 <= q3 + 1)
  }

  test("array3: identities over the generated sequences") {
    val r = q("q_fn_array3").head()
    val n = r.getLong(0)
    // rev_head == last_el (reverse()[1] is the last element)
    assert(r.getLong(3) == r.getLong(4))
    // every row's sequence 1..k contains its own max -> contains_total = n
    assert(r.getLong(5) == n)
  }
}
