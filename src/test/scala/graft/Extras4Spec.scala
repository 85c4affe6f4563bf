package graft

class Extras4Spec extends QuerySuiteBase {
  Seq("q_sql_q4", "q_sql_q8", "q_sql_q12", "q_sql_q13",
    "q_sql_q15", "q_sql_q17", "q_sql_q19", "q_sql_q22")
    .foreach(checkDeclared(_))
  // sf0.001 has 10 suppliers, none in NATION_1/NATION_2 (verified against
  // the DuckDB oracle), so the two supplier-nation queries are legitimately
  // empty at smoke scale; the sf0.01 correctness gate sees 4 and 3 rows.
  Seq("q_sql_q7", "q_sql_q21").foreach(checkDeclared(_, minRows = 0))

  private def physical(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("Q4/Q21/Q22 subqueries decorrelate to semi/anti joins, not loops") {
    // The scale contract for the EXISTS family: Catalyst must rewrite the
    // correlated subqueries into hash-joinable semi/anti joins. A plan
    // that kept a per-row subquery (CartesianProduct / nested loop over
    // the fact table) would be quadratic at 100 TB.
    val q4 = physical("q_sql_q4")
    assert(q4.contains("LeftSemi"), s"Q4 should semi-join:\n$q4")
    val q21 = physical("q_sql_q21")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      s"Q21 should contain a semi AND an anti join:\n$q21")
    val q22 = physical("q_sql_q22")
    assert(q22.contains("LeftAnti"), s"Q22 should anti-join:\n$q22")
    Seq(q4, q21, q22).foreach(p =>
      assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p"))
  }

  test("Q13's LEFT JOIN keeps zero-order customers") {
    val rows = q("q_sql_q13").collect()
    val counts = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Customers × orders at sf0.001: every count bucket sums back to the
    // full customer table — the outer join lost nobody.
    assert(counts.values.sum == Tables.customer(spark, sf).count())
  }

  test("Q15 returns the argmax supplier(s) of the revenue CTE") {
    val rows = q("q_sql_q15").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "all returned suppliers must share the max")
  }
}
