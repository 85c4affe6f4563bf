package graft

import org.apache.spark.sql.functions._

class Extras151Spec extends QuerySuiteBase {
  Seq("q_sql_order_by_all", "q_ts_snaive", "q_ts_records",
    "q_evt_cart_abandonment").foreach(checkDeclared(_))

  test("order by all: rows arrive fully sorted on every column") {
    val rows = q("q_sql_order_by_all").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == rows.sortBy(identity).toSeq)
  }

  test("snaive: err is exactly v - lag7, window is 28 days") {
    val rows = q("q_ts_snaive").collect()
    assert(rows.length == 28)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("records: values strictly increase, gaps positive after the first") {
    val rows = q("q_ts_records").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    val vs = rows.map(_.getLong(2))
    vs.sliding(2).foreach { case Array(a, b) => assert(b > a) }
    assert(rows.head.isNullAt(3))
    rows.tail.foreach(r => assert(r.getLong(3) >= 1))
  }

  test("cart abandonment: abandoned <= carts, rate consistent") {
    val rows = q("q_evt_cart_abandonment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (carts, ab) = (r.getLong(1), r.getLong(2))
      assert(ab >= 0 && ab <= carts)
      assert(math.abs(r.getDouble(3) - ab.toDouble / carts) < 1e-6)
    }
  }
}
