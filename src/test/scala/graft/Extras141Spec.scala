package graft

import org.apache.spark.sql.functions._

class Extras141Spec extends QuerySuiteBase {
  Seq("q_sql_groupby_all", "q_sql_values_join", "q_evt_adstock",
    "q_source_csv_newlines").foreach(checkDeclared(_))

  test("group by all equals the explicit grouping") {
    val all = fingerprint(q("q_sql_groupby_all"))
    val explicit = fingerprint(
      Tables.orders(spark, sf)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(Det.dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("o_orderstatus", "o_orderpriority"))
    assert(all == explicit)
  }

  test("values join covers every mapped segment, none unmapped") {
    val rows = q("q_sql_values_join").collect()
    assert(rows.map(_.getString(0)).toSet == Set("wheels", "metal", "home"))
    val total = rows.map(_.getLong(1)).sum
    val n = Tables.customer(spark, sf).count()
    assert(total == n, s"mapped $total != customers $n")
  }

  test("adstock: bounded by 2x daily revenue window sum, >= same-day") {
    val rows = q("q_evt_adstock").collect()
    rows.foreach { r =>
      val (y, ad) = (r.getLong(1), r.getLong(2))
      assert(ad >= y)           // includes the k=0 term in full
      assert(ad <= 2 * rows.map(_.getLong(1)).max + y)
    }
  }

  test("csv newlines: one embedded newline per part row survives") {
    val r = q("q_source_csv_newlines").head()
    val n = Tables.part(spark, sf).count()
    assert(r.getLong(0) == n)
    assert(r.getLong(3) == n, s"newlines ${r.getLong(3)} != rows $n")
  }
}
