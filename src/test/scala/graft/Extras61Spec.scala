package graft

import org.apache.spark.sql.functions._

class Extras61Spec extends QuerySuiteBase {
  Seq("q_join_pit", "q_ts_hhi_trend")
    .foreach(checkDeclared(_))

  test("pit: every purchase with a prior state is attributed exactly once") {
    val rows = q("q_join_pit").collect()
    assert(rows.nonEmpty)
    val attributed = rows.map(_.getLong(1)).sum
    // purchases whose user has ANY event strictly before them
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pe"),
        col("us").as("pus"))
    val withPrior = purchases.join(ev,
        col("user_id") === col("pu") && col("us") < col("pus"))
      .select("pu", "pe").distinct().count()
    assert(attributed == withPrior)
  }

  test("hhi trend: concentration within [1/n_groups, 1] up to truncation") {
    val rows = q("q_ts_hhi_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ng, hhi) = (r.getLong(1), r.getDouble(4))
      assert(hhi <= 1.0 + 1e-9)
      assert(hhi >= 1.0 / ng - 0.01) // truncation can only lose mass
    }
  }
}
