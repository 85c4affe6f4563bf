package graft

import org.apache.spark.sql.functions._

class Extras90Spec extends QuerySuiteBase {
  Seq("q_llm_rake", "q_ts_engle_granger", "q_ts_run_length_dist",
    "q_dq_k_anonymity", "q_llm_js_sources").foreach(checkDeclared(_))

  test("rake: 20 phrases, no stopwords inside, scores descending") {
    val rows = q("q_llm_rake").collect()
    assert(rows.length == 20)
    val stops = Set("a", "the", "and", "of", "to", "in", "is", "it")
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.nonEmpty && words.length <= 4)
      assert(words.forall(w => !stops.contains(w)))
    }
    val scores = rows.map(_.getLong(2))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("engle-granger: gamma negative (residuals mean-revert) and t finite") {
    val r = q("q_ts_engle_granger").head()
    assert(r.getDouble(3) < 0)
    assert(!r.getDouble(4).isNaN && r.getDouble(4) < 0)
  }

  test("run length dist: total run length mass equals move count") {
    val rows = q("q_ts_run_length_dist").collect()
    val totalMoves = rows.map(r => r.getLong(1) * r.getLong(2)).sum
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("dt"))
    val moves = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .withColumn("dy", col("y") - lag(col("y"), 1).over(w))
      .where(col("dy").isNotNull && col("dy") =!= 0)
      .count()
    assert(totalMoves == moves)
  }

  test("k-anonymity: class sizes cover the table; share in [0,1]") {
    val r = q("q_dq_k_anonymity").head()
    val nCust = Tables.customer(spark, sf).count()
    assert(r.getLong(1) == nCust)
    assert(r.getLong(2) >= 1)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
  }

  test("jsd: within [0, ln 2]; sources distinct") {
    val r = q("q_llm_js_sources").head()
    assert(r.getString(0) != r.getString(1))
    val jsd = r.getDouble(5)
    assert(jsd >= 0 && jsd <= math.log(2.0) + 1e-9)
  }
}
