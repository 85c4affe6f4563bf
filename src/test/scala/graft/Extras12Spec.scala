package graft

import org.apache.spark.sql.functions._

class Extras12Spec extends QuerySuiteBase {
  Seq("q_evt_retention", "q_llm_entropy", "q_llm_colloc_pmi",
    "q_llm_kanon", "q_agg_heavyhitters").foreach(checkDeclared(_))

  test("retention: week-0 cohort sizes sum to the distinct user count") {
    val r = q("q_evt_retention")
    val wk0 = r.where(col("wk") === 0).agg(sum("n_users")).head().getLong(0)
    val users = Tables.events(spark, sf)
      .select(countDistinct("user_id")).head().getLong(0)
    assert(wk0 == users, s"week-0 mass $wk0 != $users users")
    // retention can never exceed the cohort's week-0 size
    val bad = r.as("a").join(
        r.where(col("wk") === 0)
          .select(col("cohort_us"), col("n_users").as("w0")), "cohort_us")
      .where(col("n_users") > col("w0")).count()
    assert(bad == 0, s"$bad cells exceed their cohort size")
  }

  test("entropy bounds: 0 <= H <= log2(n_distinct)") {
    val bad = q("q_llm_entropy")
      .where(col("entropy") < -1e-6
        || col("entropy") > log2(col("n_distinct")) + 1e-6)
      .count()
    assert(bad == 0, s"$bad docs violate entropy bounds")
  }

  test("pmi: symmetric-marginal sanity — sum of n_ab never exceeds N") {
    val r = q("q_llm_colloc_pmi")
    val tot = Tables.documents(spark, sf)
      .select((size(split(col("text"), " ")) - 1).as("nb"))
      .agg(sum("nb")).head().getLong(0)
    val kept = r.agg(sum("n_ab")).head().getLong(0)
    assert(kept <= tot, s"kept bigrams $kept exceed corpus total $tot")
  }

  test("kanon: group sizes sum to the customer count, risky = n<10") {
    val r = q("q_llm_kanon")
    assert(r.agg(sum("n")).head().getLong(0)
      == Tables.customer(spark, sf).count())
    assert(r.where(col("risky") =!= (col("n") < 10)).count() == 0)
  }

  test("heavy hitters exceed 1.03x the uniform share, and exist") {
    val r = q("q_agg_heavyhitters").collect()
    assert(r.nonEmpty, "no heavy hitters at this sf — threshold too high")
    val c = Tables.lineitem(spark, sf).groupBy("l_suppkey").count()
    val tot = c.agg(sum("count")).head().getLong(0)
    val k = c.count()
    r.foreach { row =>
      assert(row.getLong(1) * k * 100 >= tot * 103,
        s"supplier ${row.getLong(0)} below the declared threshold")
    }
  }
}
