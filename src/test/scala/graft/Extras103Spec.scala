package graft

import org.apache.spark.sql.functions._

class Extras103Spec extends QuerySuiteBase {
  Seq("q_llm_mtld", "q_llm_dispersion", "q_llm_token_gini",
    "q_llm_simpson_diversity").foreach(checkDeclared(_))

  test("mtld: positive, bounded by the longest doc") {
    val rows = q("q_llm_mtld").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 99.0)
    }
  }

  test("mtld: kernel replays on a hand-built text") {
    // "a b a a" with threshold 0.72: after t3 ttr=2/3<0.72 -> factor,
    // reset; remainder "a" has ttr 1 -> partial 0; denom 1 -> mtld 4
    val ws = Seq("a", "b", "a", "a")
    var fcnt = 0L; var len = 0L; var dist = 0L
    val seen = scala.collection.mutable.HashSet.empty[String]
    ws.foreach { w =>
      len += 1
      if (seen.add(w)) dist += 1
      if (dist * 25 < len * 18) { fcnt += 1; seen.clear(); len = 0; dist = 0 }
    }
    assert(fcnt == 1 && len == 1 && dist == 1)
  }

  test("dispersion: every token covered, D > 0") {
    val rows = q("q_llm_dispersion").collect()
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    assert(rows.length == vocab)
    rows.foreach(r => assert(r.getDouble(2) > 0))
  }

  test("token gini: in [0, 1)") {
    val r = q("q_llm_token_gini").head()
    assert(r.getDouble(2) >= 0 && r.getDouble(2) < 1)
  }

  test("simpson diversity: in (0, 1) per source") {
    val rows = q("q_llm_simpson_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) > 0 && r.getDouble(2) < 1))
  }
}
