package graft

import org.apache.spark.sql.functions._

class Extras78Spec extends QuerySuiteBase {
  Seq("q_llm_boilerplate", "q_llm_readability", "q_llm_stopword_profile",
    "q_llm_lcs_pairs").foreach(checkDeclared(_))

  test("boilerplate: one row per source; bp volume bounded by gram " +
      "volume; ratio consistent") {
    val rows = q("q_llm_boilerplate").collect()
    val nSrc = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length == nSrc)
    rows.foreach { r =>
      val (ng, nbp, ratio) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nbp >= 0 && nbp <= ng)
      assert(math.abs(ratio - nbp.toDouble / ng) < 1e-5)
    }
  }

  test("readability: word sums reconcile with the corpus; hard docs " +
      "bounded; pooled grade finite") {
    val rows = q("q_llm_readability").collect()
    val totWords = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("w"))
      .agg(sum(col("w"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == totWords)
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(1)) // n_hard <= n_docs
      assert(r.getLong(3) >= r.getLong(2)) // syllables >= 1 per word
      assert(!r.getDouble(6).isNaN)
    }
  }

  test("stopword profile: stopwords bounded by tokens; gate count " +
      "bounded by docs") {
    val rows = q("q_llm_stopword_profile").collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(4) <= r.getLong(1))
      val ratio = r.getDouble(5)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("lcs pairs: 28 source pairs; LCS bounded by the shorter side; " +
      "kernel agrees with a hand case") {
    val rows = q("q_llm_lcs_pairs").collect()
    assert(rows.length == 8 * 7 / 2)
    rows.foreach { r =>
      val (na, nb, l) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(l >= 0 && l <= math.min(na, nb))
      val f1 = r.getDouble(5)
      assert(f1 >= 0.0 && f1 <= 1.0)
      assert(math.abs(f1 - 2.0 * l / (na + nb)) < 1e-5)
    }
    // reference: LCS([a b c d], [b d a]) = 2 (b d)
    def lcs(x: Seq[String], y: Seq[String]): Int = {
      val dp = Array.ofDim[Int](x.length + 1, y.length + 1)
      for (i <- 1 to x.length; j <- 1 to y.length)
        dp(i)(j) =
          if (x(i - 1) == y(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(x.length)(y.length)
    }
    assert(lcs(Seq("a", "b", "c", "d"), Seq("b", "d", "a")) == 2)
    assert(lcs(Seq("a", "b"), Seq("a", "b")) == 2)
    assert(lcs(Seq("a"), Seq("b")) == 0)
  }
}
