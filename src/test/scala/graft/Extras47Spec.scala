package graft

import org.apache.spark.sql.functions._

class Extras47Spec extends QuerySuiteBase {
  Seq("q_llm_dedup_bloom_prefilter", "q_ts_sax", "q_llm_cluster_purity",
    "q_agg_percentile_cont")
    .foreach(checkDeclared(_))

  test("bloom prefilter: no false negatives — bloom_hits >= true_hits") {
    val rows = q("q_llm_dedup_bloom_prefilter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nsh, bh, th) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bh <= nsh)
      assert(bh >= th, "a bloom filter can never miss a present key")
      assert(r.getBoolean(4) == (bh > 0))
    }
    // the filter actually prunes at this scale: some docs are non-candidates
    // OR everything genuinely overlaps — tolerate either, but false
    // positives must stay a small minority of probed shingles
    val fp = rows.map(r => r.getLong(2) - r.getLong(3)).sum.toDouble
    val probed = rows.map(_.getLong(1)).sum.toDouble
    assert(fp / probed < 0.25, s"fp rate ${fp / probed}")
  }

  test("sax: quartile symbols balanced within 1; segments chronological") {
    val rows = q("q_ts_sax").collect()
    assert(rows.nonEmpty)
    val counts = rows.groupBy(_.getString(3)).view.mapValues(_.size)
    assert(counts.keySet.subsetOf(Set("a", "b", "c", "d")))
    assert(counts.values.max - counts.values.min <= 1)
    // symbol a holds the smallest segment sums, d the largest
    val aMax = rows.filter(_.getString(3) == "a").map(_.getLong(2)).max
    val dMin = rows.filter(_.getString(3) == "d").map(_.getLong(2)).min
    assert(aMax <= dMin)
  }

  test("cluster purity: majority shares; sizes cover the corpus") {
    val rows = q("q_llm_cluster_purity").collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (size, mn, p) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(mn <= size)
      assert(p >= 1.0 / 8 && p <= 1.0 + 1e-9) // majority ≥ uniform share
      assert(math.abs(p - mn.toDouble / size) < 1e-5)
    }
  }

  test("percentile_cont: quartiles bracket the discrete ones, ordered") {
    val rows = q("q_agg_percentile_cont").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (q25, q50, q75) =
        (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(q25 <= q50 && q50 <= q75)
      // quarter-cent integers reconstruct the doubles exactly
      assert(q25 == r.getLong(2) / 4.0)
      assert(q50 == r.getLong(3) / 4.0)
      assert(q75 == r.getLong(4) / 4.0)
    }
  }
}
