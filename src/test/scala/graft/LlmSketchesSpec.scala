package graft

import org.apache.spark.sql.functions._

class LlmSketchesSpec extends QuerySuiteBase {
  Seq("q_llm_dedup_minhash", "q_llm_simhash", "q_llm_simhash_pairs",
    "q_llm_ann_ivf", "q_agg_approx_distinct", "q_llm_simhash_lsh",
    "q_llm_dedup_embed_lsh", "q_llm_ann_lsh_adaptive")
    .foreach(checkDeclared(_))

  test("adaptive ANN: k follows the integer bucket-size formula") {
    val rows = q("q_llm_ann_lsh_adaptive").collect()
    assert(rows.length == 5)
    val n = Tables.embeddings(spark, sf).count()
    val expectK = (0 until 8).count(j => n > (64L << j))
    rows.foreach { r =>
      assert(r.getInt(1) == expectK, s"k=${r.getInt(1)}, want $expectK")
      assert(r.getLong(0) != 0L) // the query vector never returns itself
    }
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("embed-LSH pairs are a subset of the exact pairs, scores identical") {
    // LSH prunes candidates; it must never invent a pair or alter a
    // score. (Recall at this fixture's low 0.35 threshold is ~50% by the
    // hyperplane collision formula — the fixture has no high-similarity
    // cluster structure; at a true near-dup threshold recall approaches
    // 1. The subset property is what must hold unconditionally.)
    val exact = q("q_llm_dedup_embed").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("score")).toMap
    val lsh = q("q_llm_dedup_embed_lsh").collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(exact.get(k).contains(r.getAs[Double]("score")),
        s"LSH pair $k not in exact result (or score differs)")
    }
  }

  test("simhash Hamming-LSH banding returns EXACTLY the all-pairs result") {
    // 7 covering bands guarantee (pigeonhole) that any pair within
    // Hamming radius 6 shares a band — so unlike probabilistic MinHash
    // banding, this rewrite must be lossless at its radius. The radius-6
    // ground truth is the all-pairs query filtered down.
    val exact = q("q_llm_simhash_pairs")
      .where(col("hamming") <= 6).collect().map(_.toString).toSeq
    val banded = q("q_llm_simhash_lsh").collect().map(_.toString).toSeq
    assert(banded.nonEmpty && banded == exact)
  }

  test("minhash-LSH recall: finds the same pairs as the exact join") {
    val exact = q("q_llm_dedup_near").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = q("q_llm_dedup_minhash").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are exact-verified, so no false positives ever:
    assert(lsh.subsetOf(exact))
    // At J >= 0.89 with 4x4 banding, P(miss) < 2% per pair — demand
    // near-perfect recall on the 28 planted pairs.
    assert(lsh.size >= exact.size - 1, s"LSH missed ${exact.size - lsh.size} pairs")
  }

  test("simhash: planted near-dup pairs sit close in Hamming space") {
    val planted = Set((0L, 50L), (0L, 82L), (8L, 12L))
    val near = q("q_llm_simhash_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(near),
      s"planted near-dups missing from simhash pairs")
  }

  test("ivf: returns 5 in-cell neighbors ranked like brute force") {
    val rows = q("q_llm_ann_ivf").collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("approx_count_distinct: bound verdicts true, exact side verified") {
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("x"))
    val out = q("q_agg_approx_distinct")
    val bad = out.join(exact, "event_type")
      .where(!col("users_ok") || !col("events_ok")
        || col("exact_users") =!= col("x"))
      .count()
    assert(bad == 0)
  }
}
