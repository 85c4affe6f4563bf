package graft

import org.apache.spark.sql.functions._

class Extras152Spec extends QuerySuiteBase {
  Seq("q_llm_ann_ivfpq_lloyd", "q_llm_ann_hnsw_ml").foreach(checkDeclared(_))

  private def micros(): Map[Long, Array[Long]] = {
    import org.apache.spark.sql.types.DecimalType
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("vec_id", "pos", "x")
      .select(col("vec_id"), col("pos"),
        (round(col("x").cast("double"), 6).cast(DecimalType(18, 6))
          * 1000000).cast("long").as("q6"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (v, rs) => v -> rs.sortBy(_.getInt(1)).map(_.getLong(2)) }
  }

  test("lloyd ivfpq: ranks 1..k by true distance, ADC nonneg") {
    val rows = q("q_llm_ann_ivfpq_lloyd").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to ranked.length))
      val dists = ranked.map(_.getDouble(4))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
      assert(rs.forall(_.getDouble(3) >= 0.0))
    }
  }

  test("lloyd ivfpq: true_dist equals the exact L2 on quantized micros") {
    val micro = micros()
    q("q_llm_ann_ivfpq_lloyd").collect().foreach { r =>
      val (qid, vid) = (r.getLong(0), r.getLong(2))
      val d2 = micro(qid).zip(micro(vid))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      val expect = (BigDecimal(d2) / BigDecimal(1000000000000L))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - expect) < 1e-9, s"qid=$qid vid=$vid")
    }
  }

  test("lloyd M-step: positive-shifted floor mean never exceeds |r6| bound") {
    // The determinism contract hinges on sum(r6 + 4e6) being
    // non-negative (identical truncation on both engines). Verify the
    // residual bound that guarantees it: every quantized micro is
    // within ±2.2e6, so r6 = q6 - c6 is within ±4.4e6... the shift
    // must dominate the NEGATIVE side only: r6 + 4e6 >= 0 requires
    // r6 >= -4e6. Assert the actual fixture bound with slack.
    val micro = micros()
    val maxAbs = micro.values.flatten.map(math.abs).max
    assert(maxAbs * 2 < 4000000L,
      s"residual bound 2*|q6|max=${maxAbs * 2} must stay below the 4e6 shift")
  }

  test("hnsw_ml: ranks 1..k by distance, no self-matches, exact L2 dist") {
    val micro = micros()
    val rows = q("q_llm_ann_hnsw_ml").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to ranked.length))
      val dists = ranked.map(_.getDouble(3))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
      rs.foreach { r =>
        val vid = r.getLong(2)
        assert(vid != qid, s"self-match for qid=$qid")
        val d2 = micro(qid).zip(micro(vid))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        val expect = (BigDecimal(d2) / BigDecimal(1000000000000L))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(3) - expect) < 1e-9, s"qid=$qid vid=$vid")
      }
    }
  }

  test("hnsw_ml: returns 10 rows per query and finds brute-force top-3") {
    val micro = micros()
    q("q_llm_ann_hnsw_ml").collect()
      .groupBy(_.getLong(0)).foreach { case (qid, rs) =>
        assert(rs.length == 10, s"qid=$qid returned ${rs.length} rows")
        val brute3 = micro.keys.filter(_ != qid).toSeq
          .map(v => (micro(qid).zip(micro(v))
            .map { case (a, b) => (a - b) * (a - b) }.sum, v))
          .sortBy(identity).take(3).map(_._2).toSet
        val got = rs.map(_.getLong(2)).toSet
        assert((got & brute3).nonEmpty,
          s"qid=$qid found none of brute-force top-3 $brute3")
      }
  }
}
