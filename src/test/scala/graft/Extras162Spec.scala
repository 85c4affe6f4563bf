package graft

import org.apache.spark.sql.functions._

class Extras162Spec extends QuerySuiteBase {
  Seq("q_llm_ann_hnsw_div").foreach(checkDeclared(_))

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

  test("hnsw_div: ranks 1..k by exact L2, no self-matches") {
    val micro = micros()
    val rows = q("q_llm_ann_hnsw_div").collect()
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

  test("hnsw_div fixture: Alg.4 pruning actually diversifies, " +
      "degree structure preserved") {
    // build both fixtures (the queries are the builders), then compare
    // edge lists: the diversified graph must (a) differ from the plain
    // 8-NN graph — the RNG rule pruned SOMETHING — and (b) keep the
    // same per-src out-degree (keepPrunedConnections backfills every
    // pruned slot from the 24-candidate pool, and hub/mesh edges are
    // shared), so the graph gets more DIVERSE, never sparser.
    q("q_llm_ann_hnsw").count()
    q("q_llm_ann_hnsw_div").count()
    val plainDir = operators.Extras148.buildHnswIndex(spark, sf,
      diversify = false)
    val divDir = operators.Extras148.buildHnswIndex(spark, sf,
      diversify = true)
    val plain = spark.read.parquet(s"$plainDir/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val div = spark.read.parquet(s"$divDir/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(div != plain,
      "diversified edge set identical to plain 8-NN — pruning inert")
    val degP = plain.groupBy(_._1).view.mapValues(_.size).toMap
    val degD = div.groupBy(_._1).view.mapValues(_.size).toMap
    assert(degD.keySet == degP.keySet,
      "diversification changed the node set")
    // backfill keeps the kNN contribution at 8 per src; hub/mesh
    // overlap can differ by at most the pruned/kept swap, so degree
    // stays within +-8 of the plain graph's
    degD.foreach { case (srcId, dg) =>
      assert(math.abs(dg - degP(srcId)) <= 8,
        s"src=$srcId degree moved ${degP(srcId)} -> $dg")
    }
    // the A/B premise: diversified kNN edges reach FURTHER on average
    // (long-range links replace near-duplicate fans) — assert the
    // edge-set symmetric difference is non-trivial
    assert((div diff plain).size >= 1 && (plain diff div).size >= 1)
  }
}
