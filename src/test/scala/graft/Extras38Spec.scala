package graft

import org.apache.spark.sql.functions._

class Extras38Spec extends QuerySuiteBase {
  Seq("q_ts_rsi", "q_ts_stochastic", "q_ts_atr", "q_graph_resource_alloc",
    "q_evt_stickiness", "q_evt_bounce_rate", "q_evt_attribution_linear",
    "q_llm_feature_hash", "q_llm_doc_ppl", "q_scan_sample_reservoir")
    .foreach(checkDeclared(_))

  test("rsi: bounded [0,100], components reconcile") {
    val rows = q("q_ts_rsi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gain = r.getLong(1); val loss = r.getLong(2)
      val rsi = r.getDouble(3)
      assert(gain >= 0 && loss >= 0 && gain + loss > 0)
      assert(rsi >= 0 && rsi <= 100)
      assert(math.abs(rsi - 100.0 * gain / (gain + loss)) < 1e-9)
    }
  }

  test("stochastic: %K in [0,100], num <= den") {
    val rows = q("q_ts_stochastic").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
      val pk = r.getDouble(3)
      assert(pk >= 0 && pk <= 100)
    }
  }

  test("atr: true range dominates hi-lo, window sum is 14 trs") {
    val rows = q("q_ts_atr").collect()
    assert(rows.nonEmpty)
    // tr >= 0 and atr = window sum / 14 exactly
    rows.foreach { r =>
      assert(r.getLong(1) >= 0)
      assert(math.abs(r.getDouble(3) - r.getLong(2) / 14.0) < 1e-9)
    }
    // each atr14 equals the sum of its trailing 14 tr values
    val trs = rows.map(r => r.getDate(0).toString -> r.getLong(1))
    val sums = rows.map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    trs.indices.drop(13).foreach { i =>
      val expect = (i - 13 to i).map(trs(_)._2).sum
      assert(sums(trs(i)._1) == expect)
    }
  }

  test("resource-alloc: pairs match jaccard's candidate set, ra exact") {
    val ra = q("q_graph_resource_alloc").collect()
    val jc = q("q_graph_jaccard").select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ra.nonEmpty)
    assert(ra.map(r => (r.getLong(0), r.getLong(1))).toSet == jc,
      "RA must enumerate exactly the common-neighbor candidate pairs")
    ra.foreach { r =>
      // n_common terms each contribute <= 1e12 pico-units (deg >= 1)
      assert(r.getLong(3) > 0 && r.getLong(3) <= r.getLong(2) * 1000000000000L)
      assert(math.abs(r.getDouble(4) - r.getLong(3) / 1e12) < 1e-12)
    }
  }

  test("stickiness: dau <= mau, ratio in (0,1]") {
    val rows = q("q_evt_stickiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      val s = r.getDouble(3)
      assert(s > 0 && s <= 1.0)
    }
  }

  test("bounce: bounces <= sessions; session totals reconcile") {
    val rows = q("q_evt_bounce_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val total = rows.map(_.getLong(1)).sum
    val sessions = q("q_ts_sessionize").count()
    assert(total == sessions,
      s"bounce-rate sessions $total != sessionize count $sessions")
  }

  test("linear attribution: micro-credits total one unit per credited user") {
    val rows = q("q_evt_attribution_linear").collect()
    assert(rows.nonEmpty)
    val micro = rows.map(_.getLong(3)).sum
    // Σ over channels of Σ (1e6 div n) = for each user n·(1e6 div n)
    // ≈ 1e6 per user with only the integer-division remainder missing:
    // strictly within n_touches of the exact total.
    val users = {
      val e = Tables.events(spark, sf)
      val fb = e.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("bts"))
      e.join(fb, "user_id")
        .where(col("event_type") =!= "purchase" && col("ts") < col("bts"))
        .select("user_id").distinct().count()
    }
    val touches = rows.map(_.getLong(1)).sum
    assert(micro <= users * 1000000L)
    assert(micro >= users * 1000000L - touches)
  }

  test("feature hash: buckets in [0,256), tf totals match token counts") {
    val rows = q("q_llm_feature_hash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 256)
      assert(r.getLong(2) >= 1)
    }
    val perDoc = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val truth = Tables.documents(spark, sf).where(col("doc_id") < 50)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(perDoc == truth)
  }

  test("doc-ppl: every doc scored, bits non-negative, bigram counts real") {
    val rows = q("q_llm_doc_ppl").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)       // n_bigrams
      assert(r.getLong(2) >= 0)       // micro_bits: c1 >= c2 => log2 >= 0
      assert(r.getDouble(3) >= 0)
    }
  }

  test("reservoir: 20 per group, ranked by portable hash, rerun-stable") {
    val a = q("q_scan_sample_reservoir").collect()
    val b = q("q_scan_sample_reservoir").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val byType = a.groupBy(_.getString(0))
    byType.values.foreach { g =>
      assert(g.length == 20)
      val hs = g.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(hs.zip(hs.tail).forall { case (x, y) => x <= y })
    }
  }
}
