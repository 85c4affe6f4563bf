package graft

import org.apache.spark.sql.functions._

class EventLlmSpec extends QuerySuiteBase {
  Seq("q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_dedup_first", "q_llm_dedup_exact", "q_llm_dedup_near",
    "q_llm_dedup_embed", "q_llm_sim_topk", "q_llm_knn_join",
    "q_llm_text_tokens", "q_llm_tfidf", "q_llm_text_stats",
    "q_llm_lang_id", "q_llm_quality", "q_llm_token_count",
    "q_llm_fingerprint", "q_llm_multimodal", "q_llm_chunk",
    "q_llm_embed_norm", "q_ts_resample", "q_llm_dedup_clusters",
    "q_stream_live_tumbling", "q_source_csv", "q_stream_live_join",
    "q_llm_dedup_para")
    .foreach(checkDeclared(_))

  test("paragraph dedup: every reported chunk occurs in >= 2 distinct docs") {
    val rows = q("q_llm_dedup_para").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs"))
    }
    // The planted near-dup docs share 50-word chunks, so the near-dup
    // pairs must be a source of cross-doc chunks: the first_doc of some
    // reported chunk is an endpoint of some near-dup pair.
    val nearDocs = q("q_llm_dedup_near").collect()
      .flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(rows.exists(r => nearDocs.contains(r.getAs[Long]("first_doc"))))
  }

  test("live stream-static join equals the equivalent batch join") {
    val batch = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf).select(col("c_custkey"),
        col("c_mktsegment")), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_v"))
      .select(Det.tsUs(col("w.start")).as("ws_us"), col("c_mktsegment"),
        col("n"), col("sum_v"))
      .orderBy("ws_us", "c_mktsegment")
    assert(q("q_stream_live_join").collect().map(_.toString).toSeq
      == batch.collect().map(_.toString).toSeq)
  }

  test("live streaming tumbling equals the batch twin bit-for-bit") {
    assert(q("q_stream_live_tumbling").collect().map(_.toString).toSeq
      == q("q_stream_tumbling").collect().map(_.toString).toSeq)
  }

  test("dedup clusters: both endpoints of every pair share one cluster") {
    val cl = q("q_llm_dedup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val pairs = q("q_llm_dedup_near").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cl(a) == cl(b), s"pair ($a,$b) split across clusters")
    }
    // The cluster label is the smallest member (so doc 0's component,
    // which contains the planted pairs (0,50) and (0,82), is cluster 0
    // with at least those three members — transitivity, not pairwise).
    assert(cl.forall { case (id, c) => c <= id })
    assert(Seq(0L, 50L, 82L).forall(cl.get(_).contains(0L)))
  }

  test("resample: hourly grid is contiguous, forward-filled, never null") {
    import org.apache.spark.sql.expressions.Window
    val rs = q("q_ts_resample")
    assert(rs.where(col("value_ff").isNull).count() == 0)
    val w = Window.partitionBy("user_id").orderBy("grid_us")
    val gaps = rs.withColumn("prev", lag(col("grid_us"), 1).over(w))
      .where(col("prev").isNotNull
        && col("grid_us") - col("prev") =!= 3600000000L).count()
    assert(gaps == 0, "grid must step in exact 1-hour increments")
    // Spot-check the forward-fill rule for one user: the first grid value
    // equals the value of the latest event at or before that grid point.
    val first = rs.where(col("user_id") === 0).orderBy("grid_us").head()
    val expected = Tables.events(spark, sf).where(col("user_id") === 0)
      .where(Det.tsUs(col("ts")) <= first.getAs[Long]("grid_us"))
      .orderBy(Det.tsUs(col("ts")).desc, col("event_id").desc)
      .select("value").head().getDouble(0)
    assert(first.getAs[Double]("value_ff") == expected)
  }

  test("chunking: words are partitioned with exactly 10-word overlaps") {
    val doc0 = q("q_llm_chunk").where(col("doc_id") === 0)
      .orderBy("chunk_id").collect()
    val nWords = Tables.documents(spark, sf).where(col("doc_id") === 0)
      .select(size(split(col("text"), " "))).head().getInt(0)
    // Derive the expectation from the real slice arithmetic (chunk i
    // covers words [40i, 40i+50)), so it holds for ANY word count —
    // including a short final chunk — not just fixtures where every
    // non-final chunk is full.
    val expectedSizes = (0 to (nWords - 1) / 40).map(i => math.min(50, nWords - 40 * i))
    assert(doc0.length == expectedSizes.length)
    assert(doc0.map(_.getAs[Int]("n_words")).toSeq == expectedSizes)
  }

  test("embed_norm: unit-norm fixture vectors have norm_sq ~ 1") {
    val bad = q("q_llm_embed_norm")
      .where(abs(col("norm_sq") - 1.0) > 0.01).count()
    assert(bad == 0)
  }

  private lazy val nEvents = Tables.events(spark, sf).count()

  test("tumbling window counts partition the event stream") {
    val total = q("q_stream_tumbling").agg(sum("n")).head().getLong(0)
    assert(total == nEvents)
  }

  test("sliding 1h/15m windows hold each event exactly 4 times") {
    val total = q("q_stream_sliding").agg(sum("n")).head().getLong(0)
    assert(total == 4 * nEvents)
  }

  test("session windows: gap between consecutive sessions > 30 min") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("sid")
    val bad = q("q_stream_session")
      .withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .where(col("prev_end").isNotNull
        && col("start_us") - col("prev_end") <= 1800000000L)
      .count()
    assert(bad == 0)
  }

  test("session windows: events within a session are <= 30 min apart") {
    val sess = q("q_stream_session")
    val spanTooSmall = sess.where(col("end_us") < col("start_us")).count()
    assert(spanTooSmall == 0)
    val total = sess.agg(sum("n")).head().getLong(0)
    assert(total == nEvents)
  }

  test("stream dedup keeps exactly one row per (user, type) pair") {
    val pairs = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(q("q_stream_dedup_first").count() == pairs)
  }

  test("near-dup detection recovers exactly the 28 planted pairs @sf0.001") {
    val rows = q("q_llm_dedup_near").collect()
    assert(rows.length == 28, s"got ${rows.length} pairs")
    val pairs = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(Set((0L, 50L), (0L, 82L), (5L, 450L), (8L, 12L)).subsetOf(pairs))
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.85),
      "planted pairs should sit well above the 0.6 threshold")
  }

  test("exact dedup is idempotent") {
    val once = q("q_llm_dedup_exact")
    val ids = once.select("doc_id")
    val again = Tables.documents(spark, sf).join(ids, "doc_id")
      .groupBy(sha2(lower(trim(col("text"))), 256))
      .agg(min("doc_id").as("doc_id"))
    assert(again.count() == once.count())
  }

  test("sim_topk: 20 rows, scores descending within [-1, 1]") {
    val scores = q("q_llm_sim_topk").collect().map(_.getAs[Double]("score"))
    assert(scores.length == 20)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s >= -1.01 && s <= 1.01))
  }

  test("sim_topk matches brute-force double-precision ranking") {
    // Independent implementation: plain double dot product, same top-20.
    val q0 = Tables.embeddings(spark, sf).where(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val brute = Tables.embeddings(spark, sf).where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("qe"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (a, x) => a + x).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSeq
    val got = q("q_llm_sim_topk").collect().map(_.getLong(0)).toSeq
    assert(got == brute, "integer-quantized ranking must agree with double ranking")
  }

  test("knn join: exactly k=3 neighbors per query, none from query set") {
    val rows = q("q_llm_knn_join").collect()
    assert(rows.length == 15) // 5 queries × 3
    assert(rows.forall(_.getAs[Long]("nid") >= 5))
  }

  test("tfidf: words in every doc have idf ~ 0") {
    val everywhere = q("q_llm_text_tokens")
      .where(col("df") === Tables.documents(spark, sf).count())
      .select("word")
    val z = q("q_llm_tfidf").join(everywhere, "word")
      .where(abs(col("tfidf")) > 1e-9).count()
    assert(z == 0)
  }

  test("fingerprint: order-sensitive (rolling) — reversed text differs") {
    val fps = q("q_llm_fingerprint").collect().map(_.getAs[Long]("fp"))
    assert(fps.distinct.length > fps.length / 2,
      "rolling hashes should be mostly distinct across docs")
  }

  test("multimodal: payload byte length equals text length (ascii corpus)") {
    val bad = q("q_llm_multimodal").join(
      Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("tl")),
      "doc_id").where(col("payload_len") =!= col("tl")).count()
    assert(bad == 0)
  }
}
