package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-3 suite: graded arbitrary-state streaming, text and
  * binaryFile source round-trips. */
class Extras8Spec extends QuerySuiteBase {
  Seq("q_stream_live_stateful", "q_source_text", "q_source_binary",
    "q_agg_countmin", "q_agg_bloom")
    .foreach(checkDeclared(_))

  checkDeclared("q_join_dpp")
  checkDeclared("q_stream_live_tws")
  checkDeclared("q_llm_shuffle")
  checkDeclared("q_agg_ttest")
  checkDeclared("q_fn_collate")
  checkDeclared("q_fn_mask")
  checkDeclared("q_win_exclude")
  checkDeclared("q_agg_mad")
  checkDeclared("q_fn_csv")
  checkDeclared("q_fn_xml")

  checkDeclared("q_graph_triangles")
  checkDeclared("q_source_libsvm")
  checkDeclared("q_llm_kmeans")
  checkDeclared("q_llm_dedup_semantic")

  test("semantic clusters: labels are component minima over the pair graph") {
    val df = q("q_llm_dedup_semantic").cache()
    // every cluster label is a member of its own cluster, and the keep
    // flag marks exactly the label row
    assert(df.where(col("keep") =!= (col("vec_id") === col("cluster_id")))
      .count() == 0)
    val labels = df.select(col("cluster_id")).distinct()
      .join(df.select(col("vec_id")),
        col("cluster_id") === col("vec_id"), "left_anti")
    assert(labels.count() == 0, "a cluster label is not itself a member")
    // edges connect only same-cluster vectors (labels are closed)
    val lbl = df.select(col("vec_id"), col("cluster_id"))
    val pairs = q("q_llm_dedup_embed_lsh").select(col("va"), col("vb"))
    val crossEdges = pairs
      .join(lbl.withColumnRenamed("vec_id", "va")
        .withColumnRenamed("cluster_id", "ca"), "va")
      .join(lbl.withColumnRenamed("vec_id", "vb")
        .withColumnRenamed("cluster_id", "cb"), "vb")
      .where(col("ca") =!= col("cb"))
    assert(crossEdges.count() == 0, "an edge crosses two clusters")
    df.unpersist()
  }

  test("k-means step: clusters partition the corpus, seeds stay home") {
    val df = q("q_llm_kmeans")
    assert(df.agg(sum(col("n_members"))).head().getLong(0) ==
      Tables.embeddings(spark, sf).count(), "assignment is not a partition")
    assert(df.count() == 4, "a seed cluster lost all members")
    assert(df.where(col("inertia") < 0).count() == 0)
  }

  test("libsvm round-trip recovers every vector at full 64-dim width") {
    val df = q("q_source_libsvm")
    assert(df.count() == Tables.embeddings(spark, sf).count())
    assert(df.where(col("dim") =!= 64).count() == 0,
      "sparse parse dropped trailing dimensions")
  }

  test("triangle count matches a brute-force closure over collected edges") {
    val ev = Tables.events(spark, sf)
      .where(pmod(col("user_id"), lit(7L)) === 0)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    val edges = ev.as("x").join(ev.as("y"),
        col("x.h") === col("y.h") && col("x.t") === col("y.t")
          && col("x.u") < col("y.u"))
      .select(col("x.u").as("a"), col("y.u").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var brute = 0L
    for (i <- verts.indices; j <- i + 1 until verts.size;
         k <- j + 1 until verts.size) {
      val (a, b, c) = (verts(i), verts(j), verts(k))
      if (edges((a, b)) && edges((b, c)) && edges((a, c))) brute += 1
    }
    val r = q("q_graph_triangles").head()
    assert(r.getLong(0) == edges.size.toLong, "edge count mismatch")
    assert(r.getLong(1) == brute,
      s"distributed count ${r.getLong(1)} != brute-force $brute")
  }

  test("csv and xml round-trips are lossless against the source table") {
    val src = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
      .orderBy("c_custkey")
    assert(fingerprint(q("q_fn_csv")) == fingerprint(src))
    val srcX = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("seg"), col("c_nationkey").as("k"))
      .orderBy("c_custkey")
    assert(fingerprint(q("q_fn_xml")) == fingerprint(srcX))
  }

  test("frame-minus-current equals a true exclusion (spot identity)") {
    // n_excl must be frame size − 1 (0..10), and a user's single-event
    // window yields sum_excl = 0, n_excl = 0.
    val df = q("q_win_exclude")
    assert(df.where(col("n_excl") < 0 || col("n_excl") > 10).count() == 0)
    assert(df.where(col("n_excl") === 0 && col("sum_excl") =!= 0.0)
      .count() == 0)
  }

  test("MAD is bounded by half the group's range") {
    val b = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(((max(col("l_quantity")) - min(col("l_quantity"))) / 2)
        .as("half_range"))
    assert(q("q_agg_mad").join(b, "l_returnflag")
      .where(col("mad_qty") > col("half_range")).count() == 0)
  }

  test("UTF8_LCASE collation halves the mixed-case distinct count") {
    val r = q("q_fn_collate").head()
    assert(r.getLong(0) == 2 * r.getLong(1),
      s"binary=${r.getLong(0)} lcase=${r.getLong(1)}: collation did not " +
        "merge the synthesized case variants")
  }

  test("mask leaves no letters or digits behind") {
    assert(q("q_fn_mask")
      .where(col("masked").rlike("[A-Za-z0-9&&[^Xxn]]")).count() == 0)
  }

  test("Welch t agrees in sign and scale with the group means") {
    val r = q("q_agg_ttest").head()
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    assert(n1 > 1 && n2 > 1, "degenerate groups")
    // t and mean_diff must share a sign; |t| is |mean_diff| / se with
    // se > 0, so t = 0 iff mean_diff = 0.
    val (md, t) = (r.getDouble(2), r.getDouble(3))
    assert(md * t >= 0, s"sign mismatch: mean_diff=$md t=$t")
  }

  test("deterministic shuffle is a permutation with dense per-shard positions") {
    val df = q("q_llm_shuffle").cache()
    val n = Tables.documents(spark, sf).count()
    assert(df.count() == n, "shuffle dropped or duplicated docs")
    assert(df.select("doc_id").distinct().count() == n)
    // positions are 1..|shard| with no gaps
    val bad = df.groupBy(col("shard"))
      .agg(count(lit(1)).as("sz"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .where(col("mx") =!= col("sz") || col("mn") =!= 1)
    assert(bad.count() == 0, "per-shard positions are not dense")
    df.unpersist()
  }

  test("transformWithState running max equals the batch MAX per user") {
    val batch = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(max(col("value")).as("max_value")).orderBy("user_id")
    assert(fingerprint(q("q_stream_live_tws")) == fingerprint(batch),
      "RocksDB ValueState running max diverged from batch MAX")
  }

  test("tws query restores the state store provider conf") {
    // getOption surfaces the conf DEFAULT, so compare before vs after
    // rather than expecting emptiness.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    q("q_stream_live_tws").count()
    assert(spark.conf.getOption(key) == before,
      "provider conf leaked out of the query function")
  }

  test("DPP: the fact scan carries a dynamic pruning partition filter") {
    val plan = q("q_join_dpp").queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in the fact scan:\n$plan")
  }

  test("count-min never underestimates (the one-sided error guarantee)") {
    assert(q("q_agg_countmin").where(col("est_n") < col("exact_n"))
      .count() == 0, "CMS estimate below the true count")
  }

  test("bloom filter has zero false negatives") {
    assert(q("q_agg_bloom")
      .where(col("present") && !col("is_member")).count() == 0,
      "a present key missed the filter")
    // And the absent probe list is actually exercised.
    assert(q("q_agg_bloom").where(!col("present")).count() == 5)
  }

  test("stateful running totals equal the batch GROUP BY exactly") {
    import Det._
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum((dec(col("value")) * 100).cast("long")).as("total_cents"))
      .orderBy("user_id")
    assert(fingerprint(q("q_stream_live_stateful")) == fingerprint(batch),
      "flatMapGroupsWithState totals diverged from the batch aggregate")
  }

  test("text round-trip preserves every doc byte-for-byte") {
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        substring(col("text"), 1, 40).as("head40"))
      .orderBy("doc_id")
    assert(fingerprint(q("q_source_text")) == fingerprint(direct))
  }

  test("binaryFile scan returns intact payloads (sha + length match)") {
    val direct = Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("length"),
        sha2(encode(col("text"), "UTF-8"), 256).as("sha"))
      .orderBy("doc_id")
    assert(fingerprint(q("q_source_binary")) == fingerprint(direct))
  }
}
