package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling evidence: inflate the sf0.1 tables K× in /tmp
  * (STRUCTURE-PRESERVING — keys are remapped so cardinalities grow with
  * the data, and document text gets a per-replica vocabulary suffix so
  * the near-dup pair structure replicates instead of exploding
  * quadratically), then time representative heavy operators at 1× and
  * K× and print the ratio. A shuffle-bound operator should scale ≈ K·
  * log-ish; anything super-linear is a plan that would not survive 100×.
  *
  * Run: sbt "runMain graft.ScaleProbe [K]"; results recorded in
  * BASELINE.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(8)
    // Optional probe-name filter (exact keys after K) — the full sweep is
    // ~100 probes × two timed runs; per-round additions re-probe only
    // their own keys and append to BASELINE.md like every prior chunk.
    val only = args.drop(1).toSet
    val sf = "/root/testdata/sf0.1"
    val out = s"/tmp/graft-scale-x$k"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    // SPARK_GRAFT_SCALE_REUSE=1 skips the K× rebuild when the output
    // tree already exists — probe iteration without re-replicating ~1 GB.
    val reuse = sys.env.get("SPARK_GRAFT_SCALE_REUSE").contains("1") &&
      new java.io.File(s"$out/lineitem.parquet").exists()
    if (!reuse) buildReplicas(spark, sf, out, k)
    runProbes(spark, sf, out, k, only)
  }

  private def buildReplicas(spark: SparkSession, sf: String, out: String,
                            k: Int): Unit = {
    def replicate(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(k).select(col("id").as("rep")))

    // lineitem/orders: remap join keys so the key space grows K× too.
    replicate(Tables.lineitem(spark, sf))
      .withColumn("l_orderkey", col("l_orderkey") * k + col("rep")).drop("rep")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    replicate(Tables.orders(spark, sf))
      .withColumn("o_orderkey", col("o_orderkey") * k + col("rep")).drop("rep")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    // events: new ids and users, ts shifted per replica BY MORE THAN THE
    // SPAN (64 days vs the ~31-day event window — keeps sessions). The
    // round-8 shift was 1 day/replica, which left replicas overlapping in
    // calendar time: the co-occurrence graph's (hour, type) buckets then
    // mixed users across replicas and edges grew ~60× at K=8 (measured)
    // instead of ~K× — a K² probe artifact that exploded the two-hop
    // candidate join's shuffle to ENOSPC. Disjoint months are the events
    // analog of the documents per-replica vocabulary suffix.
    replicate(Tables.events(spark, sf))
      .withColumn("event_id", col("event_id") * k + col("rep"))
      .withColumn("user_id", col("user_id") * k + col("rep"))
      .withColumn("ts", timestamp_micros(unix_micros(col("ts"))
        + col("rep") * 64L * 86400000000L))
      .drop("rep")
      // events.parquet is read via Tables.events (nanosAsLong + div):
      // store ts back as LONG nanos to honor the raw schema.
      .withColumn("ts", unix_micros(col("ts")) * 1000)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/events_dir")
    // The live-streaming probes go through StreamOps.eventsFileStream,
    // which requires events.parquet to be a single FILE (pathGlobFilter
    // semantics) — promote the lone part file to that name.
    locally {
      val dir = new java.io.File(s"$out/events_dir")
      val part = dir.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(
          s"ScaleProbe: no .parquet part under $dir — coalesced write failed"))
      val dst = new java.io.File(s"$out/events.parquet")
      // a stale run may have left a DIRECTORY at this name (possibly with
      // subdirectories — delete bottom-up so the move cannot throw)
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
        f.delete(); ()
      }
      rmr(dst)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    // documents: per-replica vocabulary suffix — replicas of different k
    // share NO shingles, so the planted near-dup structure replicates
    // linearly instead of every copy matching every other copy.
    // doc_id remap is a BLOCK OFFSET (rep·2^20 + id), not id·K + rep: the
    // interleaved form maps doc parity to REPLICA parity, which starves
    // any odd/even corpus-split op (q_llm_cross_dedup's incoming-vs-
    // existing probe measured 0 rows at 8× — every "incoming" replica
    // carried a disjoint vocabulary from every "existing" one). A block
    // offset preserves each document's own parity and intra-replica
    // structure.
    replicate(Tables.documents(spark, sf))
      .withColumn("doc_id", col("rep") * 1048576L + col("doc_id"))
      .withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(w, col("rep").cast("string"))), " "))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // embeddings: ROLL each replica's components by rep positions — a
    // norm- and pair-structure-preserving rotation (dot products within a
    // replica are unchanged), but a vector and its rolled copy are no
    // longer near-duplicates, so the near-dup pair graph replicates
    // linearly (the embedding analog of the documents vocabulary suffix;
    // without it every replica pairs with every other replica and the
    // LSH probes measure a K² artifact instead of the engine).
    replicate(Tables.embeddings(spark, sf))
      .withColumn("vec_id", col("vec_id") * k + col("rep"))
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(
          concat(slice(col("embedding"), col("rep") + 1,
              size(col("embedding")) - col("rep")),
            slice(col("embedding"), lit(1), col("rep")))))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // Dims the probes join against, unchanged.
    Seq("customer", "nation", "region", "part", "supplier").foreach { t =>
      Tables.load(spark, sf, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
  }

  private def runProbes(spark: SparkSession, sf: String, out: String,
                        k: Int, only: Set[String]): Unit = {
    import org.apache.spark.sql.functions._

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val probes: Seq[(String, String => Long)] = Seq(
      "q1_pricing_summary" -> (d => SparkEntry.queries("q1_pricing_summary")(spark, d).count()),
      "q_join_sortmerge" -> (d => SparkEntry.queries("q_join_sortmerge")(spark, d).count()),
      "q_stream_session" -> (d => SparkEntry.queries("q_stream_session")(spark, d).count()),
      "q_llm_dedup_near" -> (d => SparkEntry.queries("q_llm_dedup_near")(spark, d).count()),
      "q_llm_dedup_minhash" -> (d => SparkEntry.queries("q_llm_dedup_minhash")(spark, d).count()),
      "q_llm_sim_topk" -> (d => SparkEntry.queries("q_llm_sim_topk")(spark, d).count()),
      "q_llm_simhash_lsh" -> (d => SparkEntry.queries("q_llm_simhash_lsh")(spark, d).count()),
      "q_llm_dedup_clusters" -> (d => SparkEntry.queries("q_llm_dedup_clusters")(spark, d).count()),
      "q_llm_centroid" -> (d => SparkEntry.queries("q_llm_centroid")(spark, d).count()),
      // Round-4 layout + decorrelation probes: the partitioned/bucketed
      // probes time LAYOUT BUILD + QUERY together (the write is the cost
      // being amortized; it must itself scale linearly), q21 times the
      // semi+anti decorrelation over the K×-remapped order keys.
      "q_source_partitioned" -> (d => SparkEntry.queries("q_source_partitioned")(spark, d).count()),
      "q_join_bucketed" -> (d => SparkEntry.queries("q_join_bucketed")(spark, d).count()),
      "q_ts_ohlc" -> (d => SparkEntry.queries("q_ts_ohlc")(spark, d).count()),
      "q_sql_q21" -> (d => SparkEntry.queries("q_sql_q21")(spark, d).count()),
      // Round-5 probes: gram-expansion + windowed min (winnow), bounded
      // ROWS frames (zscore), the double-window GROUPS emulation, the
      // bigram-LM two-join shape, the live stream-stream join (state
      // store volume scales with the click horizon), and the two
      // mergeable summaries (sketch size is CONSTANT — only the scan
      // side should grow).
      "q_llm_winnow" -> (d => SparkEntry.queries("q_llm_winnow")(spark, d).count()),
      "q_ts_zscore" -> (d => SparkEntry.queries("q_ts_zscore")(spark, d).count()),
      "q_win_groups_frame" -> (d => SparkEntry.queries("q_win_groups_frame")(spark, d).count()),
      "q_llm_ngram_lm" -> (d => SparkEntry.queries("q_llm_ngram_lm")(spark, d).count()),
      "q_stream_live_ssjoin" -> (d => SparkEntry.queries("q_stream_live_ssjoin")(spark, d).count()),
      "q_agg_countmin" -> (d => SparkEntry.queries("q_agg_countmin")(spark, d).count()),
      "q_agg_bloom" -> (d => SparkEntry.queries("q_agg_bloom")(spark, d).count()),
      // Round-7 probes (round-6 advice #2): the newest heavyweights.
      // dedup_semantic = LSH pair graph + pointer-jumping components;
      // kmeans/kmeans_iter = broadcast-centroid Lloyd (1 and 3 steps);
      // quantile_sketch = mergeable bucket maps (sketch size CONSTANT);
      // dpp appears twice — the first timing includes the FixtureCache
      // partitioned-layout build when no current copy exists (the
      // amortized ingest cost), the second is the steady-state read.
      "q_llm_dedup_semantic" -> (d => SparkEntry.queries("q_llm_dedup_semantic")(spark, d).count()),
      "q_llm_kmeans" -> (d => SparkEntry.queries("q_llm_kmeans")(spark, d).count()),
      "q_llm_kmeans_iter" -> (d => SparkEntry.queries("q_llm_kmeans_iter")(spark, d).count()),
      "q_agg_quantile_sketch" -> (d => SparkEntry.queries("q_agg_quantile_sketch")(spark, d).count()),
      "q_graph_pagerank" -> (d => SparkEntry.queries("q_graph_pagerank")(spark, d).count()),
      "q_join_dpp" -> (d => SparkEntry.queries("q_join_dpp")(spark, d).count()),
      "q_join_dpp#warm" -> (d => SparkEntry.queries("q_join_dpp")(spark, d).count()),
      "q_join_bucketed#warm" -> (d => SparkEntry.queries("q_join_bucketed")(spark, d).count()),
      // Round-7.2 probes: MERGE (one full-outer join over the remapped
      // order keys), the graph kernels (node count grows with the
      // replicated user space), PMI (vocabulary grows 8× via the suffix),
      // and the two windowed sequence shapes (islands/sessions per
      // replicated user). q_join_spatial_grid is deliberately NOT probed:
      // the fixture replicates customers into the SAME 1000×1000 grid, so
      // point density — and the true answer — grows quadratically; the
      // probe would measure output explosion, not plan decay (the
      // density-bounded claim is the spec-proven grid/theta equivalence).
      "q_merge_upsert" -> (d => SparkEntry.queries("q_merge_upsert")(spark, d).count()),
      "q_graph_components" -> (d => SparkEntry.queries("q_graph_components")(spark, d).count()),
      "q_graph_bfs" -> (d => SparkEntry.queries("q_graph_bfs")(spark, d).count()),
      "q_llm_colloc_pmi" -> (d => SparkEntry.queries("q_llm_colloc_pmi")(spark, d).count()),
      "q_scd2" -> (d => SparkEntry.queries("q_scd2")(spark, d).count()),
      "q_ts_sessionize" -> (d => SparkEntry.queries("q_ts_sessionize")(spark, d).count()),
      "q_evt_retention" -> (d => SparkEntry.queries("q_evt_retention")(spark, d).count()),
      "q_stream_live_cdc" -> (d => SparkEntry.queries("q_stream_live_cdc")(spark, d).count()),
      // Round-7.3 probes (Extras16/17): the three-window risk/interval
      // shapes and weighted median (per-user/per-flag windows over the
      // replicated key space), the common-neighbor Jaccard + k-core
      // peel (graph grows with the user space), the 136-pair covariance
      // self-join and per-dim quantization (embedding-count-linear with
      // CONSTANT 16/64-dim output), and the foreachBatch merge sink
      // (per-batch full-outer merge over the replicated users).
      "q_ts_drawdown" -> (d => SparkEntry.queries("q_ts_drawdown")(spark, d).count()),
      "q_ts_interval_merge" -> (d => SparkEntry.queries("q_ts_interval_merge")(spark, d).count()),
      "q_agg_weighted_median" -> (d => SparkEntry.queries("q_agg_weighted_median")(spark, d).count()),
      "q_graph_jaccard" -> (d => SparkEntry.queries("q_graph_jaccard")(spark, d).count()),
      "q_graph_kcore" -> (d => SparkEntry.queries("q_graph_kcore")(spark, d).count()),
      "q_llm_embed_cov" -> (d => SparkEntry.queries("q_llm_embed_cov")(spark, d).count()),
      "q_llm_embed_quantize" -> (d => SparkEntry.queries("q_llm_embed_quantize")(spark, d).count()),
      "q_stream_live_foreachbatch" -> (d => SparkEntry.queries("q_stream_live_foreachbatch")(spark, d).count()),
      // Round-7.4/7.5 probes (Extras18–21): the running-last as-of carry
      // and the user-partitioned sequence shapes (markov, peaks, first-
      // touch cumulative distinct) over the 8× user space; the triangle
      // three-join + degree-correlation graph statistics; the basket-
      // squared itemset join over remapped order keys; the one-pass
      // multi-distinct profile over 8× orders; and the three newest
      // stateful/multi-source live keys (left-outer null emission,
      // event-time-timeout sessions, dual-source union). RFM is probed
      // for its fact-side agg only — o_custkey is deliberately NOT
      // remapped by the fixture, so its dimension windows stay constant.
      // Skyline is NOT probed: the part table doesn't replicate.
      "q_join_asof_tolerance" -> (d => SparkEntry.queries("q_join_asof_tolerance")(spark, d).count()),
      "q_evt_markov" -> (d => SparkEntry.queries("q_evt_markov")(spark, d).count()),
      "q_ts_peaks" -> (d => SparkEntry.queries("q_ts_peaks")(spark, d).count()),
      "q_win_running_distinct" -> (d => SparkEntry.queries("q_win_running_distinct")(spark, d).count()),
      "q_graph_cluster_coeff" -> (d => SparkEntry.queries("q_graph_cluster_coeff")(spark, d).count()),
      "q_graph_assortativity" -> (d => SparkEntry.queries("q_graph_assortativity")(spark, d).count()),
      "q_agg_itemsets" -> (d => SparkEntry.queries("q_agg_itemsets")(spark, d).count()),
      "q_agg_rfm" -> (d => SparkEntry.queries("q_agg_rfm")(spark, d).count()),
      "q_dq_profile" -> (d => SparkEntry.queries("q_dq_profile")(spark, d).count()),
      "q_stream_live_louter" -> (d => SparkEntry.queries("q_stream_live_louter")(spark, d).count()),
      "q_stream_live_timeout" -> (d => SparkEntry.queries("q_stream_live_timeout")(spark, d).count()),
      "q_stream_live_union" -> (d => SparkEntry.queries("q_stream_live_union")(spark, d).count()),
      // Round-7.6 probes (Extras23): the two rank tests walk an ECDF
      // grid that grows with distinct price values; islands/cohort are
      // user-partitioned sequence shapes over the 8× user space;
      // bollinger's daily spine is calendar-bounded (the 100 TB shape —
      // probed to prove the flat ratio). q_join_fuzzy is NOT probed:
      // its quadratic runs over the p_name label dimension and the
      // fixture doesn't replicate the part table.
      "q_agg_ks_test" -> (d => SparkEntry.queries("q_agg_ks_test")(spark, d).count()),
      "q_agg_mannwhitney" -> (d => SparkEntry.queries("q_agg_mannwhitney")(spark, d).count()),
      "q_ts_islands" -> (d => SparkEntry.queries("q_ts_islands")(spark, d).count()),
      "q_evt_cohort" -> (d => SparkEntry.queries("q_evt_cohort")(spark, d).count()),
      "q_ts_bollinger" -> (d => SparkEntry.queries("q_ts_bollinger")(spark, d).count()),
      // Round-7.7 probes (Extras24): dau_wau's 7× user-day explode and
      // inter_event's per-(type,user) lag ride the 8× user space;
      // trimmed_mean re-sorts the 8× fact rows per flag; gaps lags per
      // customer over remapped order days. anova/forecast_err are
      // pivot-/calendar-bounded but probed to prove the flat ratio.
      "q_evt_dau_wau" -> (d => SparkEntry.queries("q_evt_dau_wau")(spark, d).count()),
      "q_evt_inter_event" -> (d => SparkEntry.queries("q_evt_inter_event")(spark, d).count()),
      "q_agg_trimmed_mean" -> (d => SparkEntry.queries("q_agg_trimmed_mean")(spark, d).count()),
      "q_ts_gaps" -> (d => SparkEntry.queries("q_ts_gaps")(spark, d).count()),
      "q_agg_anova" -> (d => SparkEntry.queries("q_agg_anova")(spark, d).count()),
      "q_ts_forecast_err" -> (d => SparkEntry.queries("q_ts_forecast_err")(spark, d).count()),
      // Round-7.8 probes (Extras25): fidelity re-runs the full minhash
      // pipeline over the 8× suffixed corpus (replicated pair
      // structure, not quadratic); the funnel is one corpus pass;
      // fixed-sample proves TakeOrdered stays k-bounded; burst rides
      // the (type × day) grid. json_nested is NOT probed — its cost is
      // the FixtureCache build, which the dpp#cold probe already
      // represents.
      "q_llm_minhash_fidelity" -> (d => SparkEntry.queries("q_llm_minhash_fidelity")(spark, d).count()),
      "q_llm_filter_funnel" -> (d => SparkEntry.queries("q_llm_filter_funnel")(spark, d).count()),
      "q_scan_sample_fixed" -> (d => SparkEntry.queries("q_scan_sample_fixed")(spark, d).count()),
      "q_evt_burst" -> (d => SparkEntry.queries("q_evt_burst")(spark, d).count()),
      "q_ts_pattern" -> (d => SparkEntry.queries("q_ts_pattern")(spark, d).count()),
      // Round-7.9 probes (Extras26): overlap's pair join must stay
      // user-linear over the 8× user space; lorenz is one fact shuffle
      // to the customer grain + a 10-row spine; psi is one fact pass
      // into 10 fixed bins. xcorr/diversity are dimension-bounded, and
      // ann_recall composes kernels the recall section already probes.
      "q_evt_overlap" -> (d => SparkEntry.queries("q_evt_overlap")(spark, d).count()),
      "q_agg_lorenz" -> (d => SparkEntry.queries("q_agg_lorenz")(spark, d).count()),
      "q_dq_psi" -> (d => SparkEntry.queries("q_dq_psi")(spark, d).count()),
      // Round-7.10 probes (Extras27): hits is two user-linear
      // join+agg rounds over the distinct bipartite edge set; keyset
      // must stay top-k + pushed range predicate (never a skip-scan);
      // winsorized shares trimmed_mean's per-group sort — the known
      // 3-partition order-statistic cost, probed to keep it honest.
      "q_graph_hits" -> (d => SparkEntry.queries("q_graph_hits")(spark, d).count()),
      "q_scan_keyset" -> (d => SparkEntry.queries("q_scan_keyset")(spark, d).count()),
      "q_agg_winsorized_mean" -> (d => SparkEntry.queries("q_agg_winsorized_mean")(spark, d).count()),
      // Round-7.11 probes (Extras28): qualify is the canonical
      // partitioned window over the orders fact (must scale with the
      // custkey shuffle, never a global sort); reciprocity is the
      // per-user lead + bounded pair fold; rolling_corr's fact work is
      // one daily agg — the window rides a calendar-bounded spine.
      "q_sql_qualify" -> (d => SparkEntry.queries("q_sql_qualify")(spark, d).count()),
      "q_graph_reciprocity" -> (d => SparkEntry.queries("q_graph_reciprocity")(spark, d).count()),
      "q_ts_rolling_corr" -> (d => SparkEntry.queries("q_ts_rolling_corr")(spark, d).count()),
      // Round-7.12 probes (Extras29): the partitioned sink must scale
      // with the status fan-out (3 dirs) not file count; disc
      // percentiles share the per-group sort budget; conversion lag is
      // two user-grain aggs + one join — all user-linear.
      "q_sink_partitioned" -> (d => SparkEntry.queries("q_sink_partitioned")(spark, d).count()),
      "q_agg_percentile_disc" -> (d => SparkEntry.queries("q_agg_percentile_disc")(spark, d).count()),
      "q_evt_conversion_lag" -> (d => SparkEntry.queries("q_evt_conversion_lag")(spark, d).count()),
      // Round-7.13 probes (Extras30): novelty's min-agg + postings
      // join must stay gram-linear; concurrency is THE distributed
      // prefix-sum shape (per-day window + day spine) — the probe
      // guards against regressing to a global single-partition sort;
      // vocab_growth is one token min-agg + a 4-row broadcast spine.
      "q_llm_novelty" -> (d => SparkEntry.queries("q_llm_novelty")(spark, d).count()),
      "q_ts_concurrency" -> (d => SparkEntry.queries("q_ts_concurrency")(spark, d).count()),
      "q_llm_vocab_growth" -> (d => SparkEntry.queries("q_llm_vocab_growth")(spark, d).count()),
      // Round-7.14 probes (Extras31): label_prop is two edge-linear
      // join+agg rounds (the iterative-graph cost model); twa is one
      // (type, day) window + agg over the fact table; shard_assign is
      // one corpus pass + an 8-row spine.
      "q_graph_label_prop" -> (d => SparkEntry.queries("q_graph_label_prop")(spark, d).count()),
      "q_ts_twa" -> (d => SparkEntry.queries("q_ts_twa")(spark, d).count()),
      "q_llm_shard_assign" -> (d => SparkEntry.queries("q_llm_shard_assign")(spark, d).count()),
      // Round-7.15 probes (Extras32): mau_rolling's 28× expansion must
      // stay linear (the whole point of the expand-dedup form); m4 is
      // two windows + one agg over the fact; ltv_cohort is user-grain.
      "q_evt_mau_rolling" -> (d => SparkEntry.queries("q_evt_mau_rolling")(spark, d).count()),
      "q_ts_m4" -> (d => SparkEntry.queries("q_ts_m4")(spark, d).count()),
      "q_evt_ltv_cohort" -> (d => SparkEntry.queries("q_evt_ltv_cohort")(spark, d).count()),
      // Round-8.1 probes (Extras33): churn is (user, week)-grain dedup +
      // self-equi-join; dup_ngrams is one explode + groupBy over the 8×
      // suffixed corpus (vocabulary suffix ⇒ replicas share no 5-grams,
      // so the grouped key space grows linearly); snapshot_diff is one
      // co-partitioned full join on the 8× remapped key space.
      "q_evt_churn" -> (d => SparkEntry.queries("q_evt_churn")(spark, d).count()),
      "q_llm_dup_ngrams" -> (d => SparkEntry.queries("q_llm_dup_ngrams")(spark, d).count()),
      "q_snapshot_diff" -> (d => SparkEntry.queries("q_snapshot_diff")(spark, d).count()),
      // Round-8.2 probes (Extras34): pii_scrub is the embarrassingly-
      // parallel regex pass (must ride the 8× corpus flat per row);
      // reset_cumsum shuffles once on user for both windows over 8×
      // events; streak_weekly is (user, week)-grain like churn.
      "q_llm_pii_audit" -> (d => SparkEntry.queries("q_llm_pii_audit")(spark, d).count()),
      "q_win_reset_cumsum" -> (d => SparkEntry.queries("q_win_reset_cumsum")(spark, d).count()),
      "q_evt_streak_weekly" -> (d => SparkEntry.queries("q_evt_streak_weekly")(spark, d).count()),
      // Round-9 probes (Extras35-37, round-8 verdict #4): two_hop is the
      // biggest unprobed heavyweight — edge-edge equi-join on the middle
      // node, Σdeg² candidates over the 8× user space; cross_dedup's
      // candidates come only from the incoming×existing posting join
      // (suffixed vocabulary ⇒ the posting key space grows linearly);
      // eqdepth walks the distinct-value grid (grows with distinct
      // prices); lifecycle is (user, week)-grain; asof_fwd shares the
      // asof union-window kernel over 8× events. sig_store appears twice:
      // the first timing includes the FixtureCache signature build when
      // no current copy exists (the amortized ingest cost), #warm is the
      // steady-state store read a 100 TB dedup service actually pays.
      "q_graph_two_hop" -> (d => SparkEntry.queries("q_graph_two_hop")(spark, d).count()),
      "q_llm_cross_dedup" -> (d => SparkEntry.queries("q_llm_cross_dedup")(spark, d).count()),
      "q_agg_histogram_eqdepth" -> (d => SparkEntry.queries("q_agg_histogram_eqdepth")(spark, d).count()),
      "q_evt_lifecycle" -> (d => SparkEntry.queries("q_evt_lifecycle")(spark, d).count()),
      "q_join_asof_fwd" -> (d => SparkEntry.queries("q_join_asof_fwd")(spark, d).count()),
      "q_llm_sig_store" -> (d => SparkEntry.queries("q_llm_sig_store")(spark, d).count()),
      "q_llm_sig_store#warm" -> (d => SparkEntry.queries("q_llm_sig_store")(spark, d).count()),
      // Round-9 operator probes (Extras41-48): basket_pairs and
      // type_affinity are pair joins whose candidates are bounded by
      // per-key alphabet sizes; adamic_adar shares the Σ deg² shape;
      // containment/rouge ride the posting kernel; bloom_prefilter's
      // filter build is corpus-sized but its words relation is constant;
      // char_ngrams is a per-row projection + bounded agg; hurst/lttb
      // are calendar-spine window stages.
      "q_evt_basket_pairs" -> (d => SparkEntry.queries("q_evt_basket_pairs")(spark, d).count()),
      "q_evt_type_affinity" -> (d => SparkEntry.queries("q_evt_type_affinity")(spark, d).count()),
      "q_graph_adamic_adar" -> (d => SparkEntry.queries("q_graph_adamic_adar")(spark, d).count()),
      "q_llm_containment" -> (d => SparkEntry.queries("q_llm_containment")(spark, d).count()),
      "q_llm_rouge_overlap" -> (d => SparkEntry.queries("q_llm_rouge_overlap")(spark, d).count()),
      "q_llm_dedup_bloom_prefilter" -> (d => SparkEntry.queries("q_llm_dedup_bloom_prefilter")(spark, d).count()),
      "q_llm_lm_holdout" -> (d => SparkEntry.queries("q_llm_lm_holdout")(spark, d).count()),
      "q_llm_char_ngrams" -> (d => SparkEntry.queries("q_llm_char_ngrams")(spark, d).count()),
      "q_ts_hurst" -> (d => SparkEntry.queries("q_ts_hurst")(spark, d).count()),
      "q_ts_lttb" -> (d => SparkEntry.queries("q_ts_lttb")(spark, d).count()),
      "q_llm_ppl_buckets" -> (d => SparkEntry.queries("q_llm_ppl_buckets")(spark, d).count()),
      "q_agg_spearman" -> (d => SparkEntry.queries("q_agg_spearman")(spark, d).count()),
      // Round-10 probes (round-9 verdict #4 — the post-closing round-9
      // heavyweights that shipped without ratio rows): dedup_card and
      // dup_matrix re-run the posting/pair kernels into accounting rows;
      // threshold_sweep and banding_tradeoff sweep integer thresholds
      // over the SAME pair relation (one kernel pass each);
      // basket_rules/markov_stationary/logrank are alphabet- or
      // state-bounded folds over fact-linear aggs; pit shares the asof
      // union-window kernel; mann_kendall's pair stage is the broadcast
      // calendar² spine (flat ratio expected — that's the claim probed).
      "q_llm_dedup_card" -> (d => SparkEntry.queries("q_llm_dedup_card")(spark, d).count()),
      "q_llm_dup_matrix" -> (d => SparkEntry.queries("q_llm_dup_matrix")(spark, d).count()),
      "q_llm_dedup_threshold_sweep" -> (d => SparkEntry.queries("q_llm_dedup_threshold_sweep")(spark, d).count()),
      "q_llm_banding_tradeoff" -> (d => SparkEntry.queries("q_llm_banding_tradeoff")(spark, d).count()),
      "q_evt_basket_rules" -> (d => SparkEntry.queries("q_evt_basket_rules")(spark, d).count()),
      "q_evt_markov_stationary" -> (d => SparkEntry.queries("q_evt_markov_stationary")(spark, d).count()),
      "q_evt_logrank" -> (d => SparkEntry.queries("q_evt_logrank")(spark, d).count()),
      "q_join_pit" -> (d => SparkEntry.queries("q_join_pit")(spark, d).count()),
      "q_ts_mann_kendall" -> (d => SparkEntry.queries("q_ts_mann_kendall")(spark, d).count()),
      // Round-10 operator probes (parts 1-12): span_corrupt/fim are
      // corpus-linear per-row transforms (the suffixed 8× vocabulary
      // rides along); contamination_13gram's bench side is
      // slice-bounded broadcast; the streaming KMV holds ≤64 longs per
      // key at ANY cardinality (the claim probed); entropy_rate/
      // eigencentrality/pc1 are alphabet-, graph- and dimension-bounded
      // iterations; drift_ks walks the distinct-cents grid; levene
      // sorts per priority partition; bootstrap is a bounded 32×
      // explode; hodges_lehmann/kendall_tau ride the broadcast
      // calendar² spine (flat expected); cuped is user-grain.
      "q_llm_span_corrupt" -> (d => SparkEntry.queries("q_llm_span_corrupt")(spark, d).count()),
      "q_llm_fim_transform" -> (d => SparkEntry.queries("q_llm_fim_transform")(spark, d).count()),
      // Pinned deployment shape (round-10 verdict item 6): the bench
      // slice is capped to the 1× doc_id block (rep 0) so the probe
      // measures a CONSTANT benchmark suite against a K× corpus — the
      // shape a real decontamination screen pays. The cap is a no-op
      // at 1× (every 1× doc_id < 2^20, the replica block offset).
      "q_llm_contamination_13gram" -> (d =>
        operators.Extras73.contamination13(spark, d,
          benchIdCap = 1048576L).count()),
      "q_stream_live_kmv" -> (d => SparkEntry.queries("q_stream_live_kmv")(spark, d).count()),
      "q_evt_markov_entropy_rate" -> (d => SparkEntry.queries("q_evt_markov_entropy_rate")(spark, d).count()),
      "q_graph_eigencentrality" -> (d => SparkEntry.queries("q_graph_eigencentrality")(spark, d).count()),
      "q_llm_embed_pc1" -> (d => SparkEntry.queries("q_llm_embed_pc1")(spark, d).count()),
      "q_dq_drift_ks" -> (d => SparkEntry.queries("q_dq_drift_ks")(spark, d).count()),
      "q_agg_levene" -> (d => SparkEntry.queries("q_agg_levene")(spark, d).count()),
      "q_agg_poisson_bootstrap" -> (d => SparkEntry.queries("q_agg_poisson_bootstrap")(spark, d).count()),
      "q_ts_hodges_lehmann" -> (d => SparkEntry.queries("q_ts_hodges_lehmann")(spark, d).count()),
      "q_ts_kendall_tau" -> (d => SparkEntry.queries("q_ts_kendall_tau")(spark, d).count()),
      "q_evt_cuped" -> (d => SparkEntry.queries("q_evt_cuped")(spark, d).count()),
      "q_agg_kmv_theta" -> (d => SparkEntry.queries("q_agg_kmv_theta")(spark, d).count()),
      "q_stream_live_mor" -> (d => SparkEntry.queries("q_stream_live_mor")(spark, d).count()),
      // Round-11 probes (Extras75): both recurrence kernels are
      // calendar-bounded per series — the fact-sized stage is the
      // (type, day) count agg. At 8× the events replicas shift 64 days
      // apart, so the calendar span itself grows ~15× (31 → ~480
      // days): series length n scales with the SPAN, and the kernels
      // must stay daily-agg-dominated (HW is O(n) state-3 smoothing;
      // DTW is O(n·band) per alphabet-bounded pair).
      "q_ts_holt_winters" -> (d => SparkEntry.queries("q_ts_holt_winters")(spark, d).count()),
      "q_ts_dtw" -> (d => SparkEntry.queries("q_ts_dtw")(spark, d).count()),
      // Round-11 (round-10 verdict item 5): the multi-tenant IVF index
      // beside its lsh/ivf siblings — per-label codebooks, search
      // touches only the query's (label, cell).
      "q_llm_ann_ivf_label" -> (d => SparkEntry.queries("q_llm_ann_ivf_label")(spark, d).count()),
      // Round-11 (Extras76): cochran rides a (user, week, type) dedup
      // over the 8× user space; geohash is one orders pass + bounded
      // 1024-cell agg; the MK breakdown shares the seasonal spine
      // (calendar-bounded — probed to prove the flat ratio).
      "q_agg_cochran_q" -> (d => SparkEntry.queries("q_agg_cochran_q")(spark, d).count()),
      "q_fn_geohash" -> (d => SparkEntry.queries("q_fn_geohash")(spark, d).count()),
      "q_ts_mk_seasonal_breakdown" -> (d => SparkEntry.queries("q_ts_mk_seasonal_breakdown")(spark, d).count()),
      // Round-11 (Extras77): grubbs is one fact agg + one broadcast
      // re-scan (argmax over exact integer deviations); pettitt's pair
      // stage is the broadcast calendar² spine (flat expected);
      // edge_support shares the triangles three-join (Σdeg²-bounded);
      // jsd is one fact pass into 20 bins.
      "q_agg_grubbs" -> (d => SparkEntry.queries("q_agg_grubbs")(spark, d).count()),
      "q_ts_pettitt" -> (d => SparkEntry.queries("q_ts_pettitt")(spark, d).count()),
      "q_graph_edge_support" -> (d => SparkEntry.queries("q_graph_edge_support")(spark, d).count()),
      "q_dq_jsd" -> (d => SparkEntry.queries("q_dq_jsd")(spark, d).count()),
      // Round-11 (Extras78): boilerplate rides the 5-gram posting
      // relation (suffixed 8× vocabulary ⇒ key space grows linearly);
      // readability/stopword are per-row corpus passes; lcs_pairs is a
      // bounded 28-pair broadcast relation (flat expected).
      "q_llm_boilerplate" -> (d => SparkEntry.queries("q_llm_boilerplate")(spark, d).count()),
      "q_llm_readability" -> (d => SparkEntry.queries("q_llm_readability")(spark, d).count()),
      "q_llm_lcs_pairs" -> (d => SparkEntry.queries("q_llm_lcs_pairs")(spark, d).count()),
      // Round-11 (Extras79): sprt/conversion_window are user-grain
      // aggs; path_trigram/session_entropy ride the per-user ordered
      // window over the 8× user space; markov_absorb's iteration is
      // alphabet-bounded (its fact stage is the one lead window).
      "q_evt_sprt" -> (d => SparkEntry.queries("q_evt_sprt")(spark, d).count()),
      "q_evt_path_trigram" -> (d => SparkEntry.queries("q_evt_path_trigram")(spark, d).count()),
      "q_evt_session_entropy" -> (d => SparkEntry.queries("q_evt_session_entropy")(spark, d).count()),
      "q_evt_markov_absorb" -> (d => SparkEntry.queries("q_evt_markov_absorb")(spark, d).count()),
      // Round-11 (Extras80): frame_dedup's fan-out is partition-local
      // (corpus-linear frames into one digest agg); length_outliers
      // runs two per-source order-statistic windows over the 8× doc
      // space; router/prefix are single corpus passes.
      "q_llm_frame_dedup" -> (d => SparkEntry.queries("q_llm_frame_dedup")(spark, d).count()),
      "q_llm_length_outliers" -> (d => SparkEntry.queries("q_llm_length_outliers")(spark, d).count()),
      // Round-11 (Extras81): the bucketed interval join's per-bucket
      // cost is (sessions-per-hour)² — the 8× fixture spreads users
      // over disjoint months, so buckets stay dense-constant and the
      // pair relation grows ~linearly; sample_pergroup must stay a
      // per-group TakeOrdered (top-3 by hash rank).
      "q_join_interval_sessions" -> (d => SparkEntry.queries("q_join_interval_sessions")(spark, d).count()),
      "q_scan_sample_pergroup" -> (d => SparkEntry.queries("q_scan_sample_pergroup")(spark, d).count()),
      // Round-11 (Extras82): decompose/fourier ride the calendar-
      // bounded daily spine (the fixture's 8× orders keep the same
      // calendar, so both should be FLAT); powerlaw_alpha is one
      // degree agg over the growing user graph.
      "q_ts_decompose" -> (d => SparkEntry.queries("q_ts_decompose")(spark, d).count()),
      "q_ts_fourier" -> (d => SparkEntry.queries("q_ts_fourier")(spark, d).count()),
      "q_graph_powerlaw_alpha" -> (d => SparkEntry.queries("q_graph_powerlaw_alpha")(spark, d).count()),
      // Round-11 (Extras83): token_len_hist is one corpus explode into
      // a 15-cell agg; retention_curve is (user, day)-grain over the
      // 8× user space; anomaly_days rides the calendar spine.
      "q_llm_token_len_hist" -> (d => SparkEntry.queries("q_llm_token_len_hist")(spark, d).count()),
      "q_evt_retention_curve" -> (d => SparkEntry.queries("q_evt_retention_curve")(spark, d).count()),
      "q_evt_anomaly_days" -> (d => SparkEntry.queries("q_evt_anomaly_days")(spark, d).count()),
      // Round-11 (Extras84): best_run is calendar-spine prefix windows
      // (flat); ratio_est/diff_in_diff/chisq_gof are user-grain or
      // alphabet-bounded aggs over 8× facts.
      "q_ts_best_run" -> (d => SparkEntry.queries("q_ts_best_run")(spark, d).count()),
      "q_agg_ratio_est" -> (d => SparkEntry.queries("q_agg_ratio_est")(spark, d).count()),
      "q_evt_diff_in_diff" -> (d => SparkEntry.queries("q_evt_diff_in_diff")(spark, d).count()),
      // Round-11 (Extras85): ktruss is 3 support rounds on the sampled
      // co-occurrence graph (Σdeg²-bounded, shrinking); zipf_source is
      // corpus explode → two-phase salted top-50; base64 is a pure
      // per-row codec scan.
      "q_graph_ktruss" -> (d => SparkEntry.queries("q_graph_ktruss")(spark, d).count()),
      "q_llm_zipf_source" -> (d => SparkEntry.queries("q_llm_zipf_source")(spark, d).count()),
      "q_fn_base64" -> (d => SparkEntry.queries("q_fn_base64")(spark, d).count()),
      // Round-11 part-15 heavyweights: sample_entropy is spine²
      // (calendar-bounded — expect FLAT); 4cycles/closeness ride the
      // co-occurrence wedge/BFS joins (Σdeg²-bounded like triangles).
      "q_ts_sample_entropy" -> (d => SparkEntry.queries("q_ts_sample_entropy")(spark, d).count()),
      "q_graph_4cycles" -> (d => SparkEntry.queries("q_graph_4cycles")(spark, d).count()),
      "q_graph_closeness" -> (d => SparkEntry.queries("q_graph_closeness")(spark, d).count()),
      // Round-11 part-16: both corpus-linear (token explode + grouped
      // joins) — expect ≈K.
      "q_llm_rake" -> (d => SparkEntry.queries("q_llm_rake")(spark, d).count()),
      "q_llm_js_sources" -> (d => SparkEntry.queries("q_llm_js_sources")(spark, d).count()),
      // Round-11 part-17..21 heavyweights: cc_by_degree rides the
      // co-occurrence wedge join (Σdeg²-bounded, triangles family);
      // jonckheere folds group tallies over the bounded value spine;
      // beta_rolling / drawdown_duration are calendar-spine windows.
      "q_graph_cc_by_degree" -> (d => SparkEntry.queries("q_graph_cc_by_degree")(spark, d).count()),
      "q_agg_jonckheere" -> (d => SparkEntry.queries("q_agg_jonckheere")(spark, d).count()),
      "q_win_beta_rolling" -> (d => SparkEntry.queries("q_win_beta_rolling")(spark, d).count()),
      "q_ts_drawdown_duration" -> (d => SparkEntry.queries("q_ts_drawdown_duration")(spark, d).count()),
      // Round-11 part-22..29: bm25/mattr/heaps/mtld are corpus-linear
      // token pipelines (expect ≈K or better); croston is the per-part
      // recurrence kernel; brunner_munzel folds the bounded value
      // spine; nelson_aalen rides the customer-lifetime duration spine.
      "q_llm_bm25" -> (d => SparkEntry.queries("q_llm_bm25")(spark, d).count()),
      "q_llm_mattr" -> (d => SparkEntry.queries("q_llm_mattr")(spark, d).count()),
      "q_llm_heaps_law" -> (d => SparkEntry.queries("q_llm_heaps_law")(spark, d).count()),
      "q_llm_mtld" -> (d => SparkEntry.queries("q_llm_mtld")(spark, d).count()),
      "q_ts_croston" -> (d => SparkEntry.queries("q_ts_croston")(spark, d).count()),
      "q_agg_brunner_munzel" -> (d => SparkEntry.queries("q_agg_brunner_munzel")(spark, d).count()),
      "q_evt_nelson_aalen" -> (d => SparkEntry.queries("q_evt_nelson_aalen")(spark, d).count()),
      // Round-11 part-30..40 heavyweights: the adapted TPC-H star
      // joins; MMR's corpus-linear scored scan + bounded greedy;
      // Shapley's user fold; the dedup cascade's banded min-join;
      // 4-gram coverage's two-phase top-k; tau-b's bounded cell walk;
      // binary segmentation's two spine argmax passes.
      "q_sql_q2a" -> (d => SparkEntry.queries("q_sql_q2a")(spark, d).count()),
      "q_sql_q9a" -> (d => SparkEntry.queries("q_sql_q9a")(spark, d).count()),
      "q_sql_q20a" -> (d => SparkEntry.queries("q_sql_q20a")(spark, d).count()),
      "q_llm_mmr" -> (d => SparkEntry.queries("q_llm_mmr")(spark, d).count()),
      "q_evt_attribution_shapley" -> (d => SparkEntry.queries("q_evt_attribution_shapley")(spark, d).count()),
      "q_llm_dedup_cascade" -> (d => SparkEntry.queries("q_llm_dedup_cascade")(spark, d).count()),
      "q_llm_ngram_coverage" -> (d => SparkEntry.queries("q_llm_ngram_coverage")(spark, d).count()),
      "q_agg_tau_b" -> (d => SparkEntry.queries("q_agg_tau_b")(spark, d).count()),
      "q_ts_binary_segmentation" -> (d => SparkEntry.queries("q_ts_binary_segmentation")(spark, d).count()),
      "q_ts_haar_energy" -> (d => SparkEntry.queries("q_ts_haar_energy")(spark, d).count()),
      // Round-11 part-41/42: the 50-permutation md5 reassignment is
      // the one deliberate fact×50 fan-out (linear, no materialized
      // resamples); by_fdr joins the broadcast part dim.
      "q_agg_permutation_test" -> (d => SparkEntry.queries("q_agg_permutation_test")(spark, d).count()),
      "q_agg_by_fdr" -> (d => SparkEntry.queries("q_agg_by_fdr")(spark, d).count()),
      // Round-11 parts 44-46: zipf_per_source ranks the (source, token)
      // vocab relation (suffixed 8× vocabulary ⇒ linear keys);
      // siegel_tukey is the one ordered pass over the two-priority
      // slice (exact-median family — n·log n is the claim probed);
      // bigram_jaccard self-joins the distinct (source, bigram)
      // relation (posting-shaped: suffixed vocab keeps pairs linear);
      // lombscargle crosses the calendar-bounded daily spine with the
      // 28-row period spine (flat expected).
      "q_llm_zipf_per_source" -> (d => SparkEntry.queries("q_llm_zipf_per_source")(spark, d).count()),
      "q_agg_siegel_tukey" -> (d => SparkEntry.queries("q_agg_siegel_tukey")(spark, d).count()),
      "q_llm_bigram_jaccard" -> (d => SparkEntry.queries("q_llm_bigram_jaccard")(spark, d).count()),
      "q_ts_lombscargle" -> (d => SparkEntry.queries("q_ts_lombscargle")(spark, d).count()),
      // Round-11 parts 47-51: RAKE is the corpus-linear per-doc
      // stopword-run window into vocab-bounded scoring; PQ's encode is
      // fact×64-codeword broadcast; hampel rides the 25-day collect
      // window; variogram is the calendar×30-lag self-join.
      "q_llm_rake_keyphrases" -> (d => SparkEntry.queries("q_llm_rake_keyphrases")(spark, d).count()),
      "q_llm_ann_pq" -> (d => SparkEntry.queries("q_llm_ann_pq")(spark, d).count()),
      "q_win_hampel" -> (d => SparkEntry.queries("q_win_hampel")(spark, d).count()),
      "q_ts_variogram" -> (d => SparkEntry.queries("q_ts_variogram")(spark, d).count()),
      // Round-11 parts 55-58: cindex folds a bounded grid (flat
      // expected); hoeffding/apen/rqa ride the broadcast calendar²
      // pair spine (flat — the kendall claim); median_boot's pick
      // spine is 50×calendar; welch is segments×harmonics bounded.
      "q_evt_cindex" -> (d => SparkEntry.queries("q_evt_cindex")(spark, d).count()),
      "q_ts_hoeffding_d" -> (d => SparkEntry.queries("q_ts_hoeffding_d")(spark, d).count()),
      "q_ts_approx_entropy" -> (d => SparkEntry.queries("q_ts_approx_entropy")(spark, d).count()),
      "q_ts_rqa" -> (d => SparkEntry.queries("q_ts_rqa")(spark, d).count()),
      "q_ts_median_boot_ci" -> (d => SparkEntry.queries("q_ts_median_boot_ci")(spark, d).count()),
      "q_ts_welch" -> (d => SparkEntry.queries("q_ts_welch")(spark, d).count()),
      // Round-11 parts 59-62: PPR iterates the micro-rank kernel over
      // the 8× edge relation (pagerank's shape); elbow/standardize are
      // corpus-linear embedding folds; fixedwidth times the text
      // round-trip (write + parse).
      "q_graph_ppr" -> (d => SparkEntry.queries("q_graph_ppr")(spark, d).count()),
      "q_llm_kmeans_elbow" -> (d => SparkEntry.queries("q_llm_kmeans_elbow")(spark, d).count()),
      "q_llm_embed_standardize" -> (d => SparkEntry.queries("q_llm_embed_standardize")(spark, d).count()),
      "q_source_fixedwidth" -> (d => SparkEntry.queries("q_source_fixedwidth")(spark, d).count()),
      // Round-12 probes (Extras137/138): ivfpq's encode is corpus-linear
      // and its ADC scan is CELL-PRUNED (must not scale with the full
      // corpus); dedup_incremental is batch-linear signatures + a banded
      // store probe (the store build itself is prewarmed fixture work);
      // scc's closure is per-SCC quadratic by design — the probe guards
      // the replica-disjoint case staying ~linear; fouter carries
      // two-sided stream state; listagg is one custkey window pass.
      "q_llm_ann_ivfpq" -> (d => SparkEntry.queries("q_llm_ann_ivfpq")(spark, d).count()),
      "q_llm_dedup_incremental" -> (d => SparkEntry.queries("q_llm_dedup_incremental")(spark, d).count()),
      "q_graph_scc" -> (d => SparkEntry.queries("q_graph_scc")(spark, d).count()),
      "q_stream_live_fouter" -> (d => SparkEntry.queries("q_stream_live_fouter")(spark, d).count()),
      "q_win_listagg" -> (d => SparkEntry.queries("q_win_listagg")(spark, d).count()),
      "q_ts_lombscargle_fap" -> (d => SparkEntry.queries("q_ts_lombscargle_fap")(spark, d).count()),
      // Round-12 parts 3-6: scc_dag reuses the closure kernel plus one
      // edge-label join; cdc_chunk is the corpus-linear explode+window;
      // adstock's 31-day lookback is a broadcast non-equi join over the
      // calendar-bounded spine; activation/sign_test/kendall_w/
      // shrunk_mean are fact-fold + bounded-grid shapes; the two source
      // keys time LAYOUT BUILD + PARSE together (fixedwidth convention);
      // sample_weighted is one pass + TakeOrdered heaps.
      "q_graph_scc_dag" -> (d => SparkEntry.queries("q_graph_scc_dag")(spark, d).count()),
      "q_llm_cdc_chunk" -> (d => SparkEntry.queries("q_llm_cdc_chunk")(spark, d).count()),
      "q_evt_adstock" -> (d => SparkEntry.queries("q_evt_adstock")(spark, d).count()),
      "q_evt_activation" -> (d => SparkEntry.queries("q_evt_activation")(spark, d).count()),
      "q_agg_kendall_w" -> (d => SparkEntry.queries("q_agg_kendall_w")(spark, d).count()),
      "q_agg_sign_test" -> (d => SparkEntry.queries("q_agg_sign_test")(spark, d).count()),
      "q_ts_sen_seasonal" -> (d => SparkEntry.queries("q_ts_sen_seasonal")(spark, d).count()),
      "q_agg_shrunk_mean" -> (d => SparkEntry.queries("q_agg_shrunk_mean")(spark, d).count()),
      "q_source_decimal128" -> (d => SparkEntry.queries("q_source_decimal128")(spark, d).count()),
      "q_source_csv_newlines" -> (d => SparkEntry.queries("q_source_csv_newlines")(spark, d).count()),
      "q_graph_core_density" -> (d => SparkEntry.queries("q_graph_core_density")(spark, d).count()),
      "q_scan_sample_weighted" -> (d => SparkEntry.queries("q_scan_sample_weighted")(spark, d).count()),
      "q_sql_groupby_all" -> (d => SparkEntry.queries("q_sql_groupby_all")(spark, d).count()),
      "q_sql_values_join" -> (d => SparkEntry.queries("q_sql_values_join")(spark, d).count()),
      "q_sql_lateral_view" -> (d => SparkEntry.queries("q_sql_lateral_view")(spark, d).count()),
      "q_ts_page_hinkley_two" -> (d => SparkEntry.queries("q_ts_page_hinkley_two")(spark, d).count()),
      "q_stream_live_complete" -> (d => SparkEntry.queries("q_stream_live_complete")(spark, d).count()),
      // Round-12 parts 7-10: circular/benford/trimean/ml keys fold the
      // fact table into bounded spines; sentences/charclass are
      // corpus-linear regex passes; velocity is one user-shuffle RANGE
      // window; attribution_decay is the per-user purchase×touch
      // window join; pvm/new_vs_returning ride calendar/custkey
      // shuffles; string4/array3 are codegen'd projections.
      "q_ts_circular_hour" -> (d => SparkEntry.queries("q_ts_circular_hour")(spark, d).count()),
      "q_llm_sentences" -> (d => SparkEntry.queries("q_llm_sentences")(spark, d).count()),
      "q_evt_velocity_max" -> (d => SparkEntry.queries("q_evt_velocity_max")(spark, d).count()),
      "q_agg_benford_mad" -> (d => SparkEntry.queries("q_agg_benford_mad")(spark, d).count()),
      "q_fn_string4" -> (d => SparkEntry.queries("q_fn_string4")(spark, d).count()),
      "q_sql_unpivot" -> (d => SparkEntry.queries("q_sql_unpivot")(spark, d).count()),
      "q_dq_temporal_order" -> (d => SparkEntry.queries("q_dq_temporal_order")(spark, d).count()),
      "q_evt_new_vs_returning" -> (d => SparkEntry.queries("q_evt_new_vs_returning")(spark, d).count()),
      "q_ml_f1_sweep" -> (d => SparkEntry.queries("q_ml_f1_sweep")(spark, d).count()),
      "q_ml_calibration" -> (d => SparkEntry.queries("q_ml_calibration")(spark, d).count()),
      "q_llm_charclass" -> (d => SparkEntry.queries("q_llm_charclass")(spark, d).count()),
      "q_agg_price_volume" -> (d => SparkEntry.queries("q_agg_price_volume")(spark, d).count()),
      "q_evt_attribution_decay" -> (d => SparkEntry.queries("q_evt_attribution_decay")(spark, d).count()),
      "q_dq_domain" -> (d => SparkEntry.queries("q_dq_domain")(spark, d).count()),
      "q_agg_trimean" -> (d => SparkEntry.queries("q_agg_trimean")(spark, d).count()),
      "q_fn_array3" -> (d => SparkEntry.queries("q_fn_array3")(spark, d).count()),
      "q_stream_live_router" -> (d => SparkEntry.queries("q_stream_live_router")(spark, d).count()),
      "q_evt_match_recognize" -> (d => SparkEntry.queries("q_evt_match_recognize")(spark, d).count()),
      "q_graph_densest" -> (d => SparkEntry.queries("q_graph_densest")(spark, d).count()),
      "q_sql_unpivot_multi" -> (d => SparkEntry.queries("q_sql_unpivot_multi")(spark, d).count()),
      // Round-13 part 2: residual IVF-PQ shares ivfpq's shape (corpus-
      // linear assign+encode, cell-pruned ADC) plus one broadcast
      // centroid-subtraction join; the ratio must stay ~linear.
      "q_llm_ann_ivfpq_residual" -> (d => SparkEntry.queries("q_llm_ann_ivfpq_residual")(spark, d).count()),
      // hnsw: graph build is quadratic WITHIN adaptive cells (Σ occ²/c),
      // search is beam-bounded — the ratio guards the build staying
      // near-linear as cells widen with the corpus.
      "q_llm_ann_hnsw" -> (d => SparkEntry.queries("q_llm_ann_hnsw")(spark, d).count()),
      // Round-13 part 3: matrix profile pairs the CALENDAR-bounded
      // daily spine (positions don't grow with fact volume — the
      // ratio guards the fact fold only); qini/pca2/mix/logit are
      // single fact folds into bounded spines.
      "q_ts_matrix_profile" -> (d => SparkEntry.queries("q_ts_matrix_profile")(spark, d).count()),
      "q_ts_discord" -> (d => SparkEntry.queries("q_ts_discord")(spark, d).count()),
      "q_ml_qini" -> (d => SparkEntry.queries("q_ml_qini")(spark, d).count()),
      "q_agg_pca2" -> (d => SparkEntry.queries("q_agg_pca2")(spark, d).count()),
      "q_llm_mix_temperature" -> (d => SparkEntry.queries("q_llm_mix_temperature")(spark, d).count()),
      "q_llm_quality_logit" -> (d => SparkEntry.queries("q_llm_quality_logit")(spark, d).count()),
      // Round-13 part 4: core_decomp = 12 bounded peels over the 8×
      // edge relation; esd/dominant_period ride the calendar-bounded
      // daily spine; isotonic is a 10-cell minimax; named_window is
      // one custkey window pass; curriculum one corpus ntile pass.
      "q_graph_core_decomp" -> (d => SparkEntry.queries("q_graph_core_decomp")(spark, d).count()),
      "q_ts_esd_outliers" -> (d => SparkEntry.queries("q_ts_esd_outliers")(spark, d).count()),
      "q_ts_dominant_period" -> (d => SparkEntry.queries("q_ts_dominant_period")(spark, d).count()),
      "q_ml_isotonic_calibration" -> (d => SparkEntry.queries("q_ml_isotonic_calibration")(spark, d).count()),
      "q_sql_named_window" -> (d => SparkEntry.queries("q_sql_named_window")(spark, d).count()),
      "q_llm_curriculum" -> (d => SparkEntry.queries("q_llm_curriculum")(spark, d).count()),
      // Round-13 part 5: one orders fold each (oba/snaive/records);
      // cart is one user-shuffle click×purchase join.
      "q_sql_order_by_all" -> (d => SparkEntry.queries("q_sql_order_by_all")(spark, d).count()),
      "q_ts_snaive" -> (d => SparkEntry.queries("q_ts_snaive")(spark, d).count()),
      "q_ts_records" -> (d => SparkEntry.queries("q_ts_records")(spark, d).count()),
      "q_evt_cart_abandonment" -> (d => SparkEntry.queries("q_evt_cart_abandonment")(spark, d).count()),
      // Round-13 part 6: lloyd adds ONE corpus groupBy (M-step) and a
      // second packed encode to the residual skeleton — the ratio must
      // stay ~linear like ivfpq_residual; hnsw_ml adds the strided L1
      // graph ((nv/16)²/cell) + 3 four-row greedy hops on top of the
      // hnsw base build, so its ratio tracks hnsw's.
      "q_llm_ann_ivfpq_lloyd" -> (d => SparkEntry.queries("q_llm_ann_ivfpq_lloyd")(spark, d).count()),
      "q_llm_ann_hnsw_ml" -> (d => SparkEntry.queries("q_llm_ann_hnsw_ml")(spark, d).count()),
      // Round-13 part 7: three discount-spine ML folds (log_loss /
      // fairness with broadcast dim groups / per-fold AUC), two
      // single-window SQL surfaces, and the 3-fold density audit.
      "q_ml_log_loss" -> (d => SparkEntry.queries("q_ml_log_loss")(spark, d).count()),
      "q_ml_fairness_parity" -> (d => SparkEntry.queries("q_ml_fairness_parity")(spark, d).count()),
      "q_ml_cv_auc" -> (d => SparkEntry.queries("q_ml_cv_auc")(spark, d).count()),
      "q_join_positional" -> (d => SparkEntry.queries("q_join_positional")(spark, d).count()),
      "q_sql_distinct_on" -> (d => SparkEntry.queries("q_sql_distinct_on")(spark, d).count()),
      "q_dq_key_density" -> (d => SparkEntry.queries("q_dq_key_density")(spark, d).count()),
      // Round-13 part 8: bowtie/diameter ride the sampled-population
      // closure/BFS kernels (bounded like scc/bfs); session_window is
      // one user shuffle; kish a map-side fold.
      "q_graph_bowtie" -> (d => SparkEntry.queries("q_graph_bowtie")(spark, d).count()),
      "q_graph_diameter" -> (d => SparkEntry.queries("q_graph_diameter")(spark, d).count()),
      "q_win_session_window" -> (d => SparkEntry.queries("q_win_session_window")(spark, d).count()),
      "q_agg_kish_deff" -> (d => SparkEntry.queries("q_agg_kish_deff")(spark, d).count()),
      // Round-13 part 9: privacy pair = one orders shuffle onto the
      // bounded QI grid; delong = the discount-spine fold; xml = the
      // FixtureCache'd round-trip (ingest charged to prewarm).
      "q_dq_l_diversity" -> (d => SparkEntry.queries("q_dq_l_diversity")(spark, d).count()),
      "q_dq_t_closeness" -> (d => SparkEntry.queries("q_dq_t_closeness")(spark, d).count()),
      "q_ml_auc_delong" -> (d => SparkEntry.queries("q_ml_auc_delong")(spark, d).count()),
      "q_source_xml" -> (d => SparkEntry.queries("q_source_xml")(spark, d).count()),
      // Round-13 part 10: census enumerates only wedge-connected
      // triples (Σdeg² on the support dyads, the Batagelj-Mrvar
      // form — the first-cut |D|·n enumeration probed 58× at K=8 and
      // was replaced; one-dyad classes derive arithmetically);
      // ap11/tail are spine folds (tail's price spine cum-window is
      // the one to watch).
      "q_graph_triad_census" -> (d => SparkEntry.queries("q_graph_triad_census")(spark, d).count()),
      "q_ml_ap_11point" -> (d => SparkEntry.queries("q_ml_ap_11point")(spark, d).count()),
      "q_agg_tail_dependence" -> (d => SparkEntry.queries("q_agg_tail_dependence")(spark, d).count()),
      // Round-13 part 11: shesd = calendar-spine medians + 3 argmax
      // rounds; the other three are single spine/contingency folds.
      "q_ts_shesd" -> (d => SparkEntry.queries("q_ts_shesd")(spark, d).count()),
      "q_ml_youden_cost" -> (d => SparkEntry.queries("q_ml_youden_cost")(spark, d).count()),
      "q_ml_brier_decomp" -> (d => SparkEntry.queries("q_ml_brier_decomp")(spark, d).count()),
      "q_agg_mutual_info" -> (d => SparkEntry.queries("q_agg_mutual_info")(spark, d).count()),
      // Round-13 part 12: mrr/rbo = one corpus pass against ≤4
      // broadcast queries; durbin_watson = calendar-spine fold.
      "q_llm_mrr" -> (d => SparkEntry.queries("q_llm_mrr")(spark, d).count()),
      "q_llm_rbo" -> (d => SparkEntry.queries("q_llm_rbo")(spark, d).count()),
      "q_ts_durbin_watson" -> (d => SparkEntry.queries("q_ts_durbin_watson")(spark, d).count()),
      // Round-13 part 13: one orders fold + two calendar lag windows.
      "q_ts_arma11_hr" -> (d => SparkEntry.queries("q_ts_arma11_hr")(spark, d).count()),
      // Round-14 part 1: both ride the amortized-index convention —
      // the 1x/Kx probes include a cold index build on first touch
      // (FixtureCache-keyed per corpus), then search.
      "q_llm_ann_ivfpq_lloyd2" -> (d => SparkEntry.queries("q_llm_ann_ivfpq_lloyd2")(spark, d).count()),
      "q_llm_ann_hnsw_bestfirst" -> (d => SparkEntry.queries("q_llm_ann_hnsw_bestfirst")(spark, d).count()),
      // Round-14 part 2: the MAN census rides the wedge-bounded base
      // census + a 16-row broadcast spine.
      "q_graph_triad_census_man" -> (d => SparkEntry.queries("q_graph_triad_census_man")(spark, d).count())
    )
    println(f"${"probe"}%-22s ${"t_1x"}%8s ${"rows_1x"}%9s ${"t_Kx"}%8s ${"rows_Kx"}%9s ${"ratio"}%6s  (K=$k)")
    probes
      .filter { case (name, _) =>
        only.isEmpty || only(name) || only(name.stripSuffix("#warm")) }
      .foreach { case (name, f) =>
        val (t1, n1) = time(f(sf))
        val (tk, nk) = time(f(out))
        println(f"$name%-22s $t1%8.2f $n1%9d $tk%8.2f $nk%9d ${tk / t1}%6.2f")
      }

    // ANN recall vs the brute-force exact top-5 (round-6 advice #6): the
    // LSH/IVF queries trade recall for pruning; measure the trade at 1×
    // and K× instead of arguing it. Brute force scores every corpus
    // vector against query vec 0 with a float dot product — fine for a
    // probe (recall is a set metric, not a hash).
    def bruteTop5(d: String): Set[Long] = {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q0 = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q0))
        .select(col("vec_id"), expr(
          """aggregate(zip_with(embedding, qe,
               (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
               0D, (a, x) -> a + x)""").as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5).collect().map(_.getLong(0)).toSet
    }
    def annTop5(key: String, d: String): Set[Long] =
      SparkEntry.queries(key)(spark, d)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    for (key <- Seq("q_llm_ann_lsh", "q_llm_ann_lsh_adaptive",
                    "q_llm_ann_ivf")
         if only.isEmpty || only(key)) {
      val r1 = (annTop5(key, sf) & bruteTop5(sf)).size / 5.0
      val rk = (annTop5(key, out) & bruteTop5(out)).size / 5.0
      println(f"recall $key%-18s 1x=$r1%4.2f ${k}x=$rk%4.2f (top-5 vs brute force)")
    }
    // Per-label (multi-tenant) recall: the ivf_label index only ever
    // searches the query's own label partition, so its ground truth is
    // the brute-force top-5 WITHIN vec 0's label — a tenant query is
    // never supposed to surface another tenant's vectors.
    def bruteTop5Label(d: String): Set[Long] = {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q0 = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("label").as("ql"))
      emb.where(col("vec_id") =!= 0)
        .join(broadcast(q0), col("label") === col("ql"))
        .select(col("vec_id"), expr(
          """aggregate(zip_with(embedding, qe,
               (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
               0D, (a, x) -> a + x)""").as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5).collect().map(_.getLong(0)).toSet
    }
    if (only.isEmpty || only("q_llm_ann_ivf_label")) {
      val key = "q_llm_ann_ivf_label"
      val r1 = (annTop5(key, sf) & bruteTop5Label(sf)).size / 5.0
      val rk = (annTop5(key, out) & bruteTop5Label(out)).size / 5.0
      println(f"recall $key%-18s 1x=$r1%4.2f ${k}x=$rk%4.2f (top-5 vs in-label brute force)")
    }
    // IVF-PQ recall@10 vs the brute-force exact L2 top-10 per query
    // (queries 0..3, the key's own spine; qids derive from the query
    // output below — 100..103 was only the A/B recorded in
    // BASELINE.md) — measures the coarse
    // cell-prune + ADC loss against ground truth, averaged over the 4
    // queries. Double L2 over the same 6-dp quantized components is
    // fine for a set metric.
    // The residual variant reports alongside the non-residual baseline
    // (round-12 verdict item 6: residual recall must be >= non-residual
    // at BOTH 1x and Kx — the whole point of encoding v - centroid).
    val ivfpqRecallKeys = Seq("q_llm_ann_ivfpq", "q_llm_ann_ivfpq_residual",
        "q_llm_ann_hnsw", "q_llm_ann_ivfpq_lloyd", "q_llm_ann_hnsw_ml",
        "q_llm_ann_ivfpq_lloyd2", "q_llm_ann_hnsw_bestfirst",
        "q_llm_ann_hnsw_div")
      .filter(kk => only.isEmpty || only(kk))
    if (ivfpqRecallKeys.nonEmpty) {
      def bruteTop10(d: String, qid: Long): Set[Long] = {
        val emb = spark.read.parquet(s"$d/embeddings.parquet")
        val q0 = emb.where(col("vec_id") === qid)
          .select(col("embedding").as("qe"))
        emb.where(col("vec_id") =!= qid).crossJoin(broadcast(q0))
          .select(col("vec_id"), expr(
            """aggregate(zip_with(embedding, qe,
                 (x, y) -> (round(CAST(x AS DOUBLE), 6)
                            - round(CAST(y AS DOUBLE), 6))
                           * (round(CAST(x AS DOUBLE), 6)
                              - round(CAST(y AS DOUBLE), 6))),
                 0D, (a, x) -> a + x)""").as("d2"))
          .orderBy(col("d2"), col("vec_id"))
          .limit(10).collect().map(_.getLong(0)).toSet
      }
      def ivfpqTop10(key: String, d: String): Map[Long, Set[Long]] =
        SparkEntry.queries(key)(spark, d)
          .select("qid", "vec_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) =>
            q -> rs.map(_.getLong(1)).toSet }
      def recall(key: String, d: String): Double = {
        val got = ivfpqTop10(key, d)
        val qs = got.keys.toSeq.sorted
        qs.map(q => (got(q) & bruteTop10(d, q)).size / 10.0).sum / qs.size
      }
      ivfpqRecallKeys.foreach { key =>
        val r1 = recall(key, sf)
        val rk = recall(key, out)
        println(f"recall $key%-25s 1x=$r1%4.2f ${k}x=$rk%4.2f (recall@10 vs brute force, mean over 4 queries)")
      }
      // best-first over the DIVERSIFIED graph (round-14 verdict item
      // 4's A/B: both search algorithms on both graphs) — not a graded
      // key, measured through the shared search helper directly
      if (ivfpqRecallKeys.contains("q_llm_ann_hnsw_div")) {
        def bfDivTop10(d: String): Map[Long, Set[Long]] =
          operators.Extras160.hnswBestFirstSearch(spark,
              operators.Extras148.buildHnswIndex(spark, d,
                diversify = true))
            .select("qid", "vec_id").collect()
            .groupBy(_.getLong(0)).map { case (qq, rs) =>
              qq -> rs.map(_.getLong(1)).toSet }
        def bfRecall(d: String): Double = {
          val got = bfDivTop10(d)
          val qs = got.keys.toSeq.sorted
          qs.map(qq => (got(qq) & bruteTop10(d, qq)).size / 10.0)
            .sum / qs.size
        }
        val r1 = bfRecall(sf)
        val rk = bfRecall(out)
        println(f"recall bestfirst@div-graph      1x=$r1%4.2f ${k}x=$rk%4.2f (recall@10 vs brute force, mean over 4 queries)")
        // budget-vs-edge-bound probe: the graded beam spec is 5
        // rounds on both engines; one extra round tells whether the
        // residual Kx misses are round-budget losses (recall rises)
        // or true reachability losses (flat)
        def beamRounds(d: String, g: Boolean, rounds: Int): Double = {
          val got = operators.Extras148.hnswBeamSearch(spark,
              operators.Extras148.buildHnswIndex(spark, d,
                diversify = g), rounds)
            .select("qid", "vec_id").collect()
            .groupBy(_.getLong(0)).map { case (qq, rs) =>
              qq -> rs.map(_.getLong(1)).toSet }
          val qs = got.keys.toSeq.sorted
          qs.map(qq => (got(qq) & bruteTop10(d, qq)).size / 10.0)
            .sum / qs.size
        }
        val b6p = beamRounds(out, false, 6)
        val b6d = beamRounds(out, true, 6)
        println(f"recall beam-rounds=6 @${k}x         plain=$b6p%4.2f div=$b6d%4.2f (budget-bound probe)")
        // ef-budget probe for the Kx best-first dip on the richer
        // graph: ef=24/cap=24 (still bounded driver rounds)
        def bfEf(d: String, ef: Int): Double = {
          val got = operators.Extras160.hnswBestFirstSearch(spark,
              operators.Extras148.buildHnswIndex(spark, d,
                diversify = true), ef, ef + 8)
            .select("qid", "vec_id").collect()
            .groupBy(_.getLong(0)).map { case (qq, rs) =>
              qq -> rs.map(_.getLong(1)).toSet }
          val qs = got.keys.toSeq.sorted
          qs.map(qq => (got(qq) & bruteTop10(d, qq)).size / 10.0)
            .sum / qs.size
        }
        val bf24 = bfEf(out, 24)
        println(f"recall bestfirst@div ef=24 @${k}x   $bf24%4.2f (ef-budget probe)")
        // M0=2M layer-0 degree A/B (round-15 verdict item 3): the 8×
        // best-first dip on the diversified graph is topology-bound
        // (ef=24 flat) — the paper's remedy is layer-0 degree M0 = 2M,
        // not more budget. Same pool, same RNG prune, keep 16 edges
        // instead of 8; best-first ef=16 recall at 1× and K× against
        // the graded M0=8 line. Promote to a graded key ONLY if the
        // K× read is ≥ 0.88 (the plain-graph line).
        def bfM0(d: String, m0: Int): Double = {
          val got = operators.Extras160.hnswBestFirstSearch(spark,
              operators.Extras148.buildHnswIndex(spark, d,
                diversify = true, m0 = m0))
            .select("qid", "vec_id").collect()
            .groupBy(_.getLong(0)).map { case (qq, rs) =>
              qq -> rs.map(_.getLong(1)).toSet }
          val qs = got.keys.toSeq.sorted
          qs.map(qq => (got(qq) & bruteTop10(d, qq)).size / 10.0)
            .sum / qs.size
        }
        val m01 = bfM0(sf, 16)
        val m0k = bfM0(out, 16)
        println(f"recall bestfirst@div M0=16 1x=$m01%4.2f ${k}x=$m0k%4.2f (layer-0-degree probe; graded M0=8 line above)")
      }
    }

    // Banded-dedup exact-verify RECALL at 1× and K× (round-14 verdict
    // item 8: extend the contamination/ANN-recall evidence pattern to
    // the dedup family). The graded banded keys exact-verify their
    // CANDIDATES, so their precision is 1.0 by construction — what the
    // banding trades away is RECALL: true near-pairs whose signatures
    // never collide in any band. Ground truth over all pairs is O(n²),
    // so it is computed ONE-SIDED: ~80 deterministically sampled query
    // docs (corpus-proportional modulus — the probe-count is constant
    // at any scale) against the full corpus; recall = the fraction of
    // a sampled doc's true near-pairs the graded key's output contains.
    val dedupRecallKeys = Seq("q_llm_dedup_minhash", "q_llm_simhash_lsh")
      .filter(kk => only.isEmpty || only(kk))
    if (dedupRecallKeys.nonEmpty) {
      import graft.Det.md5long
      def sampled(d: String) = {
        val n = spark.read.parquet(s"$d/documents.parquet").count()
        val m = math.max(1L, n / 80)
        spark.read.parquet(s"$d/documents.parquet")
          .where(pmod(md5long(col("doc_id").cast("string")), lit(m)) === 0)
          .select(col("doc_id").as("qid"))
      }
      def norm(a: Long, b: Long) = (math.min(a, b), math.max(a, b))
      def keyPairs(key: String, d: String): Set[(Long, Long)] =
        SparkEntry.queries(key)(spark, d)
          .select("doc_a", "doc_b").collect()
          .map(r => norm(r.getLong(0), r.getLong(1))).toSet
      if (dedupRecallKeys.contains("q_llm_dedup_minhash")) {
        def truth(d: String): Set[(Long, Long)] = {
          val rows = operators.LlmOps.shingleTrips(spark, d)
          val qs = rows.join(broadcast(sampled(d)),
              col("doc_id") === col("qid"))
            .select(col("qid"), col("s0"), col("nsh").as("nq"))
          qs.join(rows, Seq("s0"))
            .where(col("doc_id") =!= col("qid"))
            .groupBy(col("qid"), col("doc_id"))
            .agg(count(lit(1)).as("inter"),
              min(col("nq")).cast("long").as("na"),
              min(col("nsh")).cast("long").as("nb"))
            .where(col("inter").cast("double")
              / (col("na") + col("nb") - col("inter")) >= 0.6)
            .select(col("qid"), col("doc_id")).collect()
            .map(r => norm(r.getLong(0), r.getLong(1))).toSet
        }
        def rec(d: String): (Double, Int) = {
          val t = truth(d)
          if (t.isEmpty) (1.0, 0)
          else ((t & keyPairs("q_llm_dedup_minhash", d)).size.toDouble
            / t.size, t.size)
        }
        val (r1, n1) = rec(sf)
        val (rk, nk) = rec(out)
        println(f"recall q_llm_dedup_minhash banding 1x=$r1%4.2f (truth n=$n1) ${k}x=$rk%4.2f (truth n=$nk) — J>=0.6 pairs of ~80 sampled docs")
        // Near-threshold SYNTHETIC truth pairs (round-15 verdict item
        // 4): the sampled one-sided truth set is tiny (n=7 at 8×) and
        // its observed pairs sit far above the banding curve's knee, so
        // it proves "no sampled pair missed", not a recall DISTRIBUTION.
        // 80 seeded pairs at exact Jaccard 0.55/0.60/0.65/0.70/0.75 (16
        // per level; every token disjoint from the corpus and from every
        // other pair, so truth J is (m−2)/(m+2k−2) by construction) are
        // unioned into a COPY of the corpus and the graded key runs
        // unchanged on that dir. A J≥0.6 pair survives the exact-verify
        // iff some band's 4-row signature collides, so per-bucket recall
        // measures the 1−(1−J⁴)⁴ collision curve directly; the J=0.55
        // bucket must stay EMPTY in the output (the exact-verify ≥ 0.6
        // precision guard).
        val pairsPerJ = 16
        // (m shared tokens, k per-side unique tokens) → J = (m−2)/40
        val levels = Seq((24, 9), (26, 8), (28, 7), (30, 6), (32, 5))
        def synthRows: Seq[(Long, String)] = {
          var pid = 0
          val buf = Seq.newBuilder[(Long, String)]
          for (_ <- levels; _ <- 0 until pairsPerJ) {
            val shared = (0 until levels(pid / pairsPerJ)._1)
              .map(i => s"zq${pid}x$i")
            val kk = levels(pid / pairsPerJ)._2
            val ta = (0 until kk).map(i => s"zq${pid}a$i")
            val tb = (0 until kk).map(i => s"zq${pid}b$i")
            buf += ((10000000L + pid * 2L, (shared ++ ta).mkString(" ")))
            buf += ((10000000L + pid * 2L + 1, (shared ++ tb).mkString(" ")))
            pid += 1
          }
          buf.result()
        }
        def synthProbe(d: String, label: String): Unit = {
          import spark.implicits._
          val synth = synthRows.toDF("doc_id", "text")
            .withColumn("lang", lit("xx"))
            .withColumn("source", lit("synthetic"))
            .withColumn("n_chars", length(col("text")))
          val tmpd = java.nio.file.Files
            .createTempDirectory("graft_minhash_truth").toString
          spark.read.parquet(s"$d/documents.parquet")
            .select("doc_id", "text", "lang", "source", "n_chars")
            .unionByName(synth)
            .write.mode("overwrite").parquet(s"$tmpd/documents.parquet")
          val got = keyPairs("q_llm_dedup_minhash", tmpd)
          for (((m, _), li) <- levels.zipWithIndex) {
            val jTrue = (m - 2) / 40.0
            val ids = (0 until pairsPerJ).map { j =>
              val pid = li * pairsPerJ + j
              (10000000L + pid * 2L, 10000000L + pid * 2L + 1)
            }
            val hit = ids.count(got.contains)
            val pred = 1 - math.pow(1 - math.pow(jTrue, 4), 4)
            if (jTrue < 0.6)
              println(f"recall minhash-synth@$label J=$jTrue%.2f " +
                f"in-output=$hit/$pairsPerJ (MUST be 0 — exact-verify precision guard)")
            else
              println(f"recall minhash-synth@$label J=$jTrue%.2f " +
                f"meas=${hit.toDouble / pairsPerJ}%4.2f ($hit/$pairsPerJ) " +
                f"pred-band-collision=$pred%4.2f")
          }
        }
        synthProbe(sf, "1x")
        synthProbe(out, s"${k}x")
      }
      if (dedupRecallKeys.contains("q_llm_simhash_lsh")) {
        def truth(d: String): Set[(Long, Long)] = {
          val sig = SparkEntry.queries("q_llm_simhash")(spark, d)
          val qs = sig.join(broadcast(sampled(d)),
              col("doc_id") === col("qid"))
            .select(col("qid"), col("simhash").as("qh"))
          sig.crossJoin(broadcast(qs))
            .where(col("doc_id") =!= col("qid") &&
              bit_count(col("simhash").bitwiseXOR(col("qh"))) <= 6)
            .select(col("qid"), col("doc_id")).collect()
            .map(r => norm(r.getLong(0), r.getLong(1))).toSet
        }
        def rec(d: String): (Double, Int) = {
          val t = truth(d)
          if (t.isEmpty) (1.0, 0)
          else ((t & keyPairs("q_llm_simhash_lsh", d)).size.toDouble
            / t.size, t.size)
        }
        val (r1, n1) = rec(sf)
        val (rk, nk) = rec(out)
        println(f"recall q_llm_simhash_lsh banding  1x=$r1%4.2f (truth n=$n1) ${k}x=$rk%4.2f (truth n=$nk) — hamming<=6 pairs of ~80 sampled docs")
      }
    }
    spark.stop()
  }
}
