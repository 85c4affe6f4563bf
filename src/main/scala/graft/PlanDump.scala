package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Regenerates PLANS.md: the final (AQE-resolved) physical plans of the
  * headline queries, as reviewed for scale. Run after plan-shape changes:
  * sbt "runMain graft.PlanDump". */
object PlanDump {
  val headline: Seq[(String, String)] = Seq(
    "q1_pricing_summary" -> "flagship scan→filter→decimal agg; filter pushed, partial+final HashAggregate",
    "q_scan_offset" -> "offset scan: event_id bound pushed to parquet row-group stats (block skipping)",
    "q_join_sortmerge" -> "large-large equi join: shuffle once on the key, sort-merge",
    "q_join_broadcast" -> "dimension join: explicit broadcast, no shuffle of the fact side",
    "q_join_asof" -> "as-of join: union + running last() window — one shuffle on user_id, linear pass",
    "q_topk" -> "global top-k: TakeOrderedAndProject (per-partition heaps, no full sort)",
    "q_llm_sim_topk" -> "vector search: quantize below the join; codegen'd long_array_dot scoring projection",
    "q_llm_dedup_near" -> "near-dup: single-pass shingle kernel → posting-list pair kernel per hash group → pair-count agg (no self-join, corpus read once)",
    "q_llm_dedup_minhash" -> "MinHash-LSH: one md5/shingle, 16 MIN aggs in one pass, band equi-join candidates",
    "q_stream_session" -> "sessionization: gaps-and-islands, two window passes over one user_id shuffle",
    "q_join_range_bucketed" -> "range join via time buckets: probe intervals exploded to 2 candidate buckets, ONE equi-shuffle, exact range re-check",
    "q_join_salted" -> "skew salting: fact side salted by row hash, build side replicated per salt — composite-key equi join",
    "q_llm_ann_lsh" -> "multi-probe LSH ANN: 16 sign buckets from codegen'd hyperplane dots, probe set broadcast, corpus never shuffled",
    "q_ts_resample" -> "gap-fill resample: grid markers unioned into the stream, running last() over one user_id shuffle",
    "q_llm_centroid" -> "per-label embedding centroid: posexplode to (label,dim), partial+final exact integer agg",
    "q_sql_q5" -> "TPC-H Q5 via SQL text: Catalyst join-ordering + dim broadcasts on the 6-table star",
    "q_llm_simhash_lsh" -> "Hamming-LSH banding: signature bands equi-join (no all-pairs cross join), exact distance re-check",
    "q_scan_tail" -> "tail read (SearchBackward): TakeOrderedAndProject on the DESC order — per-partition heaps, no full sort",
    "q_llm_pack" -> "token-budget packing: exclusive-prefix window sum, ONE shuffle on the partition key, no driver loop",
    "q_agg_moments" -> "exact higher moments: integer power sums as partial+final HashAggregate — merge-order-free by construction",
    "q_sql_recursive" -> "recursive CTE sessionization: UnionLoop iterations bounded by max chain length, one window pass builds the edges",
    "q_source_partitioned" -> "partitioned layout: status predicate becomes PartitionFilters — non-matching files never open",
    "q_join_bucketed" -> "bucketed co-located join: merge join AND same-key agg with zero hash exchanges — the shuffle was amortized into the write",
    "q_sql_q21" -> "TPC-H Q21: EXISTS + NOT EXISTS pair decorrelated to LeftSemi + LeftAnti hash joins, no per-row subquery",
    "q_sql_q17" -> "TPC-H Q17: correlated scalar AVG decorrelated to one aggregate + join",
    "q_ts_ohlc" -> "hourly OHLC bars: min_by/max_by partial aggregation — map-side combine does the downsampling",
    "q_join_dpp" -> "dynamic partition pruning: the dim's month set is injected into the fact scan's PartitionFilters at runtime — 80% of partitions never open",
    "q_agg_countmin" -> "count-min sketch: counters built in ONE partial+final agg over (row,bucket); the 1024-row sketch relation broadcasts to the probes",
    "q_agg_bloom" -> "bloom filter: 17 bit_or'd words (merge-order-free), built once, broadcast to the membership probes",
    "q_win_groups_frame" -> "GROUPS frame emulation: dense_rank pre-pass + RANGE frame share ONE Exchange+Sort (two Window ops, one partitioning)",
    "q_ts_zscore" -> "rolling z-score: bounded ROWS frame — one user_id shuffle, O(1) state per row, the streaming-friendly shape",
    "q_llm_winnow" -> "winnowing fingerprints: per-row gram expansion (no shuffle) → one doc_id window pass → per-doc agg",
    "q_layout_zorder" -> "Z-order clustering: four mask-shift rounds per dimension, pure codegen'd integer ops, stats agg is the only shuffle",
    "q_join_spatial_grid" -> "spatial within-distance join: 3×3 neighbor-cell explode on the probe side, ONE hash equi-join on the cell key — no CartesianProduct, candidates density-bounded",
    "q_merge_upsert" -> "MERGE/upsert: one full-outer sort-merge join on the merge key, action derived per row — no second pass over either side",
    "q_llm_colloc_pmi" -> "PMI collocations: zip_with bigrams (no shuffle) → one pair agg; vocabulary-sized marginal relations broadcast",
    "q_ts_interp" -> "calendar gap-fill: sequence/explode densify + forward-fill window; the daily agg is the only data-sized shuffle",
    "q_evt_attribution" -> "last-touch attribution: unbounded-to-previous last(ignoreNulls) frame — one user_id shuffle, no self-join or as-of pass",
    "q_llm_cross_dedup" -> "incremental dedup: incoming×existing posting equi-join only (no within-side pairs) — the daily-crawl-vs-corpus shape; per-doc counts ride the kernel rows",
    "q_win_reset_cumsum" -> "session-reset running sum: sessionize + framed sum as TWO Window ops over ONE user_id Exchange+Sort — the partitioning is reused, not re-shuffled",
    "q_source_bloom" -> "bloom-filter point lookup: the probe predicate reaches the scan as PushedFilters over the bloom-indexed layout — row groups without the key never decode",
    "q_dq_outlier_cols" -> "exact 3σ audit: one moment HashAggregate broadcast back over the scan; membership is a codegen'd integer predicate, no IEEE in the decision",
    "q_llm_ann_lsh_adaptive" -> "adaptive-k multiprobe ANN: corpus-scaled plane count (broadcast 1-row n), query-directed 32-mask probe set over the 5 weakest margins — probe budget constant at any k, corpus never shuffled",
    "q_layout_zonemap" -> "zone-map audit: two fact groupBys → zone-count-sized stat relations; the min/max intersect predicate is the per-block skipping argument made measurable",
    "q_evt_basket_pairs" -> "market-basket lift: pair join rides the (order, brand) relation — candidates bounded by orders×C(brands/order,2); marginals broadcast; exact integer micro-lift ranking",
    "q_ts_lttb" -> "LTTB downsampling: zone stats broadcast both ways (wid±1), per-bucket argmax on an exact integer cross product — one window pass over the calendar spine",
    "q_llm_ppl_buckets" -> "CCNet perplexity terciles: vocabulary-sized count relations broadcast under the doc agg; the global ntile rides the document grain (distributed-quantile cut at 100 TB)",
    "q_agg_spearman" -> "Spearman rank corr: customer-grain ranking windows (dimension-sized), all five moment sums one BIGINT HashAggregate, rho one IEEE tail",
    "q_llm_ann_ivfpq" -> "IVF-PQ: corpus-linear encode (fact × broadcast codebook), adaptive coarse cells broadcast-assigned, ADC scan CELL-PRUNED to nprobe/#cells of the code table, ≤400-row exact rerank",
    "q_llm_dedup_incremental" -> "incremental dedup: batch-linear signatures, banded equi-join against the persisted store parquet, raw-shingle verify on candidates only",
    "q_graph_scc" -> "directed SCC: path-doubling closure (log-rounds, localCheckpoint each), mutual-min labels — closure-sized shuffles, no driver loop over data",
    "q_evt_adstock" -> "adstock: calendar-bounded daily spine × broadcast 31-day lookback, exact shift-halving terms, one groupBy",
    "q_scan_sample_weighted" -> "weighted sample: one codegen'd projection (md5 uniform → ln(u)/w priority), global TakeOrderedAndProject heaps",
    "q_llm_ann_ivfpq_residual" -> "residual IVF-PQ (true IVFADC): packed zip_with encode + min(struct) argmin (no 65M-row shuffle), 256 stride-sampled residual codewords broadcast, per-probed-cell ADC table, exact rerank",
    "q_llm_ann_hnsw" -> "HNSW beam ANN: packed-array coarse assign (max(struct) over broadcast dots), within-cell 8-NN graph + hub mesh, 5 single-state beam rounds (one checkpoint each), strided upper-layer entry",
    "q_ts_matrix_profile" -> "matrix profile: calendar-bounded subsequence arrays broadcast-self-paired (≤2.4k rows at any fact volume), zip_with exact dollar² folds, min(struct) per position",
    "q_graph_core_decomp" -> "k-core spectrum: 12 bounded checkpointed peels (k=1..4 × 3 rounds) over the shared edge relation — semi-join prune per round, 4 one-row driver reads",
    "q_stream_live_router" -> "stream-stream right-outer: two watermarked file streams, time-interval join, per-side watermark decided-region cutoffs, NULLS LAST on the nullable left key",
    "q_llm_ann_ivfpq_lloyd" -> "trained residual IVF-PQ: one exact Lloyd update (packed E-step encode, positive-shifted floor-mean M-step), rsub packed once and reused by both encodes, trained book broadcast to ADC",
    "q_llm_ann_hnsw_ml" -> "multi-level HNSW: stride-256 L2 exact entry (corpus/256 scan), 3 greedy ef=1 hops on the L1 graph (4-row driver state), then the 4-round beam-16 layer-0 search",
    "q_graph_triad_census" -> "triad census (Batagelj-Mrvar): wedge-connected triples only (Σdeg² on support dyads), three broadcast dyad-flag joins, one-dyad classes arithmetic — never |D|·n",
    "q_graph_bowtie" -> "bow-tie census: path-doubling closure to count fixpoint, giant SCC by max(struct), in/out regions via anti-joined reachability projections",
    "q_llm_ann_ivfpq_lloyd2" -> "2-step-Lloyd residual IVF-PQ: two exact E/M rounds over the checkpointed packed residuals, monotone-MSE trained book broadcast to the cell-pruned ADC scan, corpus-proportional rerank shortlist",
    "q_llm_ann_hnsw_bestfirst" -> "best-first HNSW (paper parity): ≤16 sequential 1-expansion rounds, each a ≤1-row/query driver read re-entering as a literal broadcast over the persisted edge list — the sequential study next to the batched beam",
    "q_graph_triad_census_man" -> "MAN triad census: 16 Holland-Leinhardt classes from the same Σdeg²-bounded wedge relation, code→class mapping is pure integer arithmetic on broadcast dyad flags",
    "q_stream_live_semi" -> "stream-stream left-semi: two watermarked file streams, time-interval semi join, per-side watermark decided-region cutoffs — existence only, no right-side columns materialize",
    "q_agg_gini" -> "Gini (post-fence): n² rank-sums on DECIMAL(38,0) accumulators, two-limb int→double emission only at the final ratio — one value-ordered window pass, one HashAggregate",
    "q_ts_welch" -> "Welch t (post-fence): vol²-scale nano-sums carried in DECIMAL(38,0), partial+final HashAggregate, IEEE only in the final statistic via limbDouble",
    "q_ts_durbin_watson" -> "Durbin-Watson (post-fence): residual² sums on DECIMAL(38,0) over the calendar-spine ordering, single window pass for the lag-1 diff",
    "q_ts_block_bootstrap" -> "block bootstrap (post-fence): CENTERED variance on DECIMAL(38,0) deviations (m = sm div nr, exact rem²/n correction — no n·Σx²−(Σx)² cancellation), three-limb emission (Det.limbDouble3), 1-row stats relations broadcast"
  )

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Round-14 verdict item 2: PLANS.md covers the FULL surface, not
    // just the curated headliners — every key's final AQE-resolved plan,
    // annotated with the scale rationale where one is curated above.
    // Sorted key order so a regeneration diffs cleanly against the last.
    val whys = headline.toMap
    val keys = SparkEntry.queries.keys.toSeq.sorted
    val sb = new StringBuilder
    sb.append("# PLANS — final physical plans of every graded query\n\n")
    sb.append("Generated by `sbt \"runMain graft.PlanDump\"` on " + sf + ".\n")
    sb.append(s"All ${keys.size} keys; ${headline.size} carry curated scale annotations.\n")
    sb.append("Each plan is executed first so AQE has resolved its final shape —\n")
    sb.append("what you see is what runs. Review checklist per SURVEY §7.4:\n")
    sb.append("pushed filters, pruned schemas, broadcast dims, partial aggs,\n")
    sb.append("no CartesianProduct, codegen stars on hot projections.\n")
    var nFailed = 0
    keys.foreach { name =>
      val why = whys.get(name).map(w => s"\n_${w}_\n").getOrElse("")
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect() // finalize AQE
        sb.append(s"\n## $name\n$why\n```\n")
        sb.append(df.queryExecution.explainString(FormattedMode).trim)
        sb.append("\n```\n")
      } catch { case e: Throwable =>
        nFailed += 1
        sb.append(s"\n## $name\n$why\nPLAN DUMP FAILED: ${e.getMessage}\n")
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${keys.size} plans, $nFailed failed)")
    spark.stop()
  }
}
