package graft

/** Plan-shape audit: asserts each key operator compiles to the physical
  * strategy we'd want on a 1000-executor cluster — not just any plan that
  * happens to return the right rows (SURVEY §7.4 checklist). */
class PlanAuditSpec extends QuerySuiteBase {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("flagship q1: shipdate filter is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
  }

  test("q1: partial (map-side) aggregation before the shuffle") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair\n" + p)
  }

  test("broadcast joins: dimension sides broadcast, not shuffled") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q_join_multiway").contains("BroadcastHashJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("offset scan: event_id bound is pushed for row-group pruning") {
    val p = plan("q_scan_offset")
    assert(p.replaceAll("\\s", "").contains("GreaterThanOrEqual(event_id,500)"), p)
  }

  test("whole-stage codegen covers the vector-dot projection") {
    val df = q("q_llm_sim_topk")
    df.collect() // finalize the AQE plan so codegen markers are visible
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("long_array_dot"), "custom kernel missing:\n" + p)
    // The scoring projection (the one holding long_array_dot) must carry
    // the whole-stage-codegen star. If the quantization HOF leaks into it,
    // the star disappears — that regression cost 194 s once already.
    val scoringLine = p.linesIterator.find(_.contains("long_array_dot")).get
    assert(scoringLine.contains("*("),
      s"scoring projection not codegen'd:\n$p")
  }

  test("no query collects to the driver (no CollectLimit over full input)") {
    // Spot the anti-patterns: a LocalTableScan fed by a collect, or a
    // CartesianProduct where a broadcast nested loop was intended.
    val suspects = Seq("q_join_theta_range", "q_llm_dedup_embed", "q_llm_knn_join")
    suspects.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name fell back to CartesianProduct:\n$p")
    }
  }

  test("aggregations keep exchanges to one shuffle") {
    val p = plan("q_agg_group")
    assert("Exchange".r.findAllIn(p).size <= 2,
      "grouped agg should shuffle once (plus result ordering)\n" + p)
  }

  test("bucketized range join is an equi join, not a nested loop") {
    val p = plan("q_join_range_bucketed")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "bucketing must turn the range predicate into an equi join:\n" + p)
  }

  test("salted join shuffles on the composite (key, salt)") {
    val p = plan("q_join_salted")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "expected an equi join:\n" + p)
  }

  test("LSH ANN broadcasts the probe buckets and keeps the codegen kernel") {
    val df = q("q_llm_ann_lsh")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "probe side must broadcast, corpus side must not shuffle:\n" + p)
    assert(p.contains("long_array_dot"), "scoring must use the codegen kernel")
  }

  test("column pruning: the q1 scan reads only the columns it needs") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey"),
      "scan reads columns the query never touches:\n" + p)
  }

  test("centroid aggregates partially before the (label, dim) shuffle") {
    val p = plan("q_llm_centroid")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair:\n" + p)
  }

  test("tail read plans as TakeOrderedAndProject (per-partition heaps)") {
    assert(plan("q_scan_tail").contains("TakeOrderedAndProject"))
  }

  test("token packing: window + aggregation share one partitioning") {
    // The groupBy(lang, shard) must reuse the window's lang partitioning
    // — exchanges: one for the window, one for the presentation sort.
    val p = plan("q_llm_pack")
    assert("Exchange".r.findAllIn(p).size <= 2,
      "packing should not re-shuffle between window and aggregation:\n" + p)
  }

  test("exact moments: power sums aggregate partially before the shuffle") {
    val p = plan("q_agg_moments")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair:\n" + p)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // The Spark analog of the reference store's pbloom blob-filter skip,
    // at JOIN level: with a selective build side, Catalyst injects a
    // bloom-filter runtime filter into the probe-side scan. Thresholds
    // are lowered because the fixture is tiny; at real scale the defaults
    // (10MB creation side) trigger on the same shape.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // The fixture dims fit under the broadcast threshold, so Catalyst
      // would see no shuffle join to protect — at 100 TB this conf is at
      // its default and the same join IS a shuffle join.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.orders(spark, sf)
        .where(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .hint("shuffle_merge")
      val joined = fact.join(dim,
        org.apache.spark.sql.functions.col("l_orderkey")
          === org.apache.spark.sql.functions.col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom"),
        "expected an injected bloom-filter runtime filter:\n" + p)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("only the two documented validation baselines are unbounded theta self-joins") {
    // Sweep EVERY declared batch key's optimized plan for the one shape
    // that cannot survive a 100× scale-up: an inner/cross join with no
    // equi-predicate and no broadcast-bounded side — O(n·m) candidate
    // pairs with both sides data-proportional. Exactly two keys ship that
    // shape ON PURPOSE (the exact all-pairs validation baselines whose
    // scale paths are q_llm_dedup_embed_lsh / q_llm_simhash_lsh); this
    // test pins the set so a third can never creep in unnoticed, and
    // proves the detector actually detects (the baselines must flag).
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val baselines = Set("q_llm_dedup_embed", "q_llm_simhash_pairs")
    def conj(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conj(a) ++ conj(b)
      case other => Seq(other)
    }
    val flagged = SparkEntry.queries.keys.toSeq.sorted
      // streaming keys run micro-batch machinery at build time and cannot
      // host a static theta self-join; skip to keep the sweep fast
      .filterNot(_.startsWith("q_stream"))
      .filter { name =>
        q(name).queryExecution.optimizedPlan.collectFirst {
          case j @ Join(l, r, t, cond, hint)
              if (t == Inner || t == Cross)
                && !cond.toSeq.flatMap(conj).exists {
                  case EqualTo(a, b) =>
                    (a.references.subsetOf(l.outputSet)
                      && b.references.subsetOf(r.outputSet)) ||
                    (a.references.subsetOf(r.outputSet)
                      && b.references.subsetOf(l.outputSet))
                  case _ => false
                }
                && !Seq(hint.leftHint, hint.rightHint)
                  .flatten.flatMap(_.strategy).exists(_.toString == "broadcast")
            => j
        }.isDefined
      }.toSet
    assert(flagged == baselines,
      s"unbounded theta-join set drifted: found $flagged, " +
        s"documented baselines are $baselines")
  }

  test("parquet aggregate pushdown answers MIN/MAX/COUNT from footer stats") {
    // The scan-level analog of the reference store's per-block min/max
    // metadata: with aggregatePushdown on, an ungrouped MIN/MAX/COUNT
    // never materializes data pages — the scan node carries
    // PushedAggregation and row groups answer from statistics.
    // Aggregate pushdown exists only in the DSv2 scan; parquet defaults
    // to the v1 path via useV1SourceList, so both confs are scoped here.
    val keys = Seq("spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      import org.apache.spark.sql.functions._
      val agg = Tables.orders(spark, sf)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1)))
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [MIN(o_orderkey), " +
        "MAX(o_orderkey), COUNT(*)]"),
        "aggregate not pushed to the parquet footer:\n" + p)
      val row = agg.head()
      assert(row.getLong(2) == Tables.orders(spark, sf).count(),
        "footer-stats COUNT diverged from the row count")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
