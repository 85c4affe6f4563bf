package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-9 additions, part 6: lakehouse layout ops (partition manifest
  * stats, small-file compaction audit), exponentially-decayed engagement
  * scoring, CCNet-style perplexity bucketing, trading-day calendar
  * adjustment, and behavioral diversity.
  *
  * Determinism contract (SURVEY §2.13) as everywhere: exact integer
  * folds, per-term quantization before order-dependent sums, single
  * shared IEEE tails. Layout fixtures pin their file counts by
  * construction (repartition(n) ⇒ exactly n part files) so the physical
  * invariants are oracle-assertable literals, not flaky observations.
  */
object Extras43 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PARTITION MANIFEST — the Iceberg/Delta-style stats manifest over a
    // hive-partitioned layout: per partition, file count and column
    // min/max/rowcount (exactly what a scan planner prunes with; the
    // Spark mirror of a native store's per-segment stats block). The
    // fixture repartitions BY the partition column before partitionBy,
    // so each status lands in exactly ONE part file — the file count is
    // a layout invariant the oracle pins, not an accident of task
    // scheduling. Manifest build = one pass with input_file_name().
    "q_layout_manifest" -> ((s, d) => {
      val tmp = FixtureCache.ensure("orders_manifest",
        Seq(s"$d/orders.parquet"), "repartition(status)+partitionBy v1") {
        dest =>
          Tables.orders(s, d).repartition(col("o_orderstatus"))
            .write.partitionBy("o_orderstatus").parquet(dest)
      }
      s.read.parquet(tmp)
        .select(col("o_orderstatus"), input_file_name().as("f"),
          col("o_orderkey"), to_date(col("o_orderdate")).as("dt"))
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("f")).as("n_files"),
          count(lit(1)).as("n_rows"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          min(col("dt")).as("min_dt"), max(col("dt")).as("max_dt"))
        .orderBy("o_orderstatus")
    }),

    // COMPACTION AUDIT — the small-file compaction maintenance job:
    // a 64-file layout is rewritten to 4 files; the audit proves the
    // file counts (pinned by repartition/coalesce construction) and
    // that rows and revenue survive the rewrite bit-exactly. This is
    // the lakehouse sibling of the reference-store log compaction the
    // WritePath suite covers.
    "q_layout_compaction" -> ((s, d) => {
      val many = FixtureCache.ensure("orders_smallfiles",
        Seq(s"$d/orders.parquet"), "repartition(64) v1") { dest =>
        Tables.orders(s, d).repartition(64).write.parquet(dest)
      }
      val compacted = FixtureCache.ensure("orders_compacted",
        Seq(many), "coalesce(4) v1") { dest =>
        s.read.parquet(many).coalesce(4).write.parquet(dest)
      }
      def audit(path: String, tag: String): DataFrame =
        s.read.parquet(path)
          .select(input_file_name().as("f"), col("o_totalprice"))
          .agg(countDistinct(col("f")).as(s"files_$tag"),
            count(lit(1)).as(s"rows_$tag"),
            sum((dec(col("o_totalprice")) * 100).cast("long"))
              .as(s"cents_$tag"))
      audit(many, "before").crossJoin(broadcast(audit(compacted, "after")))
    }),

    // DECAYED ENGAGEMENT SCORE — Σ 2^(−age_weeks) per user, the
    // classic recency-weighted activity metric. With a dyadic base and
    // integer week ages capped at 32, every term is the EXACT integer
    // 2^(32−age) in 2⁻³² units — the whole score is a BIGINT fold, no
    // IEEE value anywhere until the display division. One (user)
    // shuffle; the max-day anchor is a broadcast 1-row aggregate.
    "q_evt_decay_score" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val mx = ev.agg(max(col("day")).as("dmax"))
      ev.crossJoin(broadcast(mx))
        .withColumn("u32", expr(
          """shiftleft(CAST(1 AS BIGINT),
               CAST(32 - least(datediff(dmax, day) div 7, 32) AS INT))"""))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("u32")).as("score_u32"))
        .select(col("user_id"), col("n_events"), col("score_u32"),
          (col("score_u32").cast("double") / 4294967296.0).as("score"))
        .orderBy(col("score_u32").desc, col("user_id"))
        .limit(100)
    }),

    // PERPLEXITY BUCKETS — the CCNet head/middle/tail split: rank every
    // document by bigram cross-entropy (the q_llm_doc_ppl statistic —
    // micro-bit integers over broadcast vocabulary-sized counts) and
    // cut into terciles, then report per-(source, bucket) mass. The
    // bpb sort key is the same IEEE division of the same exact
    // integers in both engines, with doc_id as total tie-break, so
    // tercile membership is engine-exact. The global ntile rides the
    // document grain; at 100 TB the cut becomes a distributed quantile
    // (approx_percentile) — the bucketing semantics stay identical.
    "q_llm_ppl_buckets" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val big = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(zip_with(
            slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("source"),
          col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c2 = big.groupBy(col("w1").as("x1"), col("w2").as("x2"))
        .agg(count(lit(1)).as("c2"))
      val c1 = big.groupBy(col("w1").as("y1")).agg(count(lit(1)).as("c1"))
      val perDoc = big
        .join(broadcast(c2),
          col("w1") === col("x1") && col("w2") === col("x2"))
        .join(broadcast(c1), col("w1") === col("y1"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(round(log2(col("c1").cast("double")
              / col("c2").cast("double")) * lit(1000000.0), 0)
            .cast("long")).as("micro_bits"))
        .withColumn("bpb", col("micro_bits").cast("double") / 1e6
          / col("n_bigrams").cast("double"))
      perDoc
        .withColumn("bucket",
          ntile(3).over(Window.orderBy(col("bpb"), col("doc_id"))))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("micro_bits")).as("sum_micro_bits"),
          sum(col("n_bigrams")).as("sum_bigrams"))
        .select(col("source"), col("bucket"), col("n_docs"),
          col("sum_micro_bits"), col("sum_bigrams"),
          (col("sum_micro_bits").cast("double") / 1e6
            / col("sum_bigrams").cast("double")).as("avg_bits"))
        .orderBy("source", "bucket")
    }),

    // CALENDAR ADJUSTMENT — trading-day (weekday-mix) adjustment of
    // monthly revenue: each day is deflated by its weekday factor
    // f = (S_dow/N_dow)/(S/N), i.e. adj = y·N_dow·S/(S_dow·N). The
    // weekday index is the PORTABLE epoch-day mod 7 (the engines'
    // dayofweek() origins disagree); the per-day adjusted value is one
    // shared IEEE chain over exact integers, rounded to whole cents
    // BEFORE the monthly sum (quantize-before-sum). Weekday factor
    // relation is 7 rows — broadcast.
    "q_ts_calendar_adjust" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("dow", expr("datediff(dt, DATE'1970-01-01') % 7"))
      val byDow = daily.groupBy(col("dow").as("dw"))
        .agg(count(lit(1)).as("n_dow"), sum(col("y")).as("s_dow"))
      val tot = daily.agg(count(lit(1)).as("n_all"), sum(col("y")).as("s_all"))
      daily.join(broadcast(byDow), col("dow") === col("dw"))
        .crossJoin(broadcast(tot))
        .withColumn("adj", round(col("y").cast("double")
          * col("n_dow").cast("double") * col("s_all").cast("double")
          / (col("s_dow").cast("double") * col("n_all").cast("double")))
          .cast("long"))
        .groupBy(trunc(col("dt"), "month").as("month"))
        .agg(count(lit(1)).as("n_days"), sum(col("y")).as("raw_cents"),
          sum(col("adj")).as("adj_cents"))
        .select(col("month"), col("n_days"), col("raw_cents"),
          col("adj_cents"),
          (col("adj_cents").cast("double") / col("raw_cents").cast("double"))
            .as("adj_ratio"))
        .orderBy("month")
    }),

    // BEHAVIORAL DIVERSITY — per-user event-type entropy (how varied a
    // user's behavior is), rolled up by breadth (n_types). Per-user
    // terms quantize to nano-bits before the per-user sum; per-user
    // entropies are then integers, so the cohort mean is exact-over-
    // exact with one IEEE tail. The (user, type) relation is bounded
    // by users × type-alphabet.
    "q_evt_user_diversity" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("user_id"))
      ut.withColumn("n", sum(col("c")).over(w))
        .withColumn("t_nano", round(col("c").cast("double") / col("n")
          * log2(col("c").cast("double") / col("n")) * 1e9).cast("long"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_types"), sum(col("t_nano")).as("e_nano"))
        .groupBy(col("n_types"))
        .agg(count(lit(1)).as("n_users"),
          sum(-col("e_nano")).as("sum_nano"))
        .select(col("n_types"), col("n_users"), col("sum_nano"),
          r6(col("sum_nano").cast("double") / 1e9
            / col("n_users").cast("double")).as("mean_entropy"))
        .orderBy("n_types")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_layout_manifest" ->
      """SELECT o_orderstatus, CAST(1 AS BIGINT) AS n_files,
                CAST(COUNT(*) AS BIGINT) AS n_rows,
                MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
                CAST(MIN(o_orderdate) AS DATE) AS min_dt,
                CAST(MAX(o_orderdate) AS DATE) AS max_dt
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_layout_compaction" ->
      """SELECT CAST(64 AS BIGINT) AS files_before,
                CAST(COUNT(*) AS BIGINT) AS rows_before,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS cents_before,
                CAST(4 AS BIGINT) AS files_after,
                CAST(COUNT(*) AS BIGINT) AS rows_after,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS cents_after
         FROM orders""",

    "q_evt_decay_score" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
            mx AS (SELECT MAX(day) AS dmax FROM ev),
            sc AS (SELECT user_id,
                     CAST(COUNT(*) AS BIGINT) AS n_events,
                     CAST(SUM(CAST(1 AS BIGINT)
                       << CAST(32 - least((dmax - day) // 7, 32) AS INT))
                       AS BIGINT) AS score_u32
                   FROM ev, mx GROUP BY user_id)
         SELECT user_id, n_events, score_u32,
                CAST(score_u32 AS DOUBLE) / 4294967296.0 AS score
         FROM sc ORDER BY score_u32 DESC, user_id LIMIT 100""",

    "q_llm_ppl_buckets" ->
      """WITH ws AS (SELECT doc_id, source,
                            string_split(text, ' ') AS w FROM documents),
            big AS (SELECT doc_id, source, w[i] AS w1, w[i + 1] AS w2
                    FROM (SELECT doc_id, source, w,
                            unnest(generate_series(1, len(w) - 1)) AS i
                          FROM ws) t),
            c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
                   FROM big GROUP BY 1, 2),
            c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
                   FROM big GROUP BY 1),
            pd AS (SELECT doc_id, source,
                     CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(SUM(CAST(round(log2(CAST(c1.c1 AS DOUBLE)
                            / CAST(c2.c2 AS DOUBLE)) * 1000000, 0)
                          AS BIGINT)) AS BIGINT) AS micro_bits
                   FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
                   GROUP BY doc_id, source),
            b AS (SELECT source,
                    ntile(3) OVER (ORDER BY
                      CAST(micro_bits AS DOUBLE) / 1e6
                        / CAST(n_bigrams AS DOUBLE), doc_id) AS bucket,
                    n_bigrams, micro_bits
                  FROM pd)
         SELECT source, CAST(bucket AS INT) AS bucket,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(micro_bits) AS BIGINT) AS sum_micro_bits,
                CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
                CAST(SUM(micro_bits) AS DOUBLE) / 1e6
                  / CAST(SUM(n_bigrams) AS DOUBLE) AS avg_bits
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_ts_calendar_adjust" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dd AS (SELECT dt, y,
                     (dt - DATE '1970-01-01') % 7 AS dow FROM daily),
            bydow AS (SELECT dow AS dw, CAST(COUNT(*) AS BIGINT) AS n_dow,
                             CAST(SUM(y) AS BIGINT) AS s_dow
                      FROM dd GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
                           CAST(SUM(y) AS BIGINT) AS s_all FROM dd),
            adj AS (SELECT dt, y,
                      CAST(round(CAST(y AS DOUBLE)
                        * CAST(n_dow AS DOUBLE) * CAST(s_all AS DOUBLE)
                        / (CAST(s_dow AS DOUBLE) * CAST(n_all AS DOUBLE)))
                        AS BIGINT) AS a
                    FROM dd JOIN bydow ON dow = dw, tot)
         SELECT CAST(date_trunc('month', dt) AS DATE) AS month,
                CAST(COUNT(*) AS BIGINT) AS n_days,
                CAST(SUM(y) AS BIGINT) AS raw_cents,
                CAST(SUM(a) AS BIGINT) AS adj_cents,
                CAST(SUM(a) AS DOUBLE) / CAST(SUM(y) AS DOUBLE)
                  AS adj_ratio
         FROM adj GROUP BY 1 ORDER BY 1""",

    "q_evt_user_diversity" ->
      """WITH ut AS (SELECT user_id, event_type,
                    CAST(COUNT(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
            t AS (SELECT user_id, c,
                    SUM(c) OVER (PARTITION BY user_id) AS n
                  FROM ut),
            pu AS (SELECT user_id,
                     CAST(COUNT(*) AS BIGINT) AS n_types,
                     CAST(SUM(CAST(round(CAST(c AS DOUBLE) / n
                       * log2(CAST(c AS DOUBLE) / n) * 1e9) AS BIGINT))
                       AS BIGINT) AS e_nano
                   FROM t GROUP BY user_id)
         SELECT n_types, CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(-e_nano) AS BIGINT) AS sum_nano,
                round(CAST(SUM(-e_nano) AS DOUBLE) / 1e9
                  / CAST(COUNT(*) AS DOUBLE), 6) AS mean_entropy
         FROM pu GROUP BY 1 ORDER BY 1"""
  )
}
