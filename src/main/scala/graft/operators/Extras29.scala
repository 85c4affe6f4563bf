package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-7 additions, part 19: partitioned parquet sink audit,
  * conversion latency, importance-weighted subsampling, multiline-JSON
  * ingestion, discrete percentiles, and a multi-measure pivot.
  */
object Extras29 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PARTITIONED SINK — write orders partitionBy(o_orderstatus), read
    // the directory tree back, and audit per-partition mass against
    // nothing but the files themselves. The status predicate on the
    // read side prunes to one directory (partition pruning on the
    // sink's own layout — the Hive-style layout contract at any
    // scale). Exact counts and cents.
    "q_sink_partitioned" -> ((s, d) => {
      val dir = FixtureCache.ensure("orders_sink_partitioned",
        Seq(s"$d/orders.parquet"), "v1: partitionBy status") { dest =>
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
            col("o_orderstatus"))
          .write.partitionBy("o_orderstatus").mode("overwrite")
          .parquet(dest)
      }
      s.read.parquet(dir)
        .groupBy(col("o_orderstatus").cast("string").as("status"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .orderBy("status")
    }),

    // CONVERSION LAG — per user: first signup, first purchase at-or-
    // after it, and the latency between them in EXACT integer seconds
    // (µs-truncated timestamps per the §2.13 events rule, integer
    // subtraction and division only). The funnel-latency measurement
    // between q_evt_funnel (did they?) and q_evt_retention (did they
    // come back?). Shape: two tiny per-user aggs, one user-grain join.
    "q_evt_conversion_lag" -> ((s, d) => {
      val e = Tables.events(s, d)
      val signup = e.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val purch = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      signup.join(purch, "user_id")
        .where(col("ts") >= col("signup_ts"))
        .groupBy(col("user_id"), col("signup_ts"))
        .agg(min(col("ts")).as("purchase_ts"))
        // epoch µs BIGINTs, not timestamp columns: the two engines dump
        // different parquet timestamp physical types (ns vs µs), so the
        // graded surface stays integer
        .select(col("user_id"),
          unix_micros(col("signup_ts")).as("signup_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          // `div`, not `/`: Spark's / on longs is IEEE true division
          expr("(unix_micros(purchase_ts) - unix_micros(signup_ts))" +
            " div 1000000").as("lag_sec"))
        .orderBy("user_id")
    }),

    // IMPORTANCE-WEIGHTED SUBSAMPLE — keep each doc with probability
    // proportional to its length-based weight, decided by the portable
    // md5 bucket (never rand(): reproducible across engines, runs, and
    // partitionings — q_llm_mix's fixed per-source rates generalized
    // to a continuous per-row weight). w = min(1, n_chars/400);
    // keep iff md5_bucket(text)∈[0,1000) < ⌊w·1000⌋ — the only float
    // step is one shared IEEE multiply truncated to an integer
    // threshold, so the keep decision is integer-exact.
    "q_llm_importance_sample" -> ((s, d) => {
      val w = least(lit(1.0), col("n_chars").cast("double") / lit(400.0))
      val thr = floor(w * lit(1000.0)).cast("long")
      val keep = pmod(md5long(col("text")), lit(1000L)) < thr
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(when(keep, 1L).otherwise(0L)).as("kept"),
          sum(when(keep, col("n_chars")).otherwise(0L)).as("kept_chars"))
        .select(col("lang"), col("docs"), col("kept"), col("kept_chars"),
          (col("kept").cast("double") / col("docs").cast("double"))
            .as("keep_rate"))
        .orderBy("lang")
    }),

    // MULTILINE-JSON INGESTION — one file holding ONE top-level JSON
    // array (the config/export shape, vs q_source_json_lines' NDJSON).
    // multiLine=true parses it; the audit proves the round-trip. The
    // scale note IS the operator: a multiline array is one record to
    // the parser — non-splittable, single-task — which is exactly why
    // pipelines convert this shape to JSONL before fan-out (and why
    // the fixture materializes it with coalesce(1), not a collect).
    "q_source_json_multiline" -> ((s, d) => {
      val dir = FixtureCache.ensure("customer_json_multiline",
        Seq(s"$d/customer.parquet"), "v1: one top-level array") { dest =>
        Tables.customer(s, d)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
            (dec(col("c_acctbal")) * 100).cast("long").as("bal_cents"))
          .agg(to_json(sort_array(collect_list(struct(col("k"),
            col("seg"), col("bal_cents"))))).as("doc"))
          .coalesce(1)
          .write.mode("overwrite").text(dest)
      }
      s.read.option("multiLine", "true")
        .schema("k LONG, seg STRING, bal_cents LONG")
        .json(dir)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("bal_cents")).as("bal_cents"))
        .orderBy("seg")
    }),

    // DISCRETE PERCENTILES — PERCENTILE_DISC semantics: the value AT
    // rank ⌈q·n⌉, an actual order statistic from the data (never
    // interpolated — q_agg_percentile's CONT twin). Ties don't matter:
    // the value at a given sorted position is unique even when
    // row_number breaks ties arbitrarily. Pure integers end to end —
    // not one float in the whole query.
    "q_agg_percentile_disc" -> ((s, d) => {
      val v = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      val byG = Window.partitionBy(col("g")).orderBy(col("cents"))
      val ranked = v
        .withColumn("rn", row_number().over(byG))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      // ONE ranking pass; the 3-row pct spine broadcasts and each rank
      // matches at most one target position per (g, pct).
      val pcts = Seq(25, 50, 75).map(p => Tuple1(p))
      val spine = broadcast(s.createDataFrame(pcts).toDF("pct"))
      ranked.join(spine,
          col("rn") === ceil(col("n") * col("pct") / lit(100.0)))
        .select(col("g"), col("pct"), col("cents"))
        .orderBy("g", "pct")
    }),

    // MULTI-MEASURE PIVOT — count AND exact cents per pivoted
    // linestatus in one pass (q_agg_pivot carries one measure; real
    // reports carry several). Spark's relational pivot with two aggs;
    // the oracle is the conditional-aggregation desugaring — exact
    // integers only.
    "q_agg_pivot_multi" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), col("l_linestatus").as("st"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        .groupBy(col("g"))
        .pivot("st", Seq("F", "O"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .select(col("g"),
          coalesce(col("F_n"), lit(0L)).as("n_f"),
          coalesce(col("F_cents"), lit(0L)).as("cents_f"),
          coalesce(col("O_n"), lit(0L)).as("n_o"),
          coalesce(col("O_cents"), lit(0L)).as("cents_o"))
        .orderBy("g")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_sink_partitioned" ->
      """SELECT CAST(o_orderstatus AS VARCHAR) AS status,
                COUNT(*) AS n,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_evt_conversion_lag" ->
      """WITH s AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
                 FROM events WHERE event_type = 'signup' GROUP BY 1),
            p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'purchase')
         SELECT s.user_id,
                epoch_us(s.signup_ts) AS signup_us,
                epoch_us(MIN(p.ts)) AS purchase_us,
                CAST((epoch_us(MIN(p.ts)) - epoch_us(s.signup_ts))
                     // 1000000 AS BIGINT) AS lag_sec
         FROM s JOIN p ON s.user_id = p.user_id AND p.ts >= s.signup_ts
         GROUP BY s.user_id, s.signup_ts
         ORDER BY s.user_id""",

    "q_llm_importance_sample" ->
      """WITH v AS (
           SELECT lang, n_chars,
                  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
                    % 1000 AS bucket,
                  CAST(floor(LEAST(1.0, CAST(n_chars AS DOUBLE) / 400.0)
                             * 1000.0) AS BIGINT) AS thr
           FROM documents)
         SELECT lang, COUNT(*) AS docs,
                CAST(SUM(CASE WHEN bucket < thr THEN 1 ELSE 0 END)
                     AS BIGINT) AS kept,
                CAST(SUM(CASE WHEN bucket < thr THEN n_chars ELSE 0 END)
                     AS BIGINT) AS kept_chars,
                CAST(SUM(CASE WHEN bucket < thr THEN 1 ELSE 0 END)
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS keep_rate
         FROM v GROUP BY lang ORDER BY lang""",

    "q_source_json_multiline" ->
      """SELECT c_mktsegment AS seg, COUNT(*) AS n,
                CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS BIGINT) AS bal_cents
         FROM customer GROUP BY 1 ORDER BY 1""",

    "q_agg_percentile_disc" ->
      """WITH v AS (SELECT l_returnflag AS g,
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents
                 FROM lineitem),
            r AS (SELECT g, cents,
                    row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
                    COUNT(*) OVER (PARTITION BY g) AS n
                  FROM v),
            q AS (SELECT 25 AS pct UNION ALL SELECT 50 UNION ALL SELECT 75)
         SELECT r.g, q.pct, MAX(r.cents) AS cents
         FROM r JOIN q ON r.rn = CAST(ceil(r.n * q.pct / 100.0) AS BIGINT)
         GROUP BY r.g, q.pct
         ORDER BY r.g, q.pct""",

    "q_agg_pivot_multi" ->
      """SELECT l_returnflag AS g,
                CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_f,
                CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT) ELSE 0 END)
                     AS BIGINT) AS cents_f,
                CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_o,
                CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT) ELSE 0 END)
                     AS BIGINT) AS cents_o
         FROM lineitem GROUP BY 1 ORDER BY 1"""
  )
}
