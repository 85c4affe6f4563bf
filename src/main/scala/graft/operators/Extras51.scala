package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-9 additions, part 14: overdispersion index, Ljung-Box white-
  * noise test, behavioral-entropy drift, per-source length CIs, and a
  * merge-on-read table layout.
  *
  * Determinism contract (SURVEY §2.13) throughout: exact integer
  * moments, nano-quantized entropy terms, shared IEEE tails.
  */
object Extras51 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // OVERDISPERSION — the variance-to-mean ratio of per-user event
    // counts (≈1 for a Poisson process; ≫1 signals bursty/heavy-tail
    // usage — decides negative-binomial vs Poisson modeling). Moment
    // sums are exact BIGINT; VMR = (n·Σx²−S²)/(n·S) one IEEE tail.
    "q_evt_dispersion" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n"), col("sx"), col("sxx"),
          r6((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            / (col("n") * col("sx")).cast("double")).as("dispersion"))
    }),

    // LJUNG-BOX — the white-noise portmanteau test on daily revenue at
    // lags 1..3: Q = n(n+2)·Σ r_k²/(n−k). The r's come from the exact
    // BIGINT lag moments (q_ts_pacf's kernel); the Q chain is the one
    // shared IEEE sequence over them, rounded once at emit.
    "q_ts_ljung_box" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val lagged = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) div 100000")
          .as("y"))
        .withColumn("y1", lag(col("y"), 1).over(ord))
        .withColumn("y2", lag(col("y"), 2).over(ord))
        .withColumn("y3", lag(col("y"), 3).over(ord))
      def corrCols(lc: String, tag: String) = Seq(
        count(when(col(lc).isNotNull, 1)).as(s"n$tag"),
        sum(when(col(lc).isNotNull, col("y"))).as(s"sx$tag"),
        sum(when(col(lc).isNotNull, col(lc))).as(s"sy$tag"),
        sum(when(col(lc).isNotNull, col("y") * col(lc))).as(s"sxy$tag"),
        sum(when(col(lc).isNotNull, col("y") * col("y"))).as(s"sxx$tag"),
        sum(when(col(lc).isNotNull, col(lc) * col(lc))).as(s"syy$tag"))
      val m = lagged.agg(count(lit(1)).as("nd"),
        (corrCols("y1", "1") ++ corrCols("y2", "2") ++
          corrCols("y3", "3")): _*)
      def r(tag: String) =
        (col(s"n$tag") * col(s"sxy$tag") - col(s"sx$tag") * col(s"sy$tag"))
          .cast("double") /
        (sqrt((col(s"n$tag") * col(s"sxx$tag")
          - col(s"sx$tag") * col(s"sx$tag")).cast("double"))
          * sqrt((col(s"n$tag") * col(s"syy$tag")
            - col(s"sy$tag") * col(s"sy$tag")).cast("double")))
      val nD = col("nd").cast("double")
      val q = nD * (nD + 2.0) * (
        r("1") * r("1") / (nD - 1.0)
          + r("2") * r("2") / (nD - 2.0)
          + r("3") * r("3") / (nD - 3.0))
      m.select(col("nd").as("n_days"),
        r6(r("1")).as("r1"), r6(r("2")).as("r2"), r6(r("3")).as("r3"),
        r6(q).as("q_lb"))
    }),

    // ENTROPY DRIFT — weekly event-type entropy over integer Monday-
    // epoch weeks (is behavior diversifying or collapsing?): the
    // (week, type) relation is weeks×alphabet-bounded, terms quantize
    // to nano-bits before the per-week sum, and the emitted drift is
    // each week's delta vs the previous (exact integer difference of
    // nano-entropies, one display division).
    "q_evt_entropy_trend" -> ((s, d) => {
      val wt = Tables.events(s, d)
        .select(expr("datediff(CAST(ts AS DATE), DATE'1970-01-05') div 7")
          .as("week"), col("event_type"))
        .groupBy(col("week"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val wtot = Window.partitionBy(col("week"))
      val perWeek = wt
        .withColumn("n", sum(col("c")).over(wtot))
        .withColumn("t_nano", round(col("c").cast("double") / col("n")
          * log2(col("c").cast("double") / col("n")) * 1e9).cast("long"))
        .groupBy(col("week"))
        .agg(max(col("n")).as("n_events"),
          sum(-col("t_nano")).as("e_nano"))
      perWeek
        .withColumn("delta_nano",
          col("e_nano") - lag(col("e_nano"), 1).over(
            Window.orderBy(col("week"))))
        .select(col("week"), col("n_events"), col("e_nano"),
          r6(col("e_nano").cast("double") / 1e9).as("entropy"),
          col("delta_nano"))
        .orderBy("week")
    }),

    // LENGTH CI — per-source mean document length with the 95% Wald
    // interval (the per-stratum reporting shape every dataset card
    // carries): exact integer moments; mean, SD and the ±1.96·σ/√n
    // bounds are one shared IEEE chain.
    "q_llm_len_ci" -> ((s, d) => {
      val m = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long")
          .as("len"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("len")).as("sx"),
          sum(col("len") * col("len")).as("sxx"))
      val mean = col("sx").cast("double") / col("n").cast("double")
      val sd = sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double")) / col("n").cast("double")
      m.select(col("source"), col("n"), col("sx"), col("sxx"),
        r6(mean).as("mean_len"), r6(sd).as("sd_len"),
        r6(mean - sd * 1.96 / sqrt(col("n").cast("double"))).as("ci_lo"),
        r6(mean + sd * 1.96 / sqrt(col("n").cast("double"))).as("ci_hi"))
        .orderBy("source")
    }),

    // MERGE-ON-READ — the Iceberg/Hudi MoR table shape: a BASE layout
    // plus a DELTA file of upserts, reconciled at READ time by a
    // latest-wins full-outer merge on the key (the write path stays
    // append-only — the compaction cost moves to the reader, exactly
    // the trade MoR formats make). Both fixtures pin their content
    // deterministically; the emit proves the merged view: updated rows
    // take delta values, inserts appear, untouched rows survive.
    "q_scan_merge_on_read" -> ((s, d) => {
      val base = FixtureCache.ensure("orders_mor_base",
        Seq(s"$d/orders.parquet"), "base v1") { dest =>
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
          .write.parquet(dest)
      }
      val delta = FixtureCache.ensure("orders_mor_delta",
        Seq(s"$d/orders.parquet"), "delta v1") { dest =>
        Tables.orders(s, d)
          .where(expr("o_orderkey % 10 = 0"))
          .select(col("o_orderkey"), col("o_custkey"),
            ((dec(col("o_totalprice")) * 100).cast("long") + 555L)
              .as("cents"))
          .unionByName(
            Tables.orders(s, d)
              .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
                col("o_custkey"),
                (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
              .where(expr("o_orderkey % 1000 = 1")))
          .write.parquet(dest)
      }
      val b = s.read.parquet(base)
      val dl = s.read.parquet(delta)
      val merged = b.as("b").join(dl.as("dd"), Seq("o_orderkey"), "full")
        .select(col("o_orderkey"),
          coalesce(col("dd.cents"), col("b.cents")).as("cents"),
          col("dd.cents").isNotNull.as("from_delta"))
      merged.agg(count(lit(1)).as("n_rows"),
        sum(when(col("from_delta"), 1L).otherwise(0L)).as("n_from_delta"),
        sum(col("cents")).as("total_cents"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_dispersion" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
                 FROM events GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(x * x) AS BIGINT) AS sxx
                  FROM u)
         SELECT n, sx, sxx,
                round(CAST(n * sxx - sx * sx AS DOUBLE)
                  / CAST(n * sx AS DOUBLE), 6) AS dispersion
         FROM m""",

    "q_ts_ljung_box" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) // 100000 AS y
                 FROM orders GROUP BY 1),
            lg AS (SELECT y,
                     lag(y, 1) OVER (ORDER BY dt) AS y1,
                     lag(y, 2) OVER (ORDER BY dt) AS y2,
                     lag(y, 3) OVER (ORDER BY dt) AS y3
                   FROM daily),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                    CAST(COUNT(y1) AS BIGINT) AS n1,
                    CAST(SUM(CASE WHEN y1 IS NOT NULL THEN y END) AS BIGINT) AS sx1,
                    CAST(SUM(y1) AS BIGINT) AS sy1,
                    CAST(SUM(y * y1) AS BIGINT) AS sxy1,
                    CAST(SUM(CASE WHEN y1 IS NOT NULL THEN y * y END) AS BIGINT) AS sxx1,
                    CAST(SUM(y1 * y1) AS BIGINT) AS syy1,
                    CAST(COUNT(y2) AS BIGINT) AS n2,
                    CAST(SUM(CASE WHEN y2 IS NOT NULL THEN y END) AS BIGINT) AS sx2,
                    CAST(SUM(y2) AS BIGINT) AS sy2,
                    CAST(SUM(y * y2) AS BIGINT) AS sxy2,
                    CAST(SUM(CASE WHEN y2 IS NOT NULL THEN y * y END) AS BIGINT) AS sxx2,
                    CAST(SUM(y2 * y2) AS BIGINT) AS syy2,
                    CAST(COUNT(y3) AS BIGINT) AS n3,
                    CAST(SUM(CASE WHEN y3 IS NOT NULL THEN y END) AS BIGINT) AS sx3,
                    CAST(SUM(y3) AS BIGINT) AS sy3,
                    CAST(SUM(y * y3) AS BIGINT) AS sxy3,
                    CAST(SUM(CASE WHEN y3 IS NOT NULL THEN y * y END) AS BIGINT) AS sxx3,
                    CAST(SUM(y3 * y3) AS BIGINT) AS syy3
                  FROM lg),
            rr AS (SELECT nd,
                     CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                       / (sqrt(CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE))
                          * sqrt(CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)))
                       AS r1,
                     CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE)
                       / (sqrt(CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE))
                          * sqrt(CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE)))
                       AS r2,
                     CAST(n3 * sxy3 - sx3 * sy3 AS DOUBLE)
                       / (sqrt(CAST(n3 * sxx3 - sx3 * sx3 AS DOUBLE))
                          * sqrt(CAST(n3 * syy3 - sy3 * sy3 AS DOUBLE)))
                       AS r3
                   FROM m)
         SELECT nd AS n_days,
                round(r1, 6) AS r1, round(r2, 6) AS r2, round(r3, 6) AS r3,
                round(CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) + 2.0)
                  * (r1 * r1 / (CAST(nd AS DOUBLE) - 1.0)
                     + r2 * r2 / (CAST(nd AS DOUBLE) - 2.0)
                     + r3 * r3 / (CAST(nd AS DOUBLE) - 3.0)), 6) AS q_lb
         FROM rr""",

    "q_evt_entropy_trend" ->
      """WITH wt AS (SELECT (CAST(ts AS DATE) - DATE '1970-01-05') // 7
                      AS week, event_type, CAST(COUNT(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
            t AS (SELECT week, c,
                    SUM(c) OVER (PARTITION BY week) AS n
                  FROM wt),
            pw AS (SELECT week, CAST(MAX(n) AS BIGINT) AS n_events,
                     CAST(SUM(-CAST(round(CAST(c AS DOUBLE) / n
                       * log2(CAST(c AS DOUBLE) / n) * 1e9) AS BIGINT))
                       AS BIGINT) AS e_nano
                   FROM t GROUP BY week),
            dl AS (SELECT week, n_events, e_nano,
                     e_nano - lag(e_nano, 1) OVER (ORDER BY week)
                       AS delta_nano
                   FROM pw)
         SELECT week, n_events, e_nano,
                round(CAST(e_nano AS DOUBLE) / 1e9, 6) AS entropy,
                delta_nano
         FROM dl ORDER BY week""",

    "q_llm_len_ci" ->
      """WITH m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                      AS sx,
                    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)
                         * len(string_split(text, ' '))) AS BIGINT) AS sxx
                 FROM documents GROUP BY 1)
         SELECT source, n, sx, sxx,
                round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS mean_len,
                round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  / CAST(n AS DOUBLE), 6) AS sd_len,
                round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  - sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    / CAST(n AS DOUBLE) * 1.96 / sqrt(CAST(n AS DOUBLE)),
                  6) AS ci_lo,
                round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  + sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    / CAST(n AS DOUBLE) * 1.96 / sqrt(CAST(n AS DOUBLE)),
                  6) AS ci_hi
         FROM m ORDER BY source""",

    "q_scan_merge_on_read" ->
      """WITH base AS (SELECT o_orderkey,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
                 FROM orders),
            delta AS (SELECT o_orderkey,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) + 555 AS cents
                      FROM orders WHERE o_orderkey % 10 = 0
                      UNION ALL
                      SELECT o_orderkey + 100000000,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)
                      FROM orders WHERE o_orderkey % 1000 = 1),
            merged AS (SELECT coalesce(d.o_orderkey, b.o_orderkey) AS k,
                         coalesce(d.cents, b.cents) AS cents,
                         d.o_orderkey IS NOT NULL AS from_delta
                       FROM base b FULL OUTER JOIN delta d
                         ON b.o_orderkey = d.o_orderkey)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(SUM(CASE WHEN from_delta THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_from_delta,
                CAST(SUM(cents) AS BIGINT) AS total_cents
         FROM merged"""
  )
}
