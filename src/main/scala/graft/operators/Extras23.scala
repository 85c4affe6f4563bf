package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-7 additions, part 13: two-sample distribution tests
  * (Kolmogorov–Smirnov, Mann–Whitney U), an edit-distance label join,
  * Bollinger-band breakout detection, per-user gaps-and-islands activity
  * runs, and a weekly cohort-retention matrix.
  */
object Extras23 {
  import Det._

  /** Per-distinct-value counts of l_extendedprice cents for return flags
    * A (group 1) and R (group 2) — the shared ECDF grid both rank tests
    * walk. One shuffle to the value grain; the cumulative walk is a
    * single ordered window over the DISTINCT-VALUE grid (much smaller
    * than the row count; the at-scale sibling is the classic two-pass
    * range-partitioned prefix sum, unnecessary until the grid itself
    * outgrows one partition's sort). */
  private def ecdfGrid(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_returnflag").isin("A", "R"))
      .select((dec(col("l_extendedprice")) * 100).cast("long").as("v"),
        col("l_returnflag").as("g"))
      .groupBy(col("v"))
      .agg(sum(when(col("g") === "A", 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === "R", 1L).otherwise(0L)).as("c2"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KOLMOGOROV–SMIRNOV TWO-SAMPLE TEST — D = sup|F1−F2| between the
    // price distributions of returned (R) vs accepted (A) line items.
    // The supremum is found on EXACT integers: at each distinct value,
    // |cum1·n2 − cum2·n1| (DECIMAL(38,0) — the product is ~4e16 at
    // SF100 and must survive 1000×); D is ONE shared IEEE division at
    // the end, so the statistic and its argmax location (tie → lowest
    // value) are engine-exact.
    "q_agg_ks_test" -> ((s, d) => {
      val cum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Round 17 (the weighted_median totals treatment): n1/n2 were a
      // second UNBOUNDED whole-partition window pass over the value
      // spine; a 1-row aggregate broadcast back in computes the same
      // exact integers (the scan+grid exchange is reused).
      val grid = ecdfGrid(s, d)
      val tots = grid.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      grid
        .withColumn("cum1", sum(col("c1")).over(cum).cast("decimal(38,0)"))
        .withColumn("cum2", sum(col("c2")).over(cum).cast("decimal(38,0)"))
        .crossJoin(broadcast(tots))
        .withColumn("num",
          abs(col("cum1") * col("n2") - col("cum2") * col("n1"))
            .cast("decimal(38,0)"))
        .orderBy(col("num").desc, col("v"))
        .limit(1)
        .select(col("n1"), col("n2"), col("v").as("at_cents"),
          (col("num").cast("double")
            / (col("n1").cast("double") * col("n2").cast("double")))
            .as("d_stat"))
    }),

    // MANN–WHITNEY U (tie-corrected normal approximation) — the rank-
    // sum test over the same A-vs-R price grid. Average tied ranks are
    // half-integers, so TWICE the group-1 rank sum is kept as an exact
    // integer: 2R1 = Σ c1·(2·Cprev + t + 1). The tie correction
    // Σ(t³−t) rides DECIMAL(38,0) (t³ ~ 8e24 at SF100). U and z are a
    // shared IEEE tail over exact integers — engine-exact.
    "q_agg_mannwhitney" -> ((s, d) => {
      val cum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = (col("c1") + col("c2")).cast("decimal(38,0)")
      val grid = ecdfGrid(s, d)
        .withColumn("cumt", sum(col("c1") + col("c2")).over(cum)
          .cast("decimal(38,0)"))
      val agg = grid.agg(
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1").cast("decimal(38,0)")
          * (lit(2) * (col("cumt") - t) + t + 1)).cast("decimal(38,0)")
          .as("two_r1"),
        sum(t * t * t - t).cast("decimal(38,0)").as("ties"))
      val n1 = col("n1").cast("double")
      val n2 = col("n2").cast("double")
      val n = (col("n1") + col("n2")).cast("double")
      val u1 = (col("two_r1").cast("double")
        - n1 * (n1 + lit(1.0))) / lit(2.0)
      val sigma2 = n1 * n2 / lit(12.0) * ((n + lit(1.0))
        - col("ties").cast("double") / (n * (n - lit(1.0))))
      agg.select(col("n1"), col("n2"), u1.as("u1"),
        ((u1 - n1 * n2 / lit(2.0)) / sqrt(sigma2)).as("z"))
    }),

    // EDIT-DISTANCE LABEL JOIN — near-duplicate product labels via
    // levenshtein ≤ 4 over the DISTINCT p_name vocabulary, each side
    // annotated with its part count (the "canonicalize noisy category
    // labels" entity-resolution staple). The distinct-reduce runs
    // FIRST (one shuffle over the fact data), so the quadratic match
    // is over the label dimension — which does not grow with fact
    // rows — not the table: the 100 TB shape. Both engines implement
    // unit-cost Wagner–Fischer.
    "q_join_fuzzy" -> ((s, d) => {
      val names = Tables.part(s, d)
        .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      // the label dimension is distinct-reduced and bounded (it does not
      // grow with fact rows), so the quadratic side broadcasts: BNLJ over
      // a broadcast dim, never a shuffled cartesian of fact data
      names.as("a").join(broadcast(names.as("b")),
          col("a.p_name") < col("b.p_name")
            && levenshtein(col("a.p_name"), col("b.p_name")) <= 4)
        .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          levenshtein(col("a.p_name"), col("b.p_name")).as("dist"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .orderBy("name_a", "name_b")
    }),

    // BOLLINGER BANDS — days whose revenue lands outside mean ± 2σ of
    // the trailing 20-day window (the breakout detector next to
    // q_ts_zscore's global z-score). The breach predicate is EXACT
    // INTEGER arithmetic end to end: |y−s1/20| > 2·σ squares to
    // 19·(20y−s1)² > 80·(20s2−s1²), all DECIMAL(38,0) from rolling
    // cents/cents² sums — no IEEE op decides membership. The OUTPUT is
    // exact-integer too (round 8): the window sum s1 ships as a BIGINT
    // instead of the former s1/20 double — a hash compare of doubles is
    // hostage to the oracle engine's cast/round build (DuckDB's
    // hugeint→double truncates >2^53, and round(double,n) semantics
    // have shifted across releases), so no emitted cell is IEEE-derived.
    // Round 9: the variance numerator 20·s2−s1² itself reaches ~3.8e18
    // at sf0.1 — beyond 2^53, so ANY pipeline that routes the cell
    // through a double (the driver's hash compare does for hugeint)
    // truncates it. No emitted cell may exceed 2^53: the diagnostic
    // ships as two 9-digit halves (m2_hi = m2 div 1e9, m2_lo = m2 mod
    // 1e9, both < 4e9), losslessly recombinable and double-safe in any
    // engine build.
    "q_ts_bollinger" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val w = Window.orderBy(col("dt")).rowsBetween(-19, Window.currentRow)
      val dev = (lit(20L) * col("y") - col("s1")).cast("decimal(19,0)")
      val m2 = (lit(20L) * col("s2")
        - col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("y")).over(w))
        .withColumn("s2", sum(col("y").cast("decimal(19,0)")
          * col("y").cast("decimal(19,0)")).over(w).cast("decimal(38,0)"))
        .where(col("n") === 20
          && lit(19L) * dev * dev > lit(80L) * m2)
        .withColumn("m2", m2)
        .select(col("dt"), col("y").as("y_cents"),
          col("s1").as("s1_cents"),
          expr("CAST(m2 div 1000000000 AS BIGINT)").as("m2_hi"),
          expr("CAST(m2 % 1000000000 AS BIGINT)").as("m2_lo"),
          when(dev > 0, "hi").otherwise("lo").as("side"))
        .orderBy("dt")
    }),

    // GAPS-AND-ISLANDS — per-user runs of consecutive active days in
    // the event stream (the classic islands detector: day_index minus
    // per-user row_number is constant within a run). Everything is
    // PARTITIONED BY user — per-user windows and aggregates, no global
    // sort — so the operator scales with users × active days. Per user:
    // island count, total active days, longest run and its start (tie →
    // earliest).
    "q_ts_islands" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("dt"))
        .distinct()
        .withColumn("idx", datediff(col("dt"), lit("2020-01-06").cast("date")))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("dt"))
      val islands = ud
        .withColumn("grp", col("idx") - row_number().over(byUser))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("dt")).as("start"))
      val best = Window.partitionBy(col("user_id"))
        .orderBy(col("len").desc, col("start"))
      islands
        .withColumn("rk", row_number().over(best))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("len")).as("active_days"),
          max(col("len")).as("max_len"),
          min(when(col("rk") === 1, col("start"))).as("best_start"))
        .orderBy("user_id")
    }),

    // WEEKLY COHORT RETENTION — users cohorted by first-active week;
    // for offsets 0..3, the share still active. Weeks are EXACT integer
    // indexes from a fixed pre-data Monday epoch (no engine-specific
    // week-truncation semantics); the matrix is two user-grain
    // aggregates plus one broadcast-size self-join on the cohort axis
    // (weeks, not users — dimension-bounded at any scale); retention is
    // one shared IEEE division.
    "q_evt_cohort" -> ((s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")),
            lit("2020-01-06").cast("date")) / 7).as("week"))
        .distinct()
      val first = uw.groupBy(col("user_id")).agg(min(col("week")).as("w0"))
      val mat = uw.join(first, "user_id")
        .withColumn("off", col("week") - col("w0"))
        .where(col("off") <= 3)
        .groupBy(col("w0").as("cohort_week"), col("off"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val size = mat.where(col("off") === 0)
        .select(col("cohort_week"), col("n_active").as("cohort_size"))
      mat.join(broadcast(size), "cohort_week")
        .select(col("cohort_week"), col("off"), col("n_active"),
          col("cohort_size"),
          (col("n_active").cast("double")
            / col("cohort_size").cast("double")).as("retention"))
        .orderBy("cohort_week", "off")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_ks_test" ->
      """WITH grid AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS v,
                    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                         AS BIGINT) AS c1,
                    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                         AS BIGINT) AS c2
                 FROM lineitem WHERE l_returnflag IN ('A', 'R')
                 GROUP BY 1),
            cum AS (SELECT v,
                      CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                           AS DECIMAL(38,0)) AS cum1,
                      CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                           AS DECIMAL(38,0)) AS cum2,
                      CAST(SUM(c1) OVER () AS BIGINT) AS n1,
                      CAST(SUM(c2) OVER () AS BIGINT) AS n2
                    FROM grid),
            m AS (SELECT v, n1, n2,
                    CAST(abs(cum1 * n2 - cum2 * n1) AS DECIMAL(38,0)) AS num
                  FROM cum)
         SELECT n1, n2, v AS at_cents,
                CAST(num AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat
         FROM m ORDER BY num DESC, v LIMIT 1""",

    "q_agg_mannwhitney" ->
      """WITH grid AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS v,
                    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                         AS BIGINT) AS c1,
                    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                         AS BIGINT) AS c2
                 FROM lineitem WHERE l_returnflag IN ('A', 'R')
                 GROUP BY 1),
            cum AS (SELECT v, c1, c2,
                      CAST(c1 + c2 AS DECIMAL(38,0)) AS t,
                      CAST(SUM(c1 + c2) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0)) AS cumt
                    FROM grid),
            agg AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                      CAST(SUM(c2) AS BIGINT) AS n2,
                      CAST(SUM(CAST(c1 AS DECIMAL(38,0))
                           * (2 * (cumt - t) + t + 1)) AS DECIMAL(38,0))
                        AS two_r1,
                      CAST(SUM(t * t * t - t) AS DECIMAL(38,0)) AS ties
                    FROM cum),
            f AS (SELECT n1, n2,
                    CAST(n1 AS DOUBLE) AS dn1, CAST(n2 AS DOUBLE) AS dn2,
                    CAST(n1 + n2 AS DOUBLE) AS dn,
                    CAST(two_r1 AS DOUBLE) AS dtwo_r1,
                    CAST(ties AS DOUBLE) AS dties
                  FROM agg)
         SELECT n1, n2,
                (dtwo_r1 - dn1 * (dn1 + 1.0)) / 2.0 AS u1,
                ((dtwo_r1 - dn1 * (dn1 + 1.0)) / 2.0 - dn1 * dn2 / 2.0)
                  / sqrt(dn1 * dn2 / 12.0
                      * ((dn + 1.0) - dties / (dn * (dn - 1.0)))) AS z
         FROM f""",

    "q_join_fuzzy" ->
      """WITH names AS (SELECT p_name, COUNT(*) AS n FROM part GROUP BY 1)
         SELECT a.p_name AS name_a, b.p_name AS name_b,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
                a.n AS n_a, b.n AS n_b
         FROM names a JOIN names b
           ON a.p_name < b.p_name
          AND levenshtein(a.p_name, b.p_name) <= 4
         ORDER BY name_a, name_b""",

    "q_ts_bollinger" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            w AS (SELECT dt, y,
                    COUNT(*) OVER (ORDER BY dt
                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n,
                    SUM(y) OVER (ORDER BY dt
                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s1,
                    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                      OVER (ORDER BY dt
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                      AS DECIMAL(38,0)) AS s2
                  FROM daily),
            f AS (SELECT dt, y, s1,
                    CAST(20 * y - s1 AS DECIMAL(19,0)) AS dev,
                    CAST(20 * s2 - CAST(s1 AS DECIMAL(19,0))
                         * CAST(s1 AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS m2
                  FROM w WHERE n = 20)
         SELECT dt, y AS y_cents,
                CAST(s1 AS BIGINT) AS s1_cents,
                CAST(CAST(m2 AS HUGEINT) // 1000000000 AS BIGINT) AS m2_hi,
                CAST(CAST(m2 AS HUGEINT) % 1000000000 AS BIGINT) AS m2_lo,
                CASE WHEN dev > 0 THEN 'hi' ELSE 'lo' END AS side
         FROM f
         WHERE 19 * dev * dev > 80 * m2
         ORDER BY dt""",

    "q_ts_islands" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
                     FROM events),
            g AS (SELECT user_id, dt,
                    datediff('day', DATE '2020-01-06', dt)
                      - row_number() OVER (PARTITION BY user_id
                                           ORDER BY dt) AS grp
                  FROM ud),
            isl AS (SELECT user_id, COUNT(*) AS len,
                      MIN(dt) AS start
                    FROM g GROUP BY user_id, grp),
            rk AS (SELECT user_id, len, start,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY len DESC, start) AS rk
                   FROM isl)
         SELECT user_id, COUNT(*) AS n_islands,
                CAST(SUM(len) AS BIGINT) AS active_days,
                CAST(MAX(len) AS BIGINT) AS max_len,
                MIN(CASE WHEN rk = 1 THEN start END) AS best_start
         FROM rk GROUP BY user_id ORDER BY user_id""",

    "q_evt_cohort" ->
      """WITH uw AS (SELECT DISTINCT user_id,
                    datediff('day', DATE '2020-01-06', CAST(ts AS DATE)) // 7
                      AS week
                 FROM events),
            first AS (SELECT user_id, MIN(week) AS w0 FROM uw GROUP BY 1),
            mat AS (SELECT w0 AS cohort_week, week - w0 AS off,
                      CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_active
                    FROM uw JOIN first ON uw.user_id = first.user_id
                    WHERE week - w0 <= 3
                    GROUP BY 1, 2),
            sz AS (SELECT cohort_week, n_active AS cohort_size
                   FROM mat WHERE off = 0)
         SELECT m.cohort_week, m.off, m.n_active, s.cohort_size,
                CAST(m.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
                  AS retention
         FROM mat m JOIN sz s ON m.cohort_week = s.cohort_week
         ORDER BY m.cohort_week, m.off"""
  )
}
