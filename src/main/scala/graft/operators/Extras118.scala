package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 44: nonparametric round-out — Mood's
  * median test across the five order priorities, Page's L test for
  * ordered alternatives (the trend-aware Friedman sibling on the same
  * complete-block machinery), runs above/below the MEAN (the
  * cross-multiplied-exact sibling of q_ts_runs_test's median form),
  * and the per-source Zipf slope (the log-log OLS fit the global
  * q_llm_zipf curve eyeballs).
  *
  * Scale shape: mood/runs fold the fact table once and walk bounded
  * spines; page reuses the month×priority block relation (calendar-
  * bounded); zipf_per_source ranks the VOCAB relation per source
  * (vocab-bounded, the q_llm_zipf justification) — top-50 rows per
  * source feed a 5-row OLS fold.
  *
  * Determinism contract (SURVEY §2.13): mood counts above the exact
  * lower median (row_number (n+1) div 2), equal values dropped (the
  * runs_test tie rule); χ² per-group terms from exact integers are
  * nano-quantized before the sum. runs_mean compares y·n vs s
  * cross-multiplied in BIGINT — no IEEE until the z tail. Page folds
  * doubled midranks (2R = 2·rank + t − 1) in exact integers; L = L2/2.
  * zipf slope quantizes each ln-product term to nano before integer
  * summation so both engines share the association order.
  */
object Extras118 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MOOD'S MEDIAN TEST — do the five priorities share a median
    // order total? 2×5 table of above/not-above the pooled exact
    // lower median (equal values dropped), χ² from exact counts.
    "q_agg_mood_median" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select(substring(col("o_orderpriority"), 1, 1).as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("y"),
          col("o_orderkey"))
      val med = base
        .withColumn("r", row_number().over(
          Window.orderBy(col("y"), col("o_orderkey"))))
        .crossJoin(broadcast(base.agg(count(lit(1)).as("nn"))))
        .where(col("r") === expr("(nn + 1) div 2"))
        .select(col("y").as("med"))
      val per = base.crossJoin(broadcast(med))
        .where(col("y") =!= col("med"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("nj"),
          sum(when(col("y") > col("med"), 1L).otherwise(0L)).as("aj"))
      val tot = per.agg(sum(col("nj")).as("n"), sum(col("aj")).as("a"))
      val sp = per.crossJoin(broadcast(tot))
      val ea = col("nj").cast("double") * col("a").cast("double") /
        col("n").cast("double")
      val eb = col("nj").cast("double") *
        (col("n") - col("a")).cast("double") / col("n").cast("double")
      val term = (col("aj").cast("double") - ea) *
        (col("aj").cast("double") - ea) / ea +
        ((col("nj") - col("aj")).cast("double") - eb) *
        ((col("nj") - col("aj")).cast("double") - eb) / eb
      sp.withColumn("term_nano", round(term * lit(1e9)).cast("long"))
        .agg(count(lit(1)).as("k_groups"), max(col("n")).as("n_used"),
          max(col("a")).as("n_above"),
          sum(col("term_nano")).as("sum_nano"))
        .select(col("k_groups"), col("n_used"), col("n_above"),
          r6(col("sum_nano").cast("double") / lit(1e9)).as("chi2_mood"))
    }),

    // PAGE'S L — ordered-alternatives trend across priorities 1..5
    // within complete month blocks: L = Σ c_j·R_j on the Friedman
    // doubled-midrank machinery; exact E[L] = b·k(k+1)²/4 and
    // σ² = b·k²(k+1)(k²−1)/144 with k = 5.
    "q_agg_page_trend" -> ((s, d) => {
      val bm = Tables.orders(s, d)
        .groupBy(trunc(to_date(col("o_orderdate")), "month").as("ym"),
          substring(col("o_orderpriority"), 1, 1).as("prio"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("v"))
      val complete = bm.groupBy(col("ym")).agg(count(lit(1)).as("kk"))
        .where(col("kk") === 5).select(col("ym"))
      val ranked = bm.join(complete, "ym")
        .withColumn("rnk", rank().over(
          Window.partitionBy(col("ym")).orderBy(col("v"))))
        .withColumn("t", count(lit(1)).over(
          Window.partitionBy(col("ym"), col("v"))))
        .withColumn("dr", lit(2) * col("rnk") + col("t") - 1)
      val perTreat = ranked.groupBy(col("prio"))
        .agg(sum(col("dr")).as("r2"), count(lit(1)).as("nb"))
      val agg = perTreat.agg(max(col("nb")).as("n_blocks"),
        sum(col("prio").cast("long") * col("r2")).as("l2"))
      val bD = col("n_blocks").cast("double")
      val lD = col("l2").cast("double") / lit(2.0)
      val mu = bD * lit(5.0) * lit(36.0) / lit(4.0)
      val sig2 = bD * lit(25.0) * lit(6.0) * lit(24.0) / lit(144.0)
      agg.select(lit(5L).as("k"), col("n_blocks"),
          col("l2").as("l2_stat"), lD.as("l_stat"),
          r6((lD - mu) / sqrt(sig2)).as("z"))
    }),

    // RUNS ABOVE/BELOW THE MEAN — the Wald-Wolfowitz randomness
    // screen against the MEAN daily revenue: y·n vs s compared
    // cross-multiplied in exact BIGINT (the mean s/n never needs
    // IEEE), equal values dropped, same z tail as q_ts_runs_test.
    "q_ts_runs_mean" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val tot = daily.agg(count(lit(1)).as("nn"), sum(col("y")).as("s"))
      val ord = Window.orderBy(col("dt"))
      val signed = daily.crossJoin(broadcast(tot))
        .where(col("y") * col("nn") =!= col("s"))
        .withColumn("above",
          (col("y") * col("nn") > col("s")).cast("int"))
        .withColumn("chg",
          when(lag(col("above"), 1).over(ord).isNull
            || lag(col("above"), 1).over(ord) =!= col("above"), 1L)
            .otherwise(0L))
      val agg = signed.agg(
        sum(col("above").cast("long")).as("n1"),
        sum(lit(1L) - col("above")).as("n2"),
        sum(col("chg")).as("runs"))
      val n1 = col("n1").cast("double")
      val n2 = col("n2").cast("double")
      val n = (col("n1") + col("n2")).cast("double")
      val mu = lit(1.0) + lit(2.0) * n1 * n2 / n
      val sig2 = (mu - lit(1.0)) * (mu - lit(2.0)) / (n - lit(1.0))
      agg.select(col("n1"), col("n2"), col("runs"),
        r6((col("runs").cast("double") - mu) / sqrt(sig2)).as("z"))
    }),

    // PER-SOURCE ZIPF SLOPE — OLS of ln(count) on ln(rank) over each
    // source's top-50 tokens: the tokenizer-health number per corpus
    // slice (healthy text ≈ −1; a glued mega-token or boilerplate
    // flattens it). Products nano-quantized before the 50-row fold.
    "q_llm_zipf_per_source" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
      val ranked = counts
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("n").desc, col("w"))).cast("long"))
        .where(col("rank") <= 50)
      val x = log(col("rank").cast("double"))
      val y = log(col("n").cast("double"))
      val q = ranked
        .withColumn("x_nano", round(x * lit(1e9)).cast("long"))
        .withColumn("y_nano", round(y * lit(1e9)).cast("long"))
        .withColumn("xy_nano", round(x * y * lit(1e9)).cast("long"))
        .withColumn("xx_nano", round(x * x * lit(1e9)).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_ranks"),
          sum(col("x_nano")).as("sx"), sum(col("y_nano")).as("sy"),
          sum(col("xy_nano")).as("sxy"), sum(col("xx_nano")).as("sxx"))
      val nD = col("n_ranks").cast("double")
      val sx = col("sx").cast("double") / lit(1e9)
      val sy = col("sy").cast("double") / lit(1e9)
      val sxy = col("sxy").cast("double") / lit(1e9)
      val sxx = col("sxx").cast("double") / lit(1e9)
      q.select(col("source"), col("n_ranks"),
          r6((nD * sxy - sx * sy) / (nD * sxx - sx * sx))
            .as("zipf_slope"))
        .orderBy(col("source"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_mood_median" ->
      """WITH base AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y,
                    o_orderkey
                 FROM orders),
            med AS (SELECT y AS med FROM
                      (SELECT y,
                         row_number() OVER (ORDER BY y, o_orderkey) AS r,
                         COUNT(*) OVER () AS nn
                       FROM base) t
                    WHERE r = (nn + 1) // 2),
            per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nj,
                      CAST(SUM(CASE WHEN y > med THEN 1 ELSE 0 END)
                        AS BIGINT) AS aj
                    FROM base, med WHERE y <> med GROUP BY 1),
            t AS (SELECT CAST(SUM(nj) AS BIGINT) AS n,
                    CAST(SUM(aj) AS BIGINT) AS a FROM per),
            q AS (SELECT nj, aj, n, a,
                    CAST(nj AS DOUBLE) * CAST(a AS DOUBLE)
                      / CAST(n AS DOUBLE) AS ea,
                    CAST(nj AS DOUBLE) * CAST(n - a AS DOUBLE)
                      / CAST(n AS DOUBLE) AS eb
                  FROM per, t),
            z AS (SELECT n, a,
                    CAST(round(((CAST(aj AS DOUBLE) - ea)
                        * (CAST(aj AS DOUBLE) - ea) / ea
                      + (CAST(nj - aj AS DOUBLE) - eb)
                        * (CAST(nj - aj AS DOUBLE) - eb) / eb) * 1e9)
                      AS BIGINT) AS term_nano
                  FROM q)
         SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                MAX(n) AS n_used, MAX(a) AS n_above,
                round(CAST(SUM(term_nano) AS DOUBLE) / 1e9, 6)
                  AS chi2_mood
         FROM z""",

    "q_agg_page_trend" ->
      """WITH bm AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE))
                      AS ym,
                    substr(o_orderpriority, 1, 1) AS prio,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS v
                 FROM orders GROUP BY 1, 2),
            cmp AS (SELECT ym FROM bm GROUP BY ym HAVING COUNT(*) = 5),
            ranked AS (SELECT bm.prio,
                    rank() OVER (PARTITION BY bm.ym ORDER BY bm.v) AS rnk,
                    COUNT(*) OVER (PARTITION BY bm.ym, bm.v) AS t
                  FROM bm JOIN cmp ON bm.ym = cmp.ym),
            pt AS (SELECT prio,
                    CAST(SUM(2 * rnk + t - 1) AS BIGINT) AS r2,
                    CAST(COUNT(*) AS BIGINT) AS nb
                  FROM ranked GROUP BY prio),
            a AS (SELECT MAX(nb) AS n_blocks,
                    CAST(SUM(CAST(prio AS BIGINT) * r2) AS BIGINT) AS l2
                  FROM pt),
            f AS (SELECT n_blocks, l2,
                    CAST(n_blocks AS DOUBLE) AS bD,
                    CAST(l2 AS DOUBLE) / 2.0 AS lD
                  FROM a)
         SELECT CAST(5 AS BIGINT) AS k, n_blocks, l2 AS l2_stat,
                lD AS l_stat,
                round((lD - bD * 5.0 * 36.0 / 4.0)
                  / sqrt(bD * 25.0 * 6.0 * 24.0 / 144.0), 6) AS z
         FROM f""",

    "q_ts_runs_mean" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                    CAST(SUM(y) AS BIGINT) AS s FROM daily),
            sgn AS (SELECT dt,
                      CASE WHEN y * nn > s THEN 1 ELSE 0 END AS above
                    FROM daily, t WHERE y * nn <> s),
            chg AS (SELECT above,
                      CASE WHEN lag(above) OVER (ORDER BY dt) IS NULL
                             OR lag(above) OVER (ORDER BY dt) <> above
                           THEN 1 ELSE 0 END AS c
                    FROM sgn),
            agg AS (SELECT CAST(SUM(above) AS BIGINT) AS n1,
                      CAST(SUM(1 - above) AS BIGINT) AS n2,
                      CAST(SUM(c) AS BIGINT) AS runs
                    FROM chg),
            f AS (SELECT n1, n2, runs,
                    CAST(n1 AS DOUBLE) AS d1, CAST(n2 AS DOUBLE) AS d2,
                    CAST(n1 + n2 AS DOUBLE) AS dn,
                    CAST(runs AS DOUBLE) AS dr
                  FROM agg)
         SELECT n1, n2, runs,
                round((dr - (1.0 + 2.0 * d1 * d2 / dn))
                  / sqrt((1.0 + 2.0 * d1 * d2 / dn - 1.0)
                       * (1.0 + 2.0 * d1 * d2 / dn - 2.0) / (dn - 1.0)),
                  6) AS z
         FROM f""",

    "q_llm_zipf_per_source" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
            c AS (SELECT source, w, COUNT(*) AS n FROM tok GROUP BY 1, 2),
            rk AS (SELECT source, n,
                     CAST(row_number() OVER (PARTITION BY source
                       ORDER BY n DESC, w) AS BIGINT) AS rank
                   FROM c),
            top AS (SELECT source, rank, n,
                      ln(CAST(rank AS DOUBLE)) AS x,
                      ln(CAST(n AS DOUBLE)) AS y
                    FROM rk WHERE rank <= 50),
            q AS (SELECT source,
                    CAST(COUNT(*) AS BIGINT) AS n_ranks,
                    CAST(SUM(CAST(round(x * 1e9) AS BIGINT)) AS BIGINT)
                      AS sx,
                    CAST(SUM(CAST(round(y * 1e9) AS BIGINT)) AS BIGINT)
                      AS sy,
                    CAST(SUM(CAST(round(x * y * 1e9) AS BIGINT)) AS BIGINT)
                      AS sxy,
                    CAST(SUM(CAST(round(x * x * 1e9) AS BIGINT)) AS BIGINT)
                      AS sxx
                  FROM top GROUP BY 1)
         SELECT source, n_ranks,
                round((CAST(n_ranks AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                    - (CAST(sx AS DOUBLE) / 1e9)
                      * (CAST(sy AS DOUBLE) / 1e9))
                  / (CAST(n_ranks AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                    - (CAST(sx AS DOUBLE) / 1e9)
                      * (CAST(sx AS DOUBLE) / 1e9)), 6) AS zipf_slope
         FROM q ORDER BY source"""
  )
}
