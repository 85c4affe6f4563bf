package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 additions, part 16: ANN recall audit, cross-series
  * correlation, PSI distribution drift, the Lorenz concentration curve,
  * audience overlap, and Simpson diversity.
  */
object Extras26 {
  import graft.Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ANN RECALL AUDIT — how many of the exact top-5 neighbors each
    // approximate index (IVF, multi-probe LSH) actually returned: the
    // measurement that justifies — or refuses — every approximate
    // retrieval deployment. Composes the three existing kernels
    // verbatim (exact brute-force, IVF, LSH — the same plans their own
    // keys grade); hits are exact set intersections, recalls one IEEE
    // division each.
    "q_llm_ann_recall" -> ((s, d) => {
      val exact5 = LlmOps.queries("q_llm_sim_topk")(s, d)
        .limit(5).select(col("vec_id"))
      val ivf = LlmSketches.queries("q_llm_ann_ivf")(s, d)
        .select(col("vec_id"))
      val lsh = LlmSketches.queries("q_llm_ann_lsh")(s, d)
        .select(col("vec_id"))
      val hitsIvf = exact5.join(ivf, "vec_id")
        .agg(count(lit(1)).as("hits_ivf"))
      val hitsLsh = exact5.join(lsh, "vec_id")
        .agg(count(lit(1)).as("hits_lsh"))
      hitsIvf.crossJoin(broadcast(hitsLsh))
        .select(lit(5L).as("k"), col("hits_ivf"),
          (col("hits_ivf").cast("double") / lit(5.0)).as("recall_ivf"),
          col("hits_lsh"),
          (col("hits_lsh").cast("double") / lit(5.0)).as("recall_lsh"))
    }),

    // CROSS-SERIES CORRELATION AT LAGS — Pearson r between the click
    // and purchase daily-count series at lags 0..3 (does today's
    // clicking predict purchasing L days later — the lead-indicator
    // scan). Each lag row's five sums are EXACT integers from one
    // day-offset join; r is the per-row shared IEEE tail; the lag
    // spine is a constant 4-row dimension.
    "q_ts_xcorr" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("c"))
      val x = daily.where(col("event_type") === "click")
        .select(col("dt").as("xd"), col("c").as("x"))
      val y = daily.where(col("event_type") === "purchase")
        .select(col("dt").as("yd"), col("c").as("y"))
      val lags = s.range(0, 4).select(col("id").cast("int").as("lag"))
      val joined = x.crossJoin(broadcast(lags))
        .join(y, date_add(col("xd"), col("lag")) === col("yd"))
      val agg = joined.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val n = col("n").cast("double")
      def D(c: String) = col(c).cast("double")
      val num = n * D("sxy") - D("sx") * D("sy")
      val den = (sqrt(n * D("sxx") - D("sx") * D("sx"))
        * sqrt(n * D("syy") - D("sy") * D("sy")))
      agg.select(col("lag"), col("n"), r6(num / den).as("r"))
        .orderBy("lag")
    }),

    // PSI DISTRIBUTION DRIFT — Population Stability Index between the
    // pre-1998 and 1998+ order-price distributions over 10 FIXED
    // equal-width bins (never estimated quantile edges — integer
    // binning is engine-exact). Per-bin terms only: the total PSI is a
    // 10-double sum whose accumulation order engines need not agree on
    // (the chi2 rule) — consumers sum the audited terms. ln agrees
    // bit-for-bit on shared libm (q_llm_entropy precedent).
    "q_dq_psi" -> ((s, d) => {
      val binned = Tables.orders(s, d)
        .select(
          (year(col("o_orderdate")) < 1998).as("old"),
          least(((dec(col("o_totalprice")) * 100).cast("long")
            / lit(6000000L)).cast("long"), lit(9L)).cast("int").as("bin"))
      val agg = binned.groupBy(col("bin"))
        .agg(sum(when(col("old"), 1L).otherwise(0L)).as("n_old"),
          sum(when(!col("old"), 1L).otherwise(0L)).as("n_new"))
      val tot = Window.partitionBy(lit(1))
      val p = (col("n_old").cast("double")
        / sum(col("n_old")).over(tot).cast("double"))
      val q = (col("n_new").cast("double")
        / sum(col("n_new")).over(tot).cast("double"))
      agg
        .withColumn("p", p).withColumn("q", q)
        .select(col("bin"), col("n_old"), col("n_new"), col("p"), col("q"),
          when(col("p") > 0 && col("q") > 0,
            (col("p") - col("q")) * log(col("p") / col("q")))
            .as("psi_term"))
        .orderBy("bin")
    }),

    // LORENZ CURVE — customer-spend concentration by decile: rank
    // customers by exact total cents (custkey tiebreak → TOTAL order,
    // so ntile is engine-exact), then each decile's cumulative share
    // of the grand total. Cumulative sums are exact integers over a
    // 10-row spine; shares are one IEEE division each — the curve
    // behind q_agg_gini's single number.
    "q_agg_lorenz" -> ((s, d) => {
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
      val ranked = spend.withColumn("decile",
        ntile(10).over(Window.orderBy(col("cents"), col("o_custkey"))))
      val byDec = ranked.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"))
      val ord = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      byDec
        .withColumn("cum_cents", sum(col("cents")).over(ord))
        .withColumn("total", sum(col("cents")).over(tot))
        .select(col("decile"), col("n_cust"), col("cents"),
          (col("cum_cents").cast("double") / col("total").cast("double"))
            .as("cum_share"))
        .orderBy("decile")
    }),

    // AUDIENCE OVERLAP — Jaccard of user bases between every pair of
    // event types (the cross-sell / cannibalization matrix). One
    // distinct to the (type, user) grain; the pair join's fan-out is
    // per-user × type²— types are a CONSTANT dimension, so the join is
    // user-linear; counts exact, one division per pair.
    "q_evt_overlap" -> ((s, d) => {
      val tu = Tables.events(s, d)
        .select(col("event_type").as("t"), col("user_id").as("u"))
        .distinct()
      val sizes = tu.groupBy(col("t")).agg(count(lit(1)).as("n"))
      val inter = tu.as("a").join(tu.as("b"),
          col("a.u") === col("b.u") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("t").as("ta"), col("n").as("na")), "ta")
        .join(sizes.select(col("t").as("tb"), col("n").as("nb")), "tb")
        .select(col("ta"), col("tb"), col("na"), col("nb"), col("inter"),
          (col("inter").cast("double")
            / (col("na") + col("nb") - col("inter")).cast("double"))
            .as("jaccard"))
        .orderBy("ta", "tb")
    }),

    // SIMPSON DIVERSITY — per region, 1 − Σnᵢ(nᵢ−1)/(N(N−1)) over the
    // customer market-segment mix (the category-concentration measure
    // next to q_agg_hhi's revenue one). Both Σ terms are INTEGER sums
    // over the bounded segment dimension — no accumulation-order
    // exposure — and D is one shared IEEE tail.
    "q_agg_diversity" -> ((s, d) => {
      val seg = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("ni"))
      seg.groupBy(col("r_name"))
        .agg(sum(col("ni")).as("n"),
          count(lit(1)).as("n_segments"),
          sum(col("ni") * (col("ni") - 1)).as("pairs"))
        .select(col("r_name"), col("n"), col("n_segments"),
          (lit(1.0) - col("pairs").cast("double")
            / (col("n") * (col("n") - 1)).cast("double"))
            .as("simpson"))
        .orderBy("r_name")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_ann_recall" -> {
      val topk = LlmOps.oracle("q_llm_sim_topk")
      val ivf = LlmSketches.oracle("q_llm_ann_ivf")
      val lsh = LlmSketches.oracle("q_llm_ann_lsh")
      s"""WITH exact5 AS (SELECT vec_id FROM ($topk)
                          ORDER BY score DESC, vec_id LIMIT 5),
            ivf AS (SELECT vec_id FROM ($ivf)),
            lsh AS (SELECT vec_id FROM ($lsh)),
            hi AS (SELECT COUNT(*) AS hits_ivf
                   FROM exact5 JOIN ivf USING (vec_id)),
            hl AS (SELECT COUNT(*) AS hits_lsh
                   FROM exact5 JOIN lsh USING (vec_id))
         SELECT CAST(5 AS BIGINT) AS k, hits_ivf,
                CAST(hits_ivf AS DOUBLE) / 5.0 AS recall_ivf,
                hits_lsh,
                CAST(hits_lsh AS DOUBLE) / 5.0 AS recall_lsh
         FROM hi CROSS JOIN hl"""
    },

    "q_ts_xcorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                    COUNT(*) AS c
                 FROM events GROUP BY 1, 2),
            x AS (SELECT dt AS xd, c AS x FROM daily
                  WHERE event_type = 'click'),
            y AS (SELECT dt AS yd, c AS y FROM daily
                  WHERE event_type = 'purchase'),
            lags AS (SELECT unnest(range(4)) AS lag),
            j AS (SELECT lag, x, y FROM x CROSS JOIN lags
                  JOIN y ON xd + CAST(lag AS INT) = yd),
            agg AS (SELECT lag, COUNT(*) AS n,
                      CAST(SUM(x) AS BIGINT) AS sx,
                      CAST(SUM(y) AS BIGINT) AS sy,
                      CAST(SUM(x * y) AS BIGINT) AS sxy,
                      CAST(SUM(x * x) AS BIGINT) AS sxx,
                      CAST(SUM(y * y) AS BIGINT) AS syy
                    FROM j GROUP BY 1)
         SELECT CAST(lag AS INT) AS lag, n,
                round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                  6) AS r
         FROM agg ORDER BY lag""",

    "q_dq_psi" ->
      """WITH b AS (SELECT year(o_orderdate) < 1998 AS old,
                    CAST(least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT) // 6000000, 9) AS INT) AS bin
                 FROM orders),
            agg AS (SELECT bin,
                      CAST(SUM(CASE WHEN old THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_old,
                      CAST(SUM(CASE WHEN NOT old THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_new
                    FROM b GROUP BY 1),
            f AS (SELECT bin, n_old, n_new,
                    CAST(n_old AS DOUBLE)
                      / CAST(CAST(SUM(n_old) OVER () AS BIGINT) AS DOUBLE) AS p,
                    CAST(n_new AS DOUBLE)
                      / CAST(CAST(SUM(n_new) OVER () AS BIGINT) AS DOUBLE) AS q
                  FROM agg)
         SELECT bin, n_old, n_new, p, q,
                CASE WHEN p > 0 AND q > 0
                     THEN (p - q) * ln(p / q) END AS psi_term
         FROM f ORDER BY bin""",

    "q_agg_lorenz" ->
      """WITH spend AS (SELECT o_custkey,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
            ranked AS (SELECT cents,
                         CAST(ntile(10) OVER (ORDER BY cents, o_custkey)
                              AS INT) AS decile
                       FROM spend),
            dec AS (SELECT decile, COUNT(*) AS n_cust,
                      CAST(SUM(cents) AS BIGINT) AS cents
                    FROM ranked GROUP BY 1),
            c AS (SELECT decile, n_cust, cents,
                    CAST(SUM(cents) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
                    CAST(SUM(cents) OVER () AS BIGINT) AS total
                  FROM dec)
         SELECT decile, n_cust, cents,
                CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE)
                  AS cum_share
         FROM c ORDER BY decile""",

    "q_evt_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
                     FROM events),
            sizes AS (SELECT t, COUNT(*) AS n FROM tu GROUP BY 1),
            inter AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS inter
                      FROM tu a JOIN tu b
                        ON a.u = b.u AND a.t < b.t
                      GROUP BY 1, 2)
         SELECT ta, tb, sa.n AS na, sb.n AS nb, inter,
                CAST(inter AS DOUBLE)
                  / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.t = ta
         JOIN sizes sb ON sb.t = tb
         ORDER BY ta, tb""",

    "q_agg_diversity" ->
      """WITH seg AS (SELECT r_name, c_mktsegment, COUNT(*) AS ni
                 FROM customer
                 JOIN nation ON c_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
                 GROUP BY 1, 2),
            agg AS (SELECT r_name,
                      CAST(SUM(ni) AS BIGINT) AS n,
                      COUNT(*) AS n_segments,
                      CAST(SUM(ni * (ni - 1)) AS BIGINT) AS pairs
                    FROM seg GROUP BY 1)
         SELECT r_name, n, n_segments,
                1.0 - CAST(pairs AS DOUBLE)
                  / CAST(n * (n - 1) AS DOUBLE) AS simpson
         FROM agg ORDER BY r_name"""
  )
}
