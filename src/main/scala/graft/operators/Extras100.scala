package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 26: retrieval + statistical-process-
  * control round-out — BM25 ranking of a fixed query over the
  * document corpus, the individuals/moving-range (I-MR) control
  * chart, Western Electric run-rule violation counts on the
  * standardized daily revenue, and the newsvendor critical-ratio
  * stocking quantile.
  *
  * Scale note: BM25 is two corpus-linear folds (term frequencies,
  * document lengths) joined against a 3-row broadcast term table and
  * a 1-row broadcast corpus-stats row; the SPC charts ride the
  * bounded day spine; the newsvendor quantile walks the bounded
  * demand-value ECDF.
  *
  * Determinism contract (SURVEY §2.13): BM25 per-term scores are
  * nano-quantized before the per-doc fold and the top-20 selection
  * orders by the ROUNDED score (ties → doc_id); SPC rule triggers
  * compare the one shared z-chain against literal control limits;
  * the newsvendor quantile is an exact integer ECDF gate (4·cum ≥ 3n).
  */
object Extras100 {
  import Det._

  private val Big = DecimalType(38, 0)
  private val QueryTerms = Seq("dup", "vector", "join")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 (k1=1.2, b=0.75) — rank documents for the fixed query
    // {dup, vector, join}: idf = ln((N−df+½)/(df+½)+1); the length
    // normalization uses dl·N/S so every input is an exact integer.
    "q_llm_bm25" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val dl = docs.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      val toks = docs.select(col("doc_id"), explode(col("ws")).as("w"))
      val stats = dl.agg(count(lit(1)).as("nn"), sum(col("dl")).as("ss"))
      val dfT = toks.where(col("w").isin(QueryTerms: _*))
        .groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
      val fT = toks.where(col("w").isin(QueryTerms: _*))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("f"))
      val term = fT.join(broadcast(dfT), "w")
        .crossJoin(broadcast(stats))
      val idf = log((col("nn").cast("double") - col("df").cast("double")
        + 0.5) / (col("df").cast("double") + 0.5) + 1)
      val fD = col("f").cast("double")
      val norm = lit(1.2) * (lit(0.25) + lit(0.75) *
        (col("dl").cast(Big) * col("nn").cast(Big)).cast("double") /
        col("ss").cast("double"))
      val scored = term.join(dl, "doc_id")
        .withColumn("t_nano",
          round(idf * fD * 2.2 / (fD + norm) * 1e9).cast("long"))
      scored.groupBy(col("doc_id"))
        .agg(sum(col("t_nano")).as("sn"))
        .select(col("doc_id"),
          r6(col("sn").cast("double") / 1e9).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    }),

    // I-MR CONTROL CHART — daily revenue individuals with the
    // 2.66·MR̄ three-sigma surrogate; violations are days outside
    // [LCL, UCL].
    "q_ts_imr_chart" -> ((s, d) => {
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"))
      val w = Window.orderBy(col("dt"))
      val mr = byday.withColumn("mr", abs(col("x") - lag(col("x"), 1).over(w)))
      val m = mr.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("mr")).as("smr"))
      val center = col("sx").cast("double") / col("n").cast("double")
      val mrbar = col("smr").cast("double") / (col("n") - 1).cast("double")
      val lim = m.select(col("n"), center.as("ctr"), mrbar.as("mrb"),
        (center + lit(2.66) * mrbar).as("ucl"),
        (center - lit(2.66) * mrbar).as("lcl"))
      byday.crossJoin(broadcast(lim))
        .agg(first(col("n")).as("n_days"),
          r6(first(col("ctr")) / 100).as("center_dollars"),
          r6(first(col("ucl")) / 100).as("ucl_dollars"),
          r6(first(col("lcl")) / 100).as("lcl_dollars"),
          sum((col("x").cast("double") > col("ucl") ||
            col("x").cast("double") < col("lcl")).cast("long"))
            .as("n_violations"))
    }),

    // WESTERN ELECTRIC RULES — counts of days triggering rules 1-4 on
    // the standardized daily revenue: |z|>3; 2-of-3 beyond 2σ one
    // side; 4-of-5 beyond 1σ one side; 8 consecutive one side.
    "q_ts_western_electric" -> ((s, d) => {
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"))
      val m = byday.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"))
      val nD = col("n").cast("double")
      val mean = col("sx").cast("double") / nD
      val sd = sqrt((col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / nD) / nD)
      val z = byday.crossJoin(broadcast(
          m.select(col("n"), mean.as("mu"), sd.as("sig"))))
        .withColumn("z", (col("x").cast("double") - col("mu")) / col("sig"))
      def wlast(k: Int) = Window.orderBy(col("dt"))
        .rowsBetween(-(k - 1), Window.currentRow)
      val flags = z
        .withColumn("hi2", sum((col("z") > 2).cast("long")).over(wlast(3)))
        .withColumn("lo2", sum((col("z") < -2).cast("long")).over(wlast(3)))
        .withColumn("hi1", sum((col("z") > 1).cast("long")).over(wlast(5)))
        .withColumn("lo1", sum((col("z") < -1).cast("long")).over(wlast(5)))
        .withColumn("ab8", sum((col("z") > 0).cast("long")).over(wlast(8)))
        .withColumn("be8", sum((col("z") < 0).cast("long")).over(wlast(8)))
      flags.agg(first(col("n")).as("n_days"),
        sum((abs(col("z")) > 3).cast("long")).as("rule1"),
        sum((col("hi2") >= 2 || col("lo2") >= 2).cast("long")).as("rule2"),
        sum((col("hi1") >= 4 || col("lo1") >= 4).cast("long")).as("rule3"),
        sum((col("ab8") >= 8 || col("be8") >= 8).cast("long")).as("rule4"))
    }),

    // NEWSVENDOR QUANTILE — critical ratio cu/(cu+co) = 3/(3+1):
    // stock q* = the smallest daily-demand value whose ECDF reaches
    // 3/4, found by the exact integer gate 4·cum ≥ 3·n on the
    // demand-value spine.
    "q_agg_newsvendor" -> ((s, d) => {
      val byday = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("dt"))
        .agg(sum(col("l_quantity").cast("long")).as("dem"))
      val byval = byday.groupBy(col("dem")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("dem"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = byval.agg(sum(col("c")).as("n"))
      byval.withColumn("cum", sum(col("c")).over(w))
        .crossJoin(broadcast(tot))
        .where(col("cum") * 4 >= col("n") * 3)
        .orderBy(col("dem")).limit(1)
        .select(col("n").as("n_days"), col("dem").as("q_star"),
          r6(col("cum").cast("double") / col("n").cast("double"))
            .as("service_level"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_bm25" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM docs),
            toks AS (SELECT doc_id, unnest(ws) AS w FROM docs),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                        CAST(SUM(dl) AS BIGINT) AS ss FROM dl),
            dft AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                    FROM toks WHERE w IN ('dup', 'vector', 'join')
                    GROUP BY 1),
            ft AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS f
                   FROM toks WHERE w IN ('dup', 'vector', 'join')
                   GROUP BY 1, 2),
            term AS (SELECT ft.doc_id, ft.f, dft.df, dl.dl, s.nn, s.ss
                     FROM ft JOIN dft USING (w)
                       JOIN dl ON dl.doc_id = ft.doc_id, stats s),
            scored AS (SELECT doc_id,
                     CAST(round(
                       ln((CAST(nn AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                           / (CAST(df AS DOUBLE) + 0.5) + 1)
                         * CAST(f AS DOUBLE) * 2.2
                         / (CAST(f AS DOUBLE) + 1.2 * (0.25 + 0.75
                           * CAST(CAST(dl AS HUGEINT) * CAST(nn AS HUGEINT)
                             AS DOUBLE) / CAST(ss AS DOUBLE)))
                       * 1e9) AS BIGINT) AS t_nano
                   FROM term)
         SELECT doc_id, round(CAST(SUM(t_nano) AS DOUBLE) / 1e9, 6) AS bm25
         FROM scored GROUP BY 1
         ORDER BY bm25 DESC, doc_id LIMIT 20""",

    "q_ts_imr_chart" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS x
                 FROM orders GROUP BY 1),
            mr AS (SELECT dt, x,
                     abs(x - lag(x, 1) OVER (ORDER BY dt)) AS mr
                   FROM byday),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(mr) AS BIGINT) AS smr
                  FROM mr),
            lim AS (SELECT n,
                    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS ctr,
                    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                      + 2.66 * (CAST(smr AS DOUBLE)
                        / CAST(n - 1 AS DOUBLE)) AS ucl,
                    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                      - 2.66 * (CAST(smr AS DOUBLE)
                        / CAST(n - 1 AS DOUBLE)) AS lcl
                  FROM m)
         SELECT n AS n_days, round(ctr / 100, 6) AS center_dollars,
                round(ucl / 100, 6) AS ucl_dollars,
                round(lcl / 100, 6) AS lcl_dollars,
                CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > ucl
                    OR CAST(x AS DOUBLE) < lcl THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
         FROM byday, lim GROUP BY 1, 2, 3, 4""",

    "q_ts_western_electric" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS x
                 FROM orders GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
                  FROM byday),
            st AS (SELECT n,
                    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                    sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE)) AS sig
                  FROM m),
            z AS (SELECT dt, n,
                    (CAST(x AS DOUBLE) - mu) / sig AS z
                  FROM byday, st),
            f AS (SELECT n, z,
                    SUM(CASE WHEN z > 2 THEN 1 ELSE 0 END) OVER w3 AS hi2,
                    SUM(CASE WHEN z < -2 THEN 1 ELSE 0 END) OVER w3 AS lo2,
                    SUM(CASE WHEN z > 1 THEN 1 ELSE 0 END) OVER w5 AS hi1,
                    SUM(CASE WHEN z < -1 THEN 1 ELSE 0 END) OVER w5 AS lo1,
                    SUM(CASE WHEN z > 0 THEN 1 ELSE 0 END) OVER w8 AS ab8,
                    SUM(CASE WHEN z < 0 THEN 1 ELSE 0 END) OVER w8 AS be8
                  FROM z
                  WINDOW w3 AS (ORDER BY dt
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                    w5 AS (ORDER BY dt
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                    w8 AS (ORDER BY dt
                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
         SELECT n AS n_days,
                CAST(SUM(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS rule1,
                CAST(SUM(CASE WHEN hi2 >= 2 OR lo2 >= 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS rule2,
                CAST(SUM(CASE WHEN hi1 >= 4 OR lo1 >= 4 THEN 1 ELSE 0 END)
                  AS BIGINT) AS rule3,
                CAST(SUM(CASE WHEN ab8 >= 8 OR be8 >= 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS rule4
         FROM f GROUP BY 1""",

    "q_agg_newsvendor" ->
      """WITH byday AS (SELECT CAST(l_shipdate AS DATE) AS dt,
                    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS dem
                 FROM lineitem GROUP BY 1),
            byval AS (SELECT dem, CAST(COUNT(*) AS BIGINT) AS c
                      FROM byday GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM byval),
            cumv AS (SELECT dem,
                     CAST(SUM(c) OVER (ORDER BY dem
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum,
                     n
                   FROM byval, t)
         SELECT n AS n_days, dem AS q_star,
                round(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS service_level
         FROM cumv WHERE cum * 4 >= n * 3
         ORDER BY dem LIMIT 1"""
  )
}
