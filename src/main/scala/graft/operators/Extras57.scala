package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 20: seasonal residual outliers, the Markov
  * next-event predictor evaluation, and per-source keyword extraction.
  *
  * Determinism contract (SURVEY §2.13): outlier membership squares to
  * an exact integer predicate (the bollinger/cusum rule); predictor
  * accuracy is a ratio of exact counts; keyword ranking uses
  * pre-quantized integer PMI.
  */
object Extras57 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SEASONAL OUTLIERS — days whose weekday-adjusted residual exceeds
    // 3σ of the residual distribution: membership squares to the EXACT
    // integer predicate (n·r)² > 9·(n·Σr² − S²) over kilodollar
    // residual integers (no IEEE op decides membership — the
    // bollinger/cusum discipline). Weekday means broadcast (7 rows);
    // the moment aggregate broadcasts back over the daily spine.
    "q_ts_seasonal_outliers" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("dow", expr("datediff(dt, DATE'1970-01-01') % 7"))
      val byDow = daily.groupBy(col("dow").as("dw"))
        .agg(count(lit(1)).as("n_dow"), sum(col("y")).as("s_dow"))
      val resid = daily.join(broadcast(byDow), col("dow") === col("dw"))
        .withColumn("rk", round((col("y").cast("double")
          - col("s_dow").cast("double") / col("n_dow").cast("double"))
          / 1e5).cast("long"))
      val m = resid.agg(count(lit(1)).as("n"), sum(col("rk")).as("sr"),
        sum(col("rk") * col("rk")).as("srr"))
      resid.crossJoin(broadcast(m))
        .where((col("n") * col("rk") - col("sr"))
          * (col("n") * col("rk") - col("sr"))
          > (col("n") * col("srr") - col("sr") * col("sr")) * 9)
        .select(col("dt"), col("y"), col("rk").as("resid_k"),
          col("n").as("n_days"))
        .orderBy("dt")
    }),

    // MARKOV PREDICTOR EVALUATION — how often does "predict the most
    // likely next event type" get it right? The predictor is the
    // argmax row of the transition-count matrix (ties broken by type
    // name — engine-exact); accuracy is hits/transitions, both exact
    // integers from the SAME one-pass transition relation. The honest
    // baseline every sequence model must beat.
    "q_evt_markov_eval" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("src"),
          col("ts"), col("event_id"))
        .withColumn("dst", lead(col("src"), 1).over(w))
        .where(col("dst").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val pred = trans
        .withColumn("rk", row_number().over(Window.partitionBy(col("src"))
          .orderBy(col("n").desc, col("dst"))))
        .where(col("rk") === 1)
        .select(col("src").as("psrc"), col("dst").as("predicted"))
      trans.join(broadcast(pred), col("src") === col("psrc"))
        .groupBy(col("src"), col("predicted"))
        .agg(sum(col("n")).as("n_transitions"),
          sum(when(col("dst") === col("predicted"), col("n"))
            .otherwise(0L)).as("n_hits"))
        .select(col("src"), col("predicted"), col("n_transitions"),
          col("n_hits"),
          r6(col("n_hits").cast("double")
            / col("n_transitions").cast("double")).as("accuracy"))
        .orderBy("src")
    }),

    // KEYWORDS PER SOURCE — the top-3 most source-characteristic
    // tokens by pointwise mutual information (the keyword-extraction
    // shape behind topic labeling): PMI = ln(p(w|s)/p(w)) computed on
    // exact counts and PRE-QUANTIZED to integer micro-units, so the
    // per-source ranking never compares IEEE values (ties by word).
    // All relations vocabulary- or sources×vocabulary-bounded.
    "q_llm_keywords_per_source" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val sw = toks.groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c_sw"))
      val st = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("c_s"))
      val wt = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
      val tot = sw.agg(sum(col("c_sw")).as("c_all"))
      val scored = sw.join(broadcast(st), "source")
        .join(broadcast(wt), "w")
        .crossJoin(broadcast(tot))
        .where(col("c_sw") >= 5)
        .withColumn("pmi_micro", round(log(
          col("c_sw").cast("double") * col("c_all").cast("double")
            / (col("c_s").cast("double") * col("c_w").cast("double")))
          * 1e6).cast("long"))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("pmi_micro").desc, col("w"))))
        .where(col("rk") <= 3)
        .select(col("source"), col("rk").cast("long").as("rk"), col("w"),
          col("c_sw"), col("pmi_micro"),
          (col("pmi_micro").cast("double") / 1e6).as("pmi"))
        .orderBy("source", "rk")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_seasonal_outliers" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dd AS (SELECT dt, y,
                     (dt - DATE '1970-01-01') % 7 AS dow FROM daily),
            bydow AS (SELECT dow AS dw, CAST(COUNT(*) AS BIGINT) AS n_dow,
                             CAST(SUM(y) AS BIGINT) AS s_dow
                      FROM dd GROUP BY 1),
            resid AS (SELECT dt, y,
                        CAST(round((CAST(y AS DOUBLE)
                          - CAST(s_dow AS DOUBLE) / CAST(n_dow AS DOUBLE))
                          / 1e5) AS BIGINT) AS rk
                      FROM dd JOIN bydow ON dow = dw),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(rk) AS BIGINT) AS sr,
                         CAST(SUM(rk * rk) AS BIGINT) AS srr
                  FROM resid)
         SELECT dt, y, rk AS resid_k, n AS n_days
         FROM resid, m
         WHERE (n * rk - sr) * (n * rk - sr) > (n * srr - sr * sr) * 9
         ORDER BY dt""",

    "q_evt_markov_eval" ->
      """WITH e AS (SELECT user_id, event_type AS src,
                           ts::TIMESTAMP AS t, event_id
                 FROM events),
            tr AS (SELECT src,
                     lead(src, 1) OVER (PARTITION BY user_id
                       ORDER BY t, event_id) AS dst
                   FROM e),
            cnt AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
                    FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
            pred AS (SELECT src AS psrc, dst AS predicted FROM (
                       SELECT src, dst,
                         row_number() OVER (PARTITION BY src
                           ORDER BY n DESC, dst) AS rk
                       FROM cnt) WHERE rk = 1)
         SELECT src, predicted,
                CAST(SUM(n) AS BIGINT) AS n_transitions,
                CAST(SUM(CASE WHEN dst = predicted THEN n ELSE 0 END)
                  AS BIGINT) AS n_hits,
                round(CAST(SUM(CASE WHEN dst = predicted THEN n ELSE 0 END)
                    AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS accuracy
         FROM cnt JOIN pred ON psrc = src
         GROUP BY src, predicted ORDER BY src""",

    "q_llm_keywords_per_source" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
                    FROM documents),
            sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
                   FROM toks GROUP BY 1, 2),
            st AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS c_s
                   FROM sw GROUP BY 1),
            wt AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w
                   FROM sw GROUP BY 1),
            tot AS (SELECT CAST(SUM(c_sw) AS BIGINT) AS c_all FROM sw),
            sc AS (SELECT sw.source, sw.w, sw.c_sw,
                     CAST(round(ln(CAST(sw.c_sw AS DOUBLE)
                       * CAST(c_all AS DOUBLE)
                       / (CAST(c_s AS DOUBLE) * CAST(c_w AS DOUBLE)))
                       * 1e6) AS BIGINT) AS pmi_micro
                   FROM sw JOIN st USING (source)
                   JOIN wt USING (w), tot
                   WHERE sw.c_sw >= 5),
            r AS (SELECT source, w, c_sw, pmi_micro,
                    row_number() OVER (PARTITION BY source
                      ORDER BY pmi_micro DESC, w) AS rk
                  FROM sc)
         SELECT source, CAST(rk AS BIGINT) AS rk, w, c_sw, pmi_micro,
                CAST(pmi_micro AS DOUBLE) / 1e6 AS pmi
         FROM r WHERE rk <= 3 ORDER BY source, rk"""
  )
}
