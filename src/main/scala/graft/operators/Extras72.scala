package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-10 additions, part 10: the Poisson bootstrap (the distributed
  * resampling method — per-row deterministic Poisson(1) weights, so a
  * replicate never materializes a resampled table), a Gumbel
  * block-maxima fit (extreme-value risk), and tokenizer fertility per
  * source (tokens-per-word, the tokenizer-eval staple).
  *
  * Determinism contract (SURVEY §2.13): bootstrap weights come from
  * integer thresholds on the 60-bit portable hash (the cumulative
  * Poisson(1) CDF scaled to 2^60, embedded as exact literals);
  * replicate means are micro-quantized BEFORE the 32-row variance fold
  * (a 32-row IEEE sum would be merge-order-dependent); Gumbel/fertility
  * fold exact integer sums with literal constants (γ, √6/π) — no
  * engine-specific constant enters parity.
  */
object Extras72 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // POISSON BOOTSTRAP — standard error + normal CI of the mean order
    // value from B=32 replicates: each row enters replicate b with
    // weight w ~ Poisson(1), drawn deterministically from
    // md5long(orderkey:b) against the scaled-CDF integer thresholds.
    // This is THE distributed bootstrap: one pass, a bounded 32×
    // explode, no resampled tables, and the replicate relation is
    // B-sized. Replicate means are micro-quantized before the 32-row
    // moment fold so no IEEE value enters a multi-row sum.
    "q_agg_poisson_bootstrap" -> ((s, d) => {
      val b = 32
      val big = DecimalType(38, 0)
      // cumulative Poisson(1) CDF × 2^60, exact integer thresholds
      val t = Seq(424136118829305344L, 848272237658610688L,
        1060340297073263360L, 1131029650211480960L,
        1148701988496035328L, 1152236456152946176L)
      val u = md5long(concat(col("o_orderkey").cast("string"), lit(":"),
        col("rep").cast("string")))
      val w = when(u < t(0), 0L).when(u < t(1), 1L).when(u < t(2), 2L)
        .when(u < t(3), 3L).when(u < t(4), 4L).when(u < t(5), 5L)
        .otherwise(6L)
      val reps = Tables.orders(s, d)
        .select(col("o_orderkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        .crossJoin(broadcast(
          s.range(b).select(col("id").as("rep"))))
        .withColumn("w", w)
        .groupBy(col("rep"))
        .agg(sum(col("w") * col("cents")).as("ws"), sum(col("w")).as("wn"))
        .select(round(col("ws").cast("double") / col("wn").cast("double")
          * 1e6).cast("long").as("m_micro"))
      val base = Tables.orders(s, d)
        .agg(count(lit(1)).as("n"),
          sum((dec(col("o_totalprice")) * 100).cast("long")).as("sc"))
      val fold = reps.agg(count(lit(1)).as("n_reps"),
        sum(col("m_micro")).as("sm"),
        // cast BEFORE the square: m_micro² ≈ 2e26 overflows BIGINT
        sum(col("m_micro").cast(big) * col("m_micro").cast(big)).as("smm"))
      val bD = col("n_reps").cast("double")
      val se = sqrt((col("smm").cast("double")
        - col("sm").cast("double") * col("sm").cast("double") / bD)
        / (bD - lit(1.0))) / lit(1e6) / lit(100.0)
      val meanUsd = col("sc").cast("double") / col("n").cast("double") /
        lit(100.0)
      fold.crossJoin(broadcast(base))
        .select(col("n_reps"), col("n").as("n_orders"),
          r6(meanUsd).as("mean_usd"),
          r6(se).as("boot_se_usd"),
          r6(meanUsd - lit(1.96) * se).as("ci_lo_usd"),
          r6(meanUsd + lit(1.96) * se).as("ci_hi_usd"))
    }),

    // GUMBEL BLOCK-MAXIMA FIT — extreme-value estimate of monthly
    // maximum daily revenue by the method of moments: β = s·√6/π,
    // μ = m − γβ (γ Euler-Mascheroni; both literals shared, never an
    // engine constant); the 99th-percentile return level
    // μ − β·ln(−ln 0.99) answers "what daily peak should one month in
    // a hundred reach". Maxima fold exact cents; one bounded spine.
    "q_ts_gumbel_maxima" -> ((s, d) => {
      val big = DecimalType(38, 0)
      val mx = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .groupBy(trunc(col("dt"), "month").as("ym"))
        .agg(max(col("y")).as("blockmax"))
      val a = mx.agg(count(lit(1)).as("n"),
        sum(col("blockmax")).as("s1"),
        sum((col("blockmax").cast(big) * col("blockmax").cast(big)))
          .as("s2"))
      val nD = col("n").cast("double")
      val m = col("s1").cast("double") / nD
      val sd = sqrt((col("s2").cast("double")
        - col("s1").cast("double") * col("s1").cast("double") / nD)
        / (nD - lit(1.0)))
      val beta = sd * lit(0.779696801233676)
      val mu = m - lit(0.5772156649015329) * beta
      a.select(col("n").as("n_blocks"),
        r6(mu / lit(100.0)).as("mu_usd"),
        r6(beta / lit(100.0)).as("beta_usd"),
        r6((mu - beta * log(lit(-1.0) * log(lit(0.99)))) / lit(100.0))
          .as("rl99_usd"))
    }),

    // TOKENIZER FERTILITY — tokens per whitespace word, per source:
    // the first number a tokenizer evaluation reports (high fertility =
    // the tokenizer fragments this source's text). Regex tokens reuse
    // q_llm_token_count's [^a-z0-9]+ splitter; both counts are exact
    // integers from one corpus pass; fertility is one IEEE division.
    "q_llm_tokenizer_fertility" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("nw"),
          size(split(col("text"), "[^a-z0-9]+")).cast("long").as("nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).as("n_words"),
          sum(col("nt")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_tokens"),
          r6(col("n_tokens").cast("double")
            / col("n_words").cast("double")).as("fertility"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_poisson_bootstrap" ->
      """WITH reps AS (SELECT CAST(round(CAST(ws AS DOUBLE)
                      / CAST(wn AS DOUBLE) * 1000000) AS BIGINT)
                      AS m_micro
                 FROM (SELECT rep,
                         CAST(SUM(w * cents) AS BIGINT) AS ws,
                         CAST(SUM(w) AS BIGINT) AS wn
                       FROM (SELECT o.o_orderkey, o.cents, r.rep,
                               CASE WHEN u < 424136118829305344 THEN 0
                                    WHEN u < 848272237658610688 THEN 1
                                    WHEN u < 1060340297073263360 THEN 2
                                    WHEN u < 1131029650211480960 THEN 3
                                    WHEN u < 1148701988496035328 THEN 4
                                    WHEN u < 1152236456152946176 THEN 5
                                    ELSE 6 END AS w
                             FROM (SELECT o_orderkey,
                                     CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                       * 100 AS BIGINT) AS cents
                                   FROM orders) o,
                                  (SELECT unnest(range(0, 32)) AS rep) r,
                                  LATERAL (SELECT
                                    CAST(('0x' || substr(md5(
                                      CAST(o.o_orderkey AS VARCHAR) || ':'
                                      || CAST(r.rep AS VARCHAR)), 1, 15))
                                      AS BIGINT) AS u) h)
                       GROUP BY rep)),
            fold AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
                    CAST(SUM(m_micro) AS BIGINT) AS sm,
                    CAST(SUM(CAST(m_micro AS DECIMAL(38,0))
                      * CAST(m_micro AS DECIMAL(38,0))) AS DOUBLE) AS smm
                  FROM reps),
            base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                       * 100 AS BIGINT)) AS BIGINT) AS sc
                   FROM orders)
         SELECT n_reps, n AS n_orders,
                round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
                  AS mean_usd,
                round(sqrt((smm - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                    / CAST(n_reps AS DOUBLE))
                  / (CAST(n_reps AS DOUBLE) - 1.0)) / 1000000.0 / 100.0,
                  6) AS boot_se_usd,
                round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                  - 1.96 * (sqrt((smm - CAST(sm AS DOUBLE)
                      * CAST(sm AS DOUBLE) / CAST(n_reps AS DOUBLE))
                    / (CAST(n_reps AS DOUBLE) - 1.0)) / 1000000.0 / 100.0),
                  6) AS ci_lo_usd,
                round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                  + 1.96 * (sqrt((smm - CAST(sm AS DOUBLE)
                      * CAST(sm AS DOUBLE) / CAST(n_reps AS DOUBLE))
                    / (CAST(n_reps AS DOUBLE) - 1.0)) / 1000000.0 / 100.0),
                  6) AS ci_hi_usd
         FROM fold, base""",

    "q_ts_gumbel_maxima" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            mx AS (SELECT date_trunc('month', dt) AS ym,
                     MAX(y) AS blockmax
                   FROM daily GROUP BY 1),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(blockmax) AS BIGINT) AS s1,
                    CAST(SUM(CAST(blockmax AS DECIMAL(38,0))
                      * CAST(blockmax AS DECIMAL(38,0))) AS DOUBLE) AS s2
                  FROM mx),
            c AS (SELECT n,
                    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                    sqrt((s2 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                        / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))
                      * 0.779696801233676 AS beta
                  FROM a)
         SELECT n AS n_blocks,
                round((m - 0.5772156649015329 * beta) / 100.0, 6)
                  AS mu_usd,
                round(beta / 100.0, 6) AS beta_usd,
                round(((m - 0.5772156649015329 * beta)
                  - beta * ln(-1.0 * ln(0.99))) / 100.0, 6) AS rl99_usd
         FROM c""",

    "q_llm_tokenizer_fertility" ->
      """WITH t AS (SELECT source,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
                    CAST(len(regexp_split_to_array(text, '[^a-z0-9]+'))
                      AS BIGINT) AS nt
                 FROM documents)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(nw) AS BIGINT) AS n_words,
                CAST(SUM(nt) AS BIGINT) AS n_tokens,
                round(CAST(SUM(nt) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE),
                  6) AS fertility
         FROM t GROUP BY source ORDER BY source"""
  )
}
