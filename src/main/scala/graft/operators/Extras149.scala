package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 additions, part 3: time-series motif/discord discovery
  * (matrix profile — the standard all-pairs subsequence-similarity
  * readout), uplift evaluation (Qini curve), a closed-form 2-variable
  * PCA, temperature-scaled mixture weights and a fixed-weight quality
  * logit (two staple LLM-data-pipeline transforms).
  *
  * Scale shapes: the matrix profile pairs the CALENDAR-bounded daily
  * spine against itself (≤ ~2.4k positions regardless of fact volume —
  * the broadcast side is date-bounded, never corpus-bounded); qini /
  * pca2 / mix_temperature / quality_logit are one fact fold each into
  * a user / 1-row / source spine.
  *
  * Determinism contract (SURVEY §2.13): matrix-profile distances are
  * exact whole-dollar² BIGINT sums with argmin ties on the position id; pca2
  * keeps every accumulated moment an exact BIGINT < 2^53 before the
  * ONE shared IEEE eigen expression (quantity × discount-bp units
  * chosen precisely so no sum can cross 2^53 — the haar_energy
  * lesson); qini cumulative counts are exact integers with one shared
  * division tree; mix/logit micro-quantize per row/term before any
  * cross-row double sum (playbook rule 1).
  */
object Extras149 {
  import graft.Det._

  /** Daily-revenue matrix profile (window m=7, exclusion zone 4):
    * shared by q_ts_matrix_profile and q_ts_discord. */
  private def mprofile(s: SparkSession, d: String): DataFrame = {
    // series unit = WHOLE DOLLARS (exact cents sum, then integer
    // div — identical truncation both engines): cents-unit diffs²
    // overflow BIGINT at the 8× probe's daily volumes (measured
    // ARITHMETIC_OVERFLOW) while DuckDB silently widens to HUGEINT —
    // the divergent-failure-mode class from round-13 ADVICE item 2.
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long"))
        .as("v_cents"))
      .select(col("dt"), expr("v_cents div 100").as("v_cents"))
    val ow = Window.orderBy(col("dt"))
    val sub = daily
      .withColumn("pos", row_number().over(ow).cast("long"))
      .withColumn("sub", collect_list(col("v_cents")).over(
        ow.rowsBetween(Window.currentRow, 6)))
      .where(size(col("sub")) === 7)
      .select(col("pos"), col("sub"))
      // fan out after the single-partition global window: the ×2.4k
      // pair expansion below otherwise runs on ONE core (the AQE/
      // 1-partition trap — measured 9.9 s warm on q_ts_discord)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("pos"))
    val b = sub.select(col("pos").as("j"), col("sub").as("sb"))
    // calendar-bounded self-pairing: both sides ≤ ~2.4k rows at ANY
    // fact volume (the spine is days, not orders) — broadcast is the
    // correct plan at 100 TB too
    sub.crossJoin(broadcast(b))
      .where(abs(col("pos") - col("j")) >= 4)
      .select(col("pos"), col("j"), expr(
        """aggregate(zip_with(sub, sb, (x, y) -> (x - y) * (x - y)),
             CAST(0 AS BIGINT), (s, v) -> s + v)""").as("d2"))
      .groupBy(col("pos"))
      .agg(min(struct(col("d2"), col("j"))).as("m"))
      .select(col("pos"), col("m.j").as("nn_pos"),
        col("m.d2").as("nn_d2_usd2"))
  }

  private val MprofSql =
    """daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) // 100 AS BIGINT) AS v_cents
             FROM orders GROUP BY 1),
       sub0 AS (SELECT row_number() OVER (ORDER BY dt) AS pos,
                  list(v_cents) OVER (ORDER BY dt
                    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS sub
                FROM daily),
       sub AS MATERIALIZED (SELECT pos, sub FROM sub0 WHERE len(sub) = 7),
       prof AS MATERIALIZED (
         SELECT pos, nn_pos, nn_d2_usd2 FROM (
           SELECT a.pos, b.pos AS nn_pos,
             CAST(list_sum(list_transform([1, 2, 3, 4, 5, 6, 7],
               i -> (a.sub[i] - b.sub[i]) * (a.sub[i] - b.sub[i])))
               AS BIGINT) AS nn_d2_usd2,
             row_number() OVER (PARTITION BY a.pos
               ORDER BY CAST(list_sum(list_transform([1, 2, 3, 4, 5, 6, 7],
                 i -> (a.sub[i] - b.sub[i]) * (a.sub[i] - b.sub[i])))
                 AS BIGINT), b.pos) AS rn
           FROM sub a JOIN sub b ON abs(a.pos - b.pos) >= 4) t
         WHERE rn = 1)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MATRIX PROFILE over the daily-revenue series (subsequence
    // length 7, exclusion zone 4): per position, the nearest other
    // 7-day window by exact squared whole-dollar distance — the standard
    // motif/novelty primitive (UCR matrix profile, public).
    "q_ts_matrix_profile" -> ((s, d) =>
      mprofile(s, d).orderBy(col("pos"))),

    // DISCORDS: the 3 positions whose NEAREST neighbor is farthest —
    // the classic anomaly readout off the same profile.
    "q_ts_discord" -> ((s, d) =>
      mprofile(s, d)
        .withColumn("rank", row_number().over(Window.orderBy(
          col("nn_d2_usd2").desc, col("pos"))).cast("long"))
        .where(col("rank") <= 3)
        .select(col("rank"), col("pos"), col("nn_pos"),
          col("nn_d2_usd2"))
        .orderBy(col("rank"))),

    // QINI / UPLIFT CURVE: users split by the stable user_id % 2 arm
    // (the q_evt_ab_test convention; arm 1 = treatment), outcome =
    // ever-purchased, targeting score = click count. Users ranked by
    // (score DESC, user_id) into deciles; per decile prefix, qini =
    // cumXt − cumXc · cumNt/cumNc (exact counts, one IEEE tree).
    "q_ml_qini" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("converted"),
          sum(when(col("event_type") === "click", 1L)
            .otherwise(0L)).as("score"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
      val dec10 = users.withColumn("decile",
        ntile(10).over(Window.orderBy(col("score").desc,
          col("user_id"))).cast("long"))
      val per = dec10.groupBy(col("decile"))
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("arm") === 1, col("converted"))
            .otherwise(0L)).as("xt"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("arm") === 0, col("converted"))
            .otherwise(0L)).as("xc"))
      val cw = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per
        .select(col("decile"), col("nt"), col("xt"), col("nc"),
          col("xc"),
          sum(col("nt")).over(cw).as("cnt"),
          sum(col("xt")).over(cw).as("cxt"),
          sum(col("nc")).over(cw).as("cnc"),
          sum(col("xc")).over(cw).as("cxc"))
        .select(col("decile"), col("nt"), col("xt"), col("nc"),
          col("xc"),
          when(col("cnc") > 0,
            r6(col("cxt").cast("double")
              - col("cxc").cast("double") * col("cnt").cast("double")
                / col("cnc").cast("double"))).as("qini"))
        .orderBy(col("decile"))
    }),

    // 2-VARIABLE PCA, closed form: covariance eigenvalues of
    // (l_quantity, l_discount·100) — units chosen so every moment sum
    // stays an exact BIGINT < 2^53 (quantity ≤ 50, discount-bp ≤ 10:
    // n·Sxx peaks ~9e14 at sf0.1) and the BIGINT→DOUBLE casts are
    // exact on both engines. λ = (a+c)/2 ± sqrt(((a−c)/2)² + b²) as
    // ONE shared IEEE tree.
    "q_agg_pca2" -> ((s, d) => {
      val x = dec(col("l_quantity")).cast("long")
      val y = (dec(col("l_discount")) * 100).cast("long")
      val m = Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"),
        sum(y * y).as("syy"))
      val n = col("n").cast("double")
      val a = (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double") / (n * n)
      val b = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") / (n * n)
      val c = (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double") / (n * n)
      val half = (a + c) / lit(2.0)
      val disc = sqrt((a - c) / lit(2.0) * ((a - c) / lit(2.0)) + b * b)
      m.select(col("n"),
        r6(half + disc).as("lambda1"),
        r6(half - disc).as("lambda2"),
        r6((half + disc) / (a + c)).as("explained1"))
    }),

    // TEMPERATURE-SCALED MIXTURE WEIGHTS (T = 2): w_i ∝ p_i^(1/T) =
    // sqrt(n_i) — the standard multi-source LLM sampling rule
    // flattening toward small sources. sqrt is correctly rounded on
    // both engines; per-source sqrt micros are quantized BEFORE the
    // cross-row sum (playbook rule 1), the weight is one division.
    "q_llm_mix_temperature" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("sq_micro",
          (round(sqrt(col("n").cast("double")), 6)
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))
            * 1000000).cast("long"))
      val tot = per.agg(sum(col("sq_micro")).as("t"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          r6(col("sq_micro").cast("double") / col("t").cast("double"))
            .as("w_temp"))
        .orderBy(col("source"))
    }),

    // FIXED-WEIGHT QUALITY LOGIT (a fastText-style linear quality
    // filter with published constant weights): per-doc features on
    // the shared single-space tokenization (words/avg-len/stopword
    // ratio), logit = one shared IEEE tree, 6-dp-quantized to micros
    // per ROW before the per-(source, verdict) exact aggregation.
    "q_llm_quality_logit" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val wc = size(ws).cast("double")
      val stopr = size(filter(ws, w => w === "the" || w === "and"
        || w === "of")).cast("double") / wc
      val awl = length(regexp_replace(col("text"), " ", ""))
        .cast("double") / wc
      val logit = lit(-1.5) + lit(0.02) * wc + lit(4.0) * stopr -
        lit(0.2) * awl
      Tables.documents(s, d)
        .select(col("source"),
          (round(logit, 6)
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))
            * 1000000).cast("long").as("lq"))
        .withColumn("verdict",
          when(col("lq") >= 0, lit("keep")).otherwise(lit("drop")))
        .groupBy(col("source"), col("verdict"))
        .agg(count(lit(1)).as("n"), sum(col("lq")).as("sum_lq"))
        .select(col("source"), col("verdict"), col("n"),
          r6(col("sum_lq").cast("double")
            / (col("n").cast("double") * lit(1e6))).as("mean_logit"))
        .orderBy(col("source"), col("verdict"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_matrix_profile" ->
      s"""WITH $MprofSql
          SELECT pos, nn_pos, nn_d2_usd2 FROM prof ORDER BY pos""",

    "q_ts_discord" ->
      s"""WITH $MprofSql
          SELECT rank, pos, nn_pos, nn_d2_usd2 FROM (
            SELECT CAST(row_number() OVER (
                ORDER BY nn_d2_usd2 DESC, pos) AS BIGINT) AS rank,
              pos, nn_pos, nn_d2_usd2
            FROM prof) t
          WHERE rank <= 3 ORDER BY rank""",

    "q_ml_qini" ->
      """WITH u AS (SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 AS score,
               user_id % 2 AS arm
             FROM events GROUP BY user_id),
            dec10 AS (SELECT *, CAST(ntile(10) OVER (
                ORDER BY score DESC, user_id) AS BIGINT) AS decile
              FROM u),
            per AS (SELECT decile,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS nt,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                 AS BIGINT) AS xt,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS nc,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                 AS BIGINT) AS xc
             FROM dec10 GROUP BY decile),
            cum AS (SELECT decile, nt, xt, nc, xc,
               SUM(nt) OVER w AS cnt, SUM(xt) OVER w AS cxt,
               SUM(nc) OVER w AS cnc, SUM(xc) OVER w AS cxc
             FROM per WINDOW w AS (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT decile, nt, xt, nc, xc,
                CASE WHEN cnc > 0 THEN
                  round(CAST(cxt AS DOUBLE)
                    - CAST(cxc AS DOUBLE) * CAST(cnt AS DOUBLE)
                      / CAST(cnc AS DOUBLE), 6)
                END AS qini
         FROM cum ORDER BY decile""",

    "q_agg_pca2" ->
      """WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(y * y) AS BIGINT) AS syy
             FROM (SELECT
                     CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)
                       AS x,
                     CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS y
                   FROM lineitem)),
            e AS (SELECT n,
               CAST(n * sxx - sx * sx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS a,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS b,
               CAST(n * syy - sy * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS c
             FROM m)
         SELECT n,
                round((a + c) / 2.0
                  + sqrt((a - c) / 2.0 * ((a - c) / 2.0) + b * b), 6)
                  AS lambda1,
                round((a + c) / 2.0
                  - sqrt((a - c) / 2.0 * ((a - c) / 2.0) + b * b), 6)
                  AS lambda2,
                round(((a + c) / 2.0
                  + sqrt((a - c) / 2.0 * ((a - c) / 2.0) + b * b))
                  / (a + c), 6) AS explained1
         FROM e""",

    "q_llm_mix_temperature" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(round(sqrt(CAST(COUNT(*) AS DOUBLE)), 6)
                 AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS sq_micro
             FROM documents GROUP BY source),
            tot AS (SELECT CAST(SUM(sq_micro) AS BIGINT) AS t FROM per)
         SELECT source, n,
                round(CAST(sq_micro AS DOUBLE) / CAST(t AS DOUBLE), 6)
                  AS w_temp
         FROM per, tot ORDER BY source""",

    "q_llm_quality_logit" ->
      """WITH f AS (SELECT source,
               CAST(CAST(round(-1.5
                 + 0.02 * CAST(len(string_split(text, ' ')) AS DOUBLE)
                 + 4.0 * (CAST(len(list_filter(string_split(text, ' '),
                     w -> w = 'the' OR w = 'and' OR w = 'of'))
                     AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE))
                 - 0.2 * (CAST(length(replace(text, ' ', ''))
                     AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE)), 6)
                 AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lq
             FROM documents)
         SELECT source,
                CASE WHEN lq >= 0 THEN 'keep' ELSE 'drop' END
                  AS verdict,
                CAST(COUNT(*) AS BIGINT) AS n,
                round(CAST(SUM(lq) AS DOUBLE)
                  / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_logit
         FROM f GROUP BY 1, 2 ORDER BY source, verdict"""
  )
}
