package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-12 additions, part 9: the F1 threshold sweep and the
  * calibration/ECE table (rounding out the Extras108 classifier-eval
  * family over the same discount-score / return-label pair), a
  * character-class corpus profile (the byte-level text-quality
  * signal), and price-volume-mix decomposition of month-over-month
  * revenue (the finance-analytics staple).
  *
  * Scale shape: both ml keys fold the fact table once into the
  * ≤11-value discount spine and walk thresholds there; charclass is
  * one codegen'd regex projection + bounded agg; price_volume folds
  * to the calendar month spine then one lag window.
  *
  * Determinism contract (SURVEY §2.13): all counts exact integers;
  * F1/precision/recall/pred/obs/effects are shared IEEE chains over
  * exact integers; ECE terms and PVM effects are nano-quantized
  * before their bounded sums.
  */
object Extras145 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F1 THRESHOLD SWEEP — predict positive when discount-bp ≥ t for
    // every distinct t; exact confusion counts and F1 per threshold.
    "q_ml_f1_sweep" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select((dec(col("l_discount")) * 100).cast("long").as("v"),
          (col("l_returnflag") === "R").cast("long").as("y"))
      val per = base.groupBy(col("v"))
        .agg(sum(col("y")).as("c1"), sum(lit(1) - col("y")).as("c0"))
      val wAll = Window.partitionBy(lit(1))
      val wGe = Window.orderBy(col("v").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sw = per
        .withColumn("tp", sum(col("c1")).over(wGe))
        .withColumn("fp", sum(col("c0")).over(wGe))
        .withColumn("pos", sum(col("c1")).over(wAll))
      sw.select(col("v").as("threshold_bp"), col("tp"), col("fp"),
          (col("pos") - col("tp")).as("fn"),
          r6(lit(2.0) * col("tp").cast("double")
            / (lit(2.0) * col("tp").cast("double")
              + col("fp").cast("double")
              + (col("pos") - col("tp")).cast("double"))).as("f1"))
        .orderBy("threshold_bp")
    }),

    // CALIBRATION + ECE — per discount bin, predicted probability
    // v/10 vs the observed return rate; expected calibration error
    // as the count-weighted absolute gap.
    "q_ml_calibration" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select((dec(col("l_discount")) * 100).cast("long").as("v"),
          (col("l_returnflag") === "R").cast("long").as("y"))
      val per = base.groupBy(col("v"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("c1"))
      val pred = col("v").cast("double") / lit(10.0)
      val obs = col("c1").cast("double") / col("n").cast("double")
      val wAll = Window.partitionBy(lit(1))
      per
        .withColumn("gap_nano",
          round(abs(pred - obs) * 1e9).cast("long"))
        .withColumn("ece", r6(
          sum(col("gap_nano") * col("n")).over(wAll).cast("double")
            / 1e9 / sum(col("n")).over(wAll).cast("double")))
        .select(col("v").as("bin_bp"), col("n"), col("c1"),
          r6(pred).as("pred"), r6(obs).as("obs"),
          r6(col("gap_nano").cast("double") / 1e9).as("gap"),
          col("ece"))
        .orderBy("bin_bp")
    }),

    // CHARACTER-CLASS PROFILE — corpus totals of letters / digits /
    // spaces / other via regex-strip length deltas, with shares.
    "q_llm_charclass" -> ((s, d) => {
      val t = Tables.documents(s, d).select(
        length(col("text")).cast("long").as("len"),
        (length(col("text")) - length(regexp_replace(col("text"),
          "[a-zA-Z]", ""))).cast("long").as("alpha"),
        (length(col("text")) - length(regexp_replace(col("text"),
          "[0-9]", ""))).cast("long").as("digit"),
        (length(col("text")) - length(regexp_replace(col("text"),
          " ", ""))).cast("long").as("space"))
      t.agg(sum(col("len")).as("chars"), sum(col("alpha")).as("alpha"),
          sum(col("digit")).as("digits"), sum(col("space")).as("spaces"))
        .select(col("chars"), col("alpha"), col("digits"), col("spaces"),
          (col("chars") - col("alpha") - col("digits") - col("spaces"))
            .as("other"),
          r6(col("alpha").cast("double") / col("chars").cast("double"))
            .as("alpha_share"))
    }),

    // PRICE-VOLUME-MIX — Laspeyres decomposition of month-over-month
    // revenue change: volume effect (Δqty at prior price) and price
    // effect (Δprice at current qty); the two sum to Δrevenue by
    // construction.
    "q_agg_price_volume" -> ((s, d) => {
      val monthly = Tables.lineitem(s, d)
        .groupBy(trunc(to_date(col("l_shipdate")), "month").as("ym"))
        .agg(sum(col("l_quantity").cast("long")).as("q"),
          sum((dec(col("l_extendedprice")) * 100).cast("long")).as("c"))
      val w = Window.orderBy(col("ym"))
      val lagd = monthly
        .withColumn("q1", lag(col("q"), 1).over(w))
        .withColumn("c1", lag(col("c"), 1).over(w))
        .where(col("q1").isNotNull)
      val p1 = col("c1").cast("double") / col("q1").cast("double")
      val p2 = col("c").cast("double") / col("q").cast("double")
      lagd.select(col("ym"),
          (col("c") - col("c1")).as("delta_cents"),
          r6((col("q") - col("q1")).cast("double") * p1 / 100.0)
            .as("volume_effect_usd"),
          r6((p2 - p1) * col("q").cast("double") / 100.0)
            .as("price_effect_usd"))
        .orderBy("ym")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ml_f1_sweep" ->
      """WITH base AS (SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS v,
                    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                 FROM lineitem WHERE l_returnflag IN ('R', 'N')),
            per AS (SELECT v, CAST(SUM(y) AS BIGINT) AS c1,
                    CAST(SUM(1 - y) AS BIGINT) AS c0
                  FROM base GROUP BY 1),
            sw AS (SELECT v,
                    CAST(SUM(c1) OVER (ORDER BY v DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS tp,
                    CAST(SUM(c0) OVER (ORDER BY v DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS fp,
                    CAST(SUM(c1) OVER () AS BIGINT) AS pos
                  FROM per)
         SELECT v AS threshold_bp, tp, fp, pos - tp AS fn,
                round(2.0 * CAST(tp AS DOUBLE)
                  / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
                    + CAST(pos - tp AS DOUBLE)), 6) AS f1
         FROM sw ORDER BY threshold_bp""",

    "q_ml_calibration" ->
      """WITH base AS (SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS v,
                    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                 FROM lineitem WHERE l_returnflag IN ('R', 'N')),
            per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS c1
                  FROM base GROUP BY 1),
            g AS (SELECT v, n, c1,
                    CAST(round(abs(CAST(v AS DOUBLE) / 10.0
                      - CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9)
                      AS BIGINT) AS gap_nano
                  FROM per)
         SELECT v AS bin_bp, n, c1,
                round(CAST(v AS DOUBLE) / 10.0, 6) AS pred,
                round(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs,
                round(CAST(gap_nano AS DOUBLE) / 1e9, 6) AS gap,
                round(CAST(SUM(gap_nano * n) OVER () AS DOUBLE) / 1e9
                  / CAST(SUM(n) OVER () AS DOUBLE), 6) AS ece
         FROM g ORDER BY bin_bp""",

    "q_llm_charclass" ->
      """WITH t AS (SELECT CAST(length(text) AS BIGINT) AS len,
                    CAST(length(text) - length(regexp_replace(text,
                      '[a-zA-Z]', '', 'g')) AS BIGINT) AS alpha,
                    CAST(length(text) - length(regexp_replace(text,
                      '[0-9]', '', 'g')) AS BIGINT) AS digit,
                    CAST(length(text) - length(replace(text, ' ', ''))
                      AS BIGINT) AS space
                 FROM documents),
            a AS (SELECT CAST(SUM(len) AS BIGINT) AS chars,
                    CAST(SUM(alpha) AS BIGINT) AS alpha,
                    CAST(SUM(digit) AS BIGINT) AS digits,
                    CAST(SUM(space) AS BIGINT) AS spaces
                  FROM t)
         SELECT chars, alpha, digits, spaces,
                chars - alpha - digits - spaces AS other,
                round(CAST(alpha AS DOUBLE) / CAST(chars AS DOUBLE), 6)
                  AS alpha_share
         FROM a""",

    "q_agg_price_volume" ->
      """WITH monthly AS (SELECT date_trunc('month',
                      CAST(l_shipdate AS DATE)) AS ym,
                    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
                    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * 100 AS BIGINT)) AS BIGINT) AS c
                 FROM lineitem GROUP BY 1),
            lagd AS (SELECT ym, q, c,
                    lag(q, 1) OVER (ORDER BY ym) AS q1,
                    lag(c, 1) OVER (ORDER BY ym) AS c1
                  FROM monthly)
         SELECT ym, c - c1 AS delta_cents,
                round(CAST(q - q1 AS DOUBLE)
                  * (CAST(c1 AS DOUBLE) / CAST(q1 AS DOUBLE)) / 100.0, 6)
                  AS volume_effect_usd,
                round((CAST(c AS DOUBLE) / CAST(q AS DOUBLE)
                    - CAST(c1 AS DOUBLE) / CAST(q1 AS DOUBLE))
                  * CAST(q AS DOUBLE) / 100.0, 6) AS price_effect_usd
         FROM lagd WHERE q1 IS NOT NULL ORDER BY ym"""
  )
}
