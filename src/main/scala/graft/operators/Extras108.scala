package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 34: model-evaluation round-out — the
  * binary-classifier metric family over the discount-score /
  * return-label pair: confusion matrix with P/R/F1, exact tie-aware
  * ROC AUC (midrank form), average precision (PR-AUC), the KS score
  * separation, and the Brier score of the per-bin empirical
  * predictor.
  *
  * Scale shape: every metric folds the fact table once into the
  * ≤11-value discount spine (score quantized to basis points) and
  * does all curve walking there — no per-row sorting, no quadratic
  * threshold sweep.
  *
  * Determinism contract (SURVEY §2.13): midranks are carried doubled
  * (exact integers, the Extras98 discipline); ECDF gaps and the AUC
  * numerator are exact DECIMAL(38,0); the AP and Brier per-term
  * rationals are nano-quantized before their bounded folds.
  */
object Extras108 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Discount-bp spine with positive (R) / negative (N) counts and
    * cumulative-before counts. */
  private def spine(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .where(col("l_returnflag").isin("R", "N"))
      .select((dec(col("l_discount")) * 100).cast("long").as("v"),
        (col("l_returnflag") === "R").cast("long").as("p"))
    val per = base.groupBy(col("v"))
      .agg(sum(col("p")).as("c1"), sum(lit(1) - col("p")).as("c0"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cb1", sum(col("c1")).over(w) - col("c1"))
      .withColumn("cb0", sum(col("c0")).over(w) - col("c0"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CONFUSION MATRIX — predict "returned" when discount ≥ 6 bp:
    // TP/FP/FN/TN exact counts; precision/recall/F1 one IEEE chain.
    "q_ml_confusion" -> ((s, d) => {
      val m = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select(((dec(col("l_discount")) * 100).cast("long") >= 6)
          .cast("long").as("yh"),
          (col("l_returnflag") === "R").cast("long").as("y"))
        .agg(sum(col("yh") * col("y")).as("tp"),
          sum(col("yh") * (lit(1) - col("y"))).as("fp"),
          sum((lit(1) - col("yh")) * col("y")).as("fn"),
          sum((lit(1) - col("yh")) * (lit(1) - col("y"))).as("tn"))
      val prec = col("tp").cast("double") /
        (col("tp") + col("fp")).cast("double")
      val rec = col("tp").cast("double") /
        (col("tp") + col("fn")).cast("double")
      m.select(col("tp"), col("fp"), col("fn"), col("tn"),
        r6(prec).as("precision"), r6(rec).as("recall"),
        r6(prec * rec * 2 / (prec + rec)).as("f1"))
    }),

    // ROC AUC (tie-aware, exact) — midrank form of the Mann-Whitney
    // identity: AUC = (Σ_pos midrank − n₁(n₁+1)/2)/(n₁n₀), with
    // doubled midranks m₂ = 2·cb + c + 1 kept integer.
    "q_ml_roc_auc" -> ((s, d) => {
      val sp = spine(s, d)
        .withColumn("m2",
          lit(2) * (col("cb1") + col("cb0")) + col("c1") + col("c0") + 1)
      val m = sp.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
        sum(col("c1").cast(Big) * col("m2").cast(Big)).as("t1"))
      val n1 = col("n1").cast(Big)
      val num = (col("t1") - n1 * (col("n1") + 1).cast(Big)).cast("double")
      m.select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        r6(num / 2 /
          (n1 * col("n0").cast(Big)).cast("double")).as("roc_auc"))
    }),

    // AVERAGE PRECISION (PR-AUC, step interpolation) — thresholds
    // descend the discount spine; AP = Σ_t Δrecall·precision(t), each
    // term nano-quantized.
    "q_ml_ap" -> ((s, d) => {
      val tot = spine(s, d).agg(sum(col("c1")).as("p1"),
        sum(col("c0")).as("p0"))
      val sp = spine(s, d).crossJoin(broadcast(tot))
        .withColumn("tp", col("p1") - col("cb1"))
        .withColumn("fp", col("p0") - col("cb0"))
      val term = round(col("c1").cast("double") / col("p1").cast("double") *
        (col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double")) * 1e9).cast("long")
      sp.select(term.as("t_nano"))
        .agg(sum(col("t_nano")).as("sn"))
        .select(r6(col("sn").cast("double") / 1e9).as("avg_precision"))
    }),

    // KS SEPARATION — max ECDF gap between positive and negative
    // score distributions: the integer numerator max |C₁n₀ − C₀n₁|
    // over the spine, one final division.
    "q_ml_ks_separation" -> ((s, d) => {
      val tot = spine(s, d).agg(sum(col("c1")).as("p1"),
        sum(col("c0")).as("p0"))
      val sp = spine(s, d).crossJoin(broadcast(tot))
        .select(col("p1"), col("p0"),
          abs((col("cb1") + col("c1")).cast(Big) * col("p0").cast(Big)
            - (col("cb0") + col("c0")).cast(Big) * col("p1").cast(Big))
            .as("gap"))
      sp.groupBy(col("p1"), col("p0"))
        .agg(max(col("gap")).as("mg"))
        .select(col("p1").as("n_pos"), col("p0").as("n_neg"),
          r6(col("mg").cast("double") /
            (col("p1").cast(Big) * col("p0").cast(Big)).cast("double"))
            .as("ks_stat"))
    }),

    // BRIER SCORE — the in-sample per-bin empirical predictor
    // p_v = c₁(v)/c(v): Brier = Σ_v [c₁(1−p_v)² + c₀p_v²]/N, per-bin
    // terms nano-quantized.
    "q_ml_brier" -> ((s, d) => {
      val pv = col("c1").cast("double") /
        (col("c1") + col("c0")).cast("double")
      val term = round((col("c1").cast("double") * (lit(1.0) - pv) *
        (lit(1.0) - pv) + col("c0").cast("double") * pv * pv) * 1e9)
        .cast("long")
      spine(s, d).select(term.as("t_nano"),
          (col("c1") + col("c0")).as("c"))
        .agg(sum(col("t_nano")).as("sn"), sum(col("c")).as("n"))
        .select(col("n").as("n_rows"),
          r6(col("sn").cast("double") / 1e9 / col("n").cast("double"))
            .as("brier"))
    })
  )

  private val spineSql =
    """per AS (SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS v,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
                CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c0
           FROM lineitem WHERE l_returnflag IN ('R', 'N')
          GROUP BY 1),
       sp AS (SELECT v, c1, c0,
                CAST(SUM(c1) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - c1 AS BIGINT) AS cb1,
                CAST(SUM(c0) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - c0 AS BIGINT) AS cb0
              FROM per)"""

  val oracle: Map[String, String] = Map(

    "q_ml_confusion" ->
      """WITH m AS (SELECT
                    CAST(SUM(yh * y) AS BIGINT) AS tp,
                    CAST(SUM(yh * (1 - y)) AS BIGINT) AS fp,
                    CAST(SUM((1 - yh) * y) AS BIGINT) AS fn,
                    CAST(SUM((1 - yh) * (1 - y)) AS BIGINT) AS tn
                  FROM (SELECT CASE WHEN CAST(CAST(l_discount
                            AS DECIMAL(18,2)) * 100 AS BIGINT) >= 6
                          THEN 1 ELSE 0 END AS yh,
                          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                            AS y
                        FROM lineitem WHERE l_returnflag IN ('R', 'N'))),
            e AS (SELECT tp, fp, fn, tn,
                    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS prec,
                    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS rec
                  FROM m)
         SELECT tp, fp, fn, tn, round(prec, 6) AS precision,
                round(rec, 6) AS recall,
                round(prec * rec * 2 / (prec + rec), 6) AS f1
         FROM e""",

    "q_ml_roc_auc" ->
      s"""WITH $spineSql,
            rk AS (SELECT c1, c0,
                     2 * (cb1 + cb0) + c1 + c0 + 1 AS m2
                   FROM sp),
            m AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                    CAST(SUM(c0) AS BIGINT) AS n0,
                    SUM(CAST(c1 AS HUGEINT) * CAST(m2 AS HUGEINT)) AS t1
                  FROM rk)
         SELECT n1 AS n_pos, n0 AS n_neg,
                round(CAST(t1 - CAST(n1 AS HUGEINT)
                    * CAST(n1 + 1 AS HUGEINT) AS DOUBLE) / 2
                  / CAST(CAST(n1 AS HUGEINT) * CAST(n0 AS HUGEINT)
                    AS DOUBLE), 6) AS roc_auc
         FROM m""",

    "q_ml_ap" ->
      s"""WITH $spineSql,
            t AS (SELECT CAST(SUM(c1) AS BIGINT) AS p1,
                    CAST(SUM(c0) AS BIGINT) AS p0 FROM sp),
            q AS (SELECT
                    CAST(round(CAST(c1 AS DOUBLE) / CAST(p1 AS DOUBLE)
                      * (CAST(p1 - cb1 AS DOUBLE)
                        / CAST((p1 - cb1) + (p0 - cb0) AS DOUBLE))
                      * 1e9) AS BIGINT) AS t_nano
                  FROM sp, t)
         SELECT round(CAST(SUM(t_nano) AS DOUBLE) / 1e9, 6)
                  AS avg_precision
         FROM q""",

    "q_ml_ks_separation" ->
      s"""WITH $spineSql,
            t AS (SELECT CAST(SUM(c1) AS BIGINT) AS p1,
                    CAST(SUM(c0) AS BIGINT) AS p0 FROM sp),
            g AS (SELECT p1, p0,
                    abs(CAST(cb1 + c1 AS HUGEINT) * CAST(p0 AS HUGEINT)
                      - CAST(cb0 + c0 AS HUGEINT) * CAST(p1 AS HUGEINT))
                      AS gap
                  FROM sp, t)
         SELECT p1 AS n_pos, p0 AS n_neg,
                round(CAST(MAX(gap) AS DOUBLE)
                  / CAST(CAST(p1 AS HUGEINT) * CAST(p0 AS HUGEINT)
                    AS DOUBLE), 6) AS ks_stat
         FROM g GROUP BY 1, 2""",

    "q_ml_brier" ->
      s"""WITH $spineSql,
            q AS (SELECT c1 + c0 AS c,
                    CAST(round((CAST(c1 AS DOUBLE)
                      * (1.0 - CAST(c1 AS DOUBLE)
                        / CAST(c1 + c0 AS DOUBLE))
                      * (1.0 - CAST(c1 AS DOUBLE)
                        / CAST(c1 + c0 AS DOUBLE))
                      + CAST(c0 AS DOUBLE)
                        * (CAST(c1 AS DOUBLE) / CAST(c1 + c0 AS DOUBLE))
                        * (CAST(c1 AS DOUBLE) / CAST(c1 + c0 AS DOUBLE)))
                      * 1e9) AS BIGINT) AS t_nano
                  FROM sp)
         SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                round(CAST(SUM(t_nano) AS DOUBLE) / 1e9
                  / CAST(SUM(c) AS DOUBLE), 6) AS brier
         FROM q"""
  )
}
