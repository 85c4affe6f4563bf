package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 14: the customer-analytics round-out —
  * RFM quintile segmentation over the events stream, the leave-one-out
  * jackknife variance of the revenue/quantity ratio estimator, and
  * top-k supplier concentration shares.
  *
  * Determinism contract (SURVEY §2.13): every rank/ntile rides a total
  * order (metric, key); the concentration sums are exact integers;
  * the jackknife pseudo-values are micro-quantized
  * (×1e9, the arch_lm log-return discipline) so their moments fold in
  * exact DECIMAL(38,0) space; each final statistic is one fixed-shape
  * IEEE chain over named exact scalars.
  */
object Extras88 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Per-user RFM triple: recency days vs corpus max date, event
    * frequency, exact monetary cents. */
  private def rfm(s: SparkSession, d: String): DataFrame = {
    val glob = Tables.events(s, d).agg(max(to_date(col("ts"))).as("dmax"))
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("dlast"),
        count(lit(1)).as("freq"),
        sum((dec(col("value")) * 100).cast("long")).as("cents"))
      .crossJoin(broadcast(glob))
      .select(col("user_id"), datediff(col("dmax"), col("dlast")).as("rec"),
        col("freq"), col("cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RFM SEGMENTATION — ntile(5) per dimension on a (metric, user)
    // total order (recency DESC so 5 = most recent); output is the
    // occupied (r,f,m) cell grid with exact monetary sums. The windows
    // ride the user-bounded per-user relation, not fact rows.
    "q_evt_rfm" -> ((s, d) => {
      rfm(s, d)
        .withColumn("r_score", ntile(5).over(
          Window.orderBy(col("rec").desc, col("user_id"))).cast("long"))
        .withColumn("f_score", ntile(5).over(
          Window.orderBy(col("freq"), col("user_id"))).cast("long"))
        .withColumn("m_score", ntile(5).over(
          Window.orderBy(col("cents"), col("user_id"))).cast("long"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    }),

    // JACKKNIFE RATIO — leave-one-out variance of the ratio estimator
    // R = Σprice/Σqty over lineitem: the pseudo-value
    // R_(−i) = (Sy−y_i)/(Sx−x_i) is closed-form per row (fully
    // distributed — no resampling pass); micro-quantized ×1e9 (the
    // ratio is ~1.5e5 unit-price cents, so q² ≈ 2e28 keeps Σq² inside
    // DECIMAL(38,0) through sf1) so the moments are exact folds.
    "q_agg_jackknife_ratio" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .select((dec(col("l_extendedprice")) * 100).cast("long").as("y"),
          col("l_quantity").cast("long").as("x"))
      val glob = base.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("x")).as("sx"))
      val q = round(((col("sy") - col("y")).cast("double")
        / (col("sx") - col("x")).cast("double")) * 1e9).cast(Big)
      val a = base.crossJoin(broadcast(glob))
        .select(col("n"), col("sy"), col("sx"), q.as("q"))
        .agg(max(col("n")).as("n"), max(col("sy")).as("sy"),
          max(col("sx")).as("sx"),
          sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sqq"))
      val nD = col("n").cast("double")
      val ratio = col("sy").cast("double") / col("sx").cast("double")
      val mean = col("sq").cast("double") / lit(1e9) / nD
      val varj = (nD - 1) / nD *
        ((col("sqq").cast("double") / lit(1e18)
          - (col("sq").cast("double") / lit(1e9))
            * (col("sq").cast("double") / lit(1e9)) / nD))
      a.select(col("n").as("n_rows"), r6(ratio).as("ratio"),
        r6(nD * ratio - (nD - 1) * mean).as("jack_estimate"),
        r6(sqrt(varj)).as("jack_se"))
    }),

    // TOP-K CONCENTRATION — CR4 / CR8 supplier revenue shares: rank by
    // (revenue DESC, suppkey), exact top-k and total cents, two
    // divisions. The rank window rides the supplier-bounded relation.
    "q_agg_topk_share" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(sum((dec(col("l_extendedprice")) * 100).cast("long")).as("v"))
      val a = per
        .withColumn("rk", row_number().over(
          Window.orderBy(col("v").desc, col("l_suppkey"))))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("tot"),
          sum(when(col("rk") <= 4, col("v")).otherwise(0L)).as("top4"),
          sum(when(col("rk") <= 8, col("v")).otherwise(0L)).as("top8"))
      a.select(col("n").as("n_suppliers"),
        r6(col("top4").cast("double") / col("tot").cast("double"))
          .as("cr4"),
        r6(col("top8").cast("double") / col("tot").cast("double"))
          .as("cr8"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_rfm" ->
      """WITH g AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
            per AS (SELECT user_id,
                      MAX(CAST(ts AS DATE)) AS dlast,
                      CAST(COUNT(*) AS BIGINT) AS freq,
                      CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
                    FROM events GROUP BY 1),
            sc AS (SELECT user_id,
                     (dmax - dlast) AS rec, freq, cents,
                     ntile(5) OVER (ORDER BY (dmax - dlast) DESC, user_id)
                       AS r_score,
                     ntile(5) OVER (ORDER BY freq, user_id) AS f_score,
                     ntile(5) OVER (ORDER BY cents, user_id) AS m_score
                   FROM per, g)
         SELECT r_score, f_score, m_score,
                CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(cents) AS BIGINT) AS cents
         FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_agg_jackknife_ratio" ->
      """WITH base AS (SELECT
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y,
                    CAST(l_quantity AS BIGINT) AS x
                 FROM lineitem),
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    CAST(SUM(x) AS BIGINT) AS sx FROM base),
            q AS (SELECT n, sy, sx,
                    CAST(round((CAST(sy - y AS DOUBLE)
                      / CAST(sx - x AS DOUBLE)) * 1e9) AS HUGEINT) AS q
                  FROM base, g),
            a AS (SELECT MAX(n) AS n, MAX(sy) AS sy, MAX(sx) AS sx,
                    SUM(q) AS sq, SUM(q * q) AS sqq FROM q)
         SELECT n AS n_rows,
                round(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS ratio,
                round(CAST(n AS DOUBLE)
                    * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                  - (CAST(n AS DOUBLE) - 1)
                    * (CAST(sq AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)), 6)
                  AS jack_estimate,
                round(sqrt((CAST(n AS DOUBLE) - 1) / CAST(n AS DOUBLE)
                  * (CAST(sqq AS DOUBLE) / 1e18
                    - (CAST(sq AS DOUBLE) / 1e9)
                      * (CAST(sq AS DOUBLE) / 1e9)
                      / CAST(n AS DOUBLE))), 6) AS jack_se
         FROM a""",

    "q_agg_topk_share" ->
      """WITH per AS (SELECT l_suppkey,
                    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * 100 AS BIGINT)) AS BIGINT) AS v
                 FROM lineitem GROUP BY 1),
            rk AS (SELECT v, row_number() OVER (ORDER BY v DESC, l_suppkey)
                     AS rk FROM per),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(v) AS BIGINT) AS tot,
                    CAST(SUM(CASE WHEN rk <= 4 THEN v ELSE 0 END)
                      AS BIGINT) AS top4,
                    CAST(SUM(CASE WHEN rk <= 8 THEN v ELSE 0 END)
                      AS BIGINT) AS top8
                  FROM rk)
         SELECT n AS n_suppliers,
                round(CAST(top4 AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cr4,
                round(CAST(top8 AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cr8
         FROM a"""
  )
}
