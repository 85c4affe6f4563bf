package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 19: temporal-shape round-out —
  * inter-purchase regularity segmentation (CV buckets decided by
  * exact cross-multiplied integer gates, no IEEE compare), 28-day
  * rolling skewness of daily revenue from exact windowed moments,
  * and maximum-drawdown duration via underwater islands.
  *
  * Determinism contract (SURVEY §2.13): the CV bucket gates
  * cross-multiply exact integers ((nΣg²−S²)·c² vs c'·S²); the rolling
  * third moment folds y³ in DECIMAL(38,0) per row; skew is one
  * fixed-shape chain per spine row; drawdown islands are integer
  * date arithmetic on the calendar spine.
  */
object Extras93 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // INTER-PURCHASE CV SEGMENTATION — per user with ≥3 purchases:
    // gap seconds between consecutive purchases; CV² = (nΣg²−S²)/S²
    // (population). Buckets: [0,.5), [.5,1), [1,1.5), ≥1.5 via the
    // cross-multiplied exact gates 4·T < S², T < S², 4·T < 9·S²
    // where T = nΣg²−S² — the bucket decision never touches a double.
    "q_evt_interpurchase_cv" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      val gaps = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), tsUs(col("ts")).as("us"))
        .withColumn("gap",
          expr("(us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us))"
            + " div 1000000"))
        .where(col("gap").isNotNull)
      val per = gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("gap")).as("sg"),
          sum(col("gap").cast(Big) * col("gap").cast(Big)).as("sgg"))
        .where(col("n") >= 2)
      val t = (col("n").cast(Big) * col("sgg")
        - col("sg").cast(Big) * col("sg").cast(Big))
      val s2 = col("sg").cast(Big) * col("sg").cast(Big)
      val bucket = when(t * 4 < s2, "cv_lt_0_5")
        .when(t < s2, "cv_0_5_to_1")
        .when(t * 4 < s2 * 9, "cv_1_to_1_5")
        .otherwise("cv_ge_1_5")
      per.select(bucket.as("bucket"), col("n"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_gaps"))
        .orderBy(col("bucket"))
    }),

    // ROLLING SKEWNESS — 28-day frame over daily revenue: exact
    // windowed Σy, Σy², Σy³ (y³ rides DECIMAL(38,0) per row);
    // g1 = √n·(T3/n²)/(t√t), t = T2/n, T3 = n²Σy³−3nSΣy²+2S³,
    // T2 = nΣy²−S² — one chain per emitted day.
    "q_win_skew_rolling" -> ((s, d) => {
      val wf = Window.orderBy(col("dt")).rowsBetween(-27, 0)
      val wn = Window.orderBy(col("dt"))
      val base = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("rn", row_number().over(wn))
        .withColumn("m", count(lit(1)).over(wf))
        .withColumn("s1", sum(col("y")).over(wf))
        .withColumn("s2", sum(col("y").cast(Big) * col("y").cast(Big))
          .over(wf))
        .withColumn("s3", sum(col("y").cast(Big) * col("y").cast(Big)
          * col("y").cast(Big)).over(wf))
        .where(col("rn") >= 28)
      val nD = col("m").cast("double")
      val t2 = (col("m").cast(Big) * col("s2")
        - col("s1").cast(Big) * col("s1").cast(Big)).cast("double")
      val t3 = (col("m").cast(Big) * col("m").cast(Big) * col("s3")
        - col("m").cast(Big) * col("s1").cast(Big) * col("s2") * 3
        + col("s1").cast(Big) * col("s1").cast(Big)
          * col("s1").cast(Big) * 2).cast("double")
      val t = t2 / nD
      base.select(col("dt"),
          r6(sqrt(nD) * (t3 / (nD * nD)) / (t * sqrt(t))).as("skew28"))
        .orderBy(col("dt"))
    }),

    // MAX DRAWDOWN DURATION — longest underwater stretch of the daily
    // cumulative-revenue running max: islands of y < cummax(y) via the
    // rn − rn-within-flag trick; longest island with its start/end
    // days (earliest on ties).
    "q_ts_drawdown_duration" -> ((s, d) => {
      val wn = Window.orderBy(col("dt"))
      val base = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("peak", max(col("y")).over(
          wn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("under", (col("y") < col("peak")).cast("int"))
        .withColumn("rn", row_number().over(wn))
      val runs = base.where(col("under") === 1)
        .withColumn("grp", col("rn") - row_number().over(
          Window.orderBy(col("rn"))))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("duration_days"),
          min(col("dt")).as("start_dt"), max(col("dt")).as("end_dt"))
      runs
        .withColumn("rk", row_number().over(
          Window.orderBy(col("duration_days").desc, col("start_dt"))))
        .where(col("rk") === 1)
        .select(col("duration_days"), col("start_dt"), col("end_dt"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_interpurchase_cv" ->
      """WITH p AS (SELECT user_id,
                    epoch_us(CAST(ts AS TIMESTAMP)) AS us
                 FROM events WHERE event_type = 'purchase'),
            gaps AS (SELECT user_id,
                       (us - lag(us, 1) OVER (PARTITION BY user_id
                          ORDER BY us)) // 1000000 AS gap
                     FROM p),
            per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(gap) AS BIGINT) AS sg,
                      SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT))
                        AS sgg
                    FROM gaps WHERE gap IS NOT NULL
                    GROUP BY 1 HAVING COUNT(*) >= 2),
            b AS (SELECT n,
                    CASE
                      WHEN (CAST(n AS HUGEINT) * sgg - CAST(sg AS HUGEINT)
                          * CAST(sg AS HUGEINT)) * 4
                        < CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT)
                        THEN 'cv_lt_0_5'
                      WHEN CAST(n AS HUGEINT) * sgg - CAST(sg AS HUGEINT)
                          * CAST(sg AS HUGEINT)
                        < CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT)
                        THEN 'cv_0_5_to_1'
                      WHEN (CAST(n AS HUGEINT) * sgg - CAST(sg AS HUGEINT)
                          * CAST(sg AS HUGEINT)) * 4
                        < CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT) * 9
                        THEN 'cv_1_to_1_5'
                      ELSE 'cv_ge_1_5' END AS bucket
                  FROM per)
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(n) AS BIGINT) AS n_gaps
         FROM b GROUP BY 1 ORDER BY 1""",

    "q_win_skew_rolling" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            win AS (SELECT dt,
                      row_number() OVER (ORDER BY dt) AS rn,
                      CAST(COUNT(*) OVER w AS BIGINT) AS m,
                      CAST(SUM(y) OVER w AS BIGINT) AS s1,
                      SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) OVER w
                        AS s2,
                      SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)
                        * CAST(y AS HUGEINT)) OVER w AS s3
                    FROM daily
                    WINDOW w AS (ORDER BY dt ROWS BETWEEN 27 PRECEDING
                      AND CURRENT ROW)),
            e AS (SELECT dt, m, s1, s2, s3,
                    CAST(CAST(m AS HUGEINT) * s2 - CAST(s1 AS HUGEINT)
                      * CAST(s1 AS HUGEINT) AS DOUBLE) AS t2,
                    CAST(CAST(m AS HUGEINT) * CAST(m AS HUGEINT) * s3
                      - CAST(m AS HUGEINT) * CAST(s1 AS HUGEINT) * s2 * 3
                      + CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
                        * CAST(s1 AS HUGEINT) * 2 AS DOUBLE) AS t3
                  FROM win WHERE rn >= 28)
         SELECT dt,
                round(sqrt(CAST(m AS DOUBLE))
                  * (t3 / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
                  / ((t2 / CAST(m AS DOUBLE))
                    * sqrt(t2 / CAST(m AS DOUBLE))), 6) AS skew28
         FROM e ORDER BY dt""",

    "q_ts_drawdown_duration" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            base AS (SELECT dt, y,
                       MAX(y) OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) AS peak,
                       row_number() OVER (ORDER BY dt) AS rn
                     FROM daily),
            runs AS (SELECT grp, CAST(COUNT(*) AS BIGINT)
                       AS duration_days,
                       MIN(dt) AS start_dt, MAX(dt) AS end_dt
                     FROM (SELECT dt, rn - row_number() OVER
                             (ORDER BY rn) AS grp
                           FROM base WHERE y < peak)
                     GROUP BY 1)
         SELECT duration_days, start_dt, end_dt
         FROM (SELECT *, row_number() OVER (ORDER BY duration_days DESC,
                 start_dt) AS rk FROM runs)
         WHERE rk = 1"""
  )
}
