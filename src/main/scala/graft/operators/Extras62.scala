package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 25: the Mann-Kendall trend test.
  *
  * Determinism contract (SURVEY §2.13): S is an exact integer pair
  * fold; the variance is exact integer arithmetic; Z is the one IEEE
  * tail. The pair join is CALENDAR²-bounded (daily spine against
  * itself — constant size at any data volume), not fact-sized.
  */
object Extras62 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MANN-KENDALL — the distribution-free monotone-trend test on
    // daily revenue: S = Σ_{i<j} sign(y_j − y_i), an exact integer
    // over the spine² pair relation; Var(S) = (n(n−1)(2n+5) −
    // Σ_t t(t−1)(2t+5))/18 with the tie term computed exactly from the
    // tied-y group sizes; Z uses the continuity correction. The build
    // side is BROADCAST (the q_ts_theil_sen precedent): the daily spine
    // is calendar-bounded (~2.4k rows/decade), so the pair relation is
    // a BroadcastNestedLoopJoin of constant size at any data volume —
    // never a shuffled theta join.
    "q_ts_mann_kendall" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("rn", row_number().over(Window.orderBy(col("dt"))))
      val pairs = daily.as("a").join(broadcast(daily.as("b")),
          col("a.rn") < col("b.rn"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(signum(col("b.y") - col("a.y")).cast("long")).as("s"),
          sum(when(col("a.y") === col("b.y"), 1L).otherwise(0L))
            .as("n_tie_pairs"))
      // exact tie correction: Σ over tied-y groups of t(t−1)(2t+5)
      val n = daily
        .groupBy(col("y")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t")).as("n"),
          sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie18"))
      pairs.crossJoin(broadcast(n))
        .withColumn("var18",
          expr("n * (n - 1) * (2 * n + 5) - tie18"))
        .select(col("n").as("n_days"), col("n_pairs"), col("s"),
          col("n_tie_pairs"),
          r6((col("s").cast("double")
            - signum(col("s").cast("double")))
            / sqrt(col("var18").cast("double") / 18.0)).as("z_mk"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_mann_kendall" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            b AS (SELECT y, row_number() OVER (ORDER BY dt) AS rn
                  FROM daily),
            p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(CASE WHEN b2.y > b1.y THEN 1
                              WHEN b2.y < b1.y THEN -1 ELSE 0 END)
                      AS BIGINT) AS s,
                    CAST(SUM(CASE WHEN b1.y = b2.y THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_tie_pairs
                  FROM b b1 JOIN b b2 ON b1.rn < b2.rn),
            nn AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                     CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie18
                  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                          FROM daily GROUP BY y))
         SELECT n AS n_days, n_pairs, s, n_tie_pairs,
                round((CAST(s AS DOUBLE)
                  - CASE WHEN s > 0 THEN 1.0
                         WHEN s < 0 THEN -1.0 ELSE 0.0 END)
                  / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie18
                    AS DOUBLE) / 18.0), 6) AS z_mk
         FROM p, nn"""
  )
}
