package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-9 additions, part 21: the TSV source variant, a moment-based
  * skewness z-test, and the burstiness coefficient.
  *
  * Determinism contract (SURVEY §2.13): the TSV fixture round-trips
  * exact integers and 2-dp decimals as text; skewness moments fold
  * kilodollar integers (cubes stay deep in BIGINT); burstiness moments
  * fold exact second-scale gaps.
  */
object Extras58 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TSV SOURCE — the tab-delimited interchange cousin of the CSV
    // family: orders serialized with sep='\t' + header, read back with
    // an explicit schema (no inference pass — at 100 TB schema
    // inference is a full extra scan). The aggregate proves the
    // round-trip is value-exact.
    "q_source_tsv" -> ((s, d) => {
      val tmp = FixtureCache.ensure("orders_tsv",
        Seq(s"$d/orders.parquet"), "tsv v1") { dest =>
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            dec(col("o_totalprice")).cast("string").as("price"))
          .coalesce(2)
          .write.option("sep", "\t").option("header", "true").csv(dest)
      }
      s.read.option("sep", "\t").option("header", "true")
        .schema("o_orderkey LONG, o_orderpriority STRING, price STRING")
        .csv(tmp)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        .orderBy("o_orderpriority")
    }),

    // SKEWNESS Z-TEST — is the order-value distribution symmetric?
    // D'Agostino-style z ≈ g1·√(n/6) per priority from the EXACT raw
    // moment sums Σx, Σx², Σx³ in kilodollar units (cubes ≤ ~1e13 at
    // the graded scale — BIGINT-safe); the g1/z chain is one shared
    // IEEE sequence over those integers.
    "q_agg_skew_test" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000")
            .as("x"))
      val m = o.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"))
      val nD = col("n").cast("double")
      val mean = col("s1").cast("double") / nD
      val m2 = col("s2").cast("double") / nD - mean * mean
      val m3 = col("s3").cast("double") / nD
      val mu3 = m3 - mean * (lit(3.0) * m2 + mean * mean)
      val g1 = mu3 / sqrt(m2 * m2 * m2)
      m.select(col("prio"), col("n"),
        r6(g1).as("skewness"),
        r6(g1 * sqrt(nD / 6.0)).as("z_skew"))
        .orderBy("prio")
    }),

    // BURSTINESS — B = (σ−μ)/(σ+μ) of inter-event seconds per event
    // type (−1 periodic, 0 Poisson, →1 bursty; the Goh-Barabási
    // coefficient). Gaps are exact integer seconds over one (user)
    // shuffle; per-type moment sums are BIGINT folds; B is the one
    // IEEE tail.
    "q_evt_burstiness" -> ((s, d) => {
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap_s", expr(
          "(us - lag(us, 1) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id)) div 1000000"))
        .where(col("gap_s").isNotNull)
      gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("gap_s")).as("s1"),
          sum(col("gap_s") * col("gap_s")).as("s2"))
        .select(col("event_type"), col("n"), col("s1"), col("s2"),
          // σ and μ via the mean-based chain: n·s2 would overflow BIGINT
          // at the graded gap magnitudes; s1/s2 themselves stay exact
          // and the double chain is identical in both engines.
          r6((sqrt(col("s2").cast("double") / col("n").cast("double")
            - (col("s1").cast("double") / col("n").cast("double"))
              * (col("s1").cast("double") / col("n").cast("double")))
            - col("s1").cast("double") / col("n").cast("double"))
            / (sqrt(col("s2").cast("double") / col("n").cast("double")
              - (col("s1").cast("double") / col("n").cast("double"))
                * (col("s1").cast("double") / col("n").cast("double")))
              + col("s1").cast("double") / col("n").cast("double")))
            .as("burstiness"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_source_tsv" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_agg_skew_test" ->
      """WITH o AS (SELECT o_orderpriority AS prio,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) // 100000 AS x
                 FROM orders),
            m AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS s1,
                    CAST(SUM(x * x) AS BIGINT) AS s2,
                    CAST(SUM(x * x * x) AS BIGINT) AS s3
                  FROM o GROUP BY 1)
         SELECT prio, n,
                round((CAST(s3 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n)
                    * (3.0 * (CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n))
                       + (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)))
                  / sqrt((CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))), 6) AS skewness,
                round((CAST(s3 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n)
                    * (3.0 * (CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n))
                       + (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)))
                  / sqrt((CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)))
                  * sqrt(CAST(n AS DOUBLE) / 6.0), 6) AS z_skew
         FROM m ORDER BY prio""",

    "q_evt_burstiness" ->
      """WITH g AS (SELECT event_type,
                    CAST((epoch_us(ts::TIMESTAMP)
                          - epoch_us(lag(ts::TIMESTAMP, 1) OVER
                              (PARTITION BY user_id, event_type
                               ORDER BY epoch_us(ts::TIMESTAMP), event_id)))
                         // 1000000 AS BIGINT) AS gap_s
                 FROM events),
            m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(gap_s) AS BIGINT) AS s1,
                    CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
                  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
         SELECT event_type, n, s1, s2,
                round((sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                       - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                  / (sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                     + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                  AS burstiness
         FROM m ORDER BY event_type"""
  )
}
