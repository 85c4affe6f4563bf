package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 additions, part 1: the two sequential-recurrence time-series
  * kernels the round-10 verdict promoted from "declared unreachable" —
  * additive Holt-Winters (level+trend+season exponential smoothing) and
  * banded Dynamic Time Warping (Sakoe-Chiba) — both as per-series
  * calendar-bounded Scala kernels over a distributed daily aggregation,
  * oracle-checked against DuckDB recursive CTEs unrolling the SAME
  * recurrence in exact integers.
  *
  * Scale shape: the only fact-sized stage is the (event_type, day)
  * count aggregation — one shuffle, fully distributed. Everything after
  * rides per-type series whose length is CALENDAR-bounded (~days of
  * history, never row count) and a pair relation bounded by the
  * event-type alphabet squared; per-group kernel state is O(days) for
  * Holt-Winters and O(days·band) for DTW. At 100 TB the daily agg
  * dominates and partitions by (type, day); the kernels are unchanged.
  *
  * Determinism contract (SURVEY §2.13): both recurrences run in exact
  * BIGINT micro-units with truncating integer division — Scala Long
  * division and DuckDB `//` both truncate toward zero (verified this
  * round: DuckDB 1.x `(-7)//2 = -3`), so every intermediate state
  * value is bit-identical across engines; no IEEE arithmetic anywhere.
  */
object Extras75 {

  /** Dense per-type daily count series over the GLOBAL calendar span:
    * (event_type, t (1-based day index), y (count, 0 for silent days)).
    * The left join keeps weekly seasonality aligned across types. */
  private def dailySeries(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val span = ev.agg(min(to_date(col("ts"))).as("dmin"),
      max(to_date(col("ts"))).as("dmax"))
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("y"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("dmin"), col("dmax"))).as("dt"))
    spine.join(daily, Seq("event_type", "dt"), "left")
      .select(col("event_type"), col("dt"),
        coalesce(col("y"), lit(0L)).as("y"))
  }

  /** Per-type ordered series array: (event_type, ys) with ys sorted by
    * day. sort_array on (dt, y) structs gives day order without relying
    * on collect_list arrival order. */
  private def seriesArrays(s: SparkSession, d: String): DataFrame =
    dailySeries(s, d)
      .select(col("event_type"), struct(col("dt"), col("y")).as("p"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(col("event_type"), expr("transform(ps, x -> x.y)").as("ys"))

  private val Inf = 4611686018427387904L // 2^62 — never competitive

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ADDITIVE HOLT-WINTERS — level+trend+weekly-season smoothing of
    // the per-type daily count series, α=1/2 β=1/5 γ=1/10, m=7.
    // Init (the classical two-season scheme, in micro-units):
    //   l = Σ(week2) div 7, b = (Σ(week2)−Σ(week1)) div 49,
    //   s_i = y_i − Σ(week2) div 7 for the second week;
    // then for t = 15..n the textbook recurrence with the α-weights
    // expressed as exact integer fractions:
    //   l' = ((yμ_t − s_{t−7}) + (l + b)) div 2
    //   b' = ((l' − l) + 4b) div 5
    //   s' = ((yμ_t − l') + 9·s_{t−7}) div 10
    // Emitted: the 7-day-ahead forecast curve l' + h·b' + s (one row
    // per (type, horizon)). The oracle unrolls the identical integer
    // recurrence in a DuckDB recursive CTE carrying the season ring
    // as a LIST — every state value matches bit-for-bit.
    "q_ts_holt_winters" -> ((s, d) => {
      import s.implicits._
      seriesArrays(s, d).as[(String, Seq[Long])]
        .flatMap { case (tpe, ysRaw) =>
          val y = ysRaw.map(_ * 1000000L).toArray
          val n = y.length
          if (n < 15) Iterator.empty
          else {
            val s1 = y.slice(0, 7).sum
            val s2 = y.slice(7, 14).sum
            var l = s2 / 7
            var b = (s2 - s1) / 49
            val seas = Array.tabulate(7)(i => y(7 + i) - s2 / 7)
            var t = 14
            while (t < n) {
              val sOld = seas(0)
              val lNew = ((y(t) - sOld) + (l + b)) / 2
              val bNew = ((lNew - l) + 4 * b) / 5
              val sNew = ((y(t) - lNew) + 9 * sOld) / 10
              System.arraycopy(seas, 1, seas, 0, 6)
              seas(6) = sNew
              l = lNew; b = bNew; t += 1
            }
            (1 to 7).iterator.map(h =>
              (tpe, h.toLong, l + h * b + seas(h - 1), l, b))
          }
        }
        .toDF("event_type", "h", "forecast_micro", "level_micro",
          "trend_micro")
        .orderBy("event_type", "h")
    }),

    // BANDED DTW (Sakoe-Chiba, r=3 days) — dynamic-time-warping
    // distance between every pair of per-type daily count series:
    // d(i,j) = |x_i − y_j| + min(d(i−1,j), d(i,j−1), d(i−1,j−1))
    // restricted to |i−j| ≤ 3. The pair relation is alphabet-bounded
    // (types², broadcast); each DP is O(n·band) over the
    // calendar-bounded series. All-integer costs ⇒ the min-path value
    // is exact; the oracle walks the SAME DP by anti-diagonals in a
    // recursive CTE carrying two diagonal LISTs.
    "q_ts_dtw" -> ((s, d) => {
      import s.implicits._
      val arr = seriesArrays(s, d)
      val pairs = arr.as("a").join(broadcast(arr.as("b")),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.ys").as("xs"), col("b.ys").as("ys"))
      pairs.as[(String, String, Seq[Long], Seq[Long])]
        .map { case (ta, tb, xsS, ysS) =>
          val x = xsS.toArray
          val y = ysS.toArray
          val n = x.length
          val band = 3
          val dp = Array.fill(n + 1, n + 1)(Inf)
          var i = 1
          while (i <= n) {
            var j = math.max(1, i - band)
            val jMax = math.min(n, i + band)
            while (j <= jMax) {
              val cost = math.abs(x(i - 1) - y(j - 1))
              if (i == 1 && j == 1) dp(i)(j) = cost
              else {
                val best = math.min(dp(i - 1)(j),
                  math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
                dp(i)(j) = cost + best
              }
              j += 1
            }
            i += 1
          }
          (ta, tb, dp(n)(n))
        }
        .toDF("type_a", "type_b", "dtw_dist")
        .orderBy("type_a", "type_b")
    })
  )

  /** Shared oracle spine: dense per-type daily counts with 1-based t. */
  private val serCte =
    """span AS (
         SELECT MIN(CAST(ts AS DATE)) AS dmin, MAX(CAST(ts AS DATE)) AS dmax
         FROM events),
       types AS (SELECT DISTINCT event_type FROM events),
       spine AS (SELECT event_type,
                        CAST(UNNEST(generate_series(dmin, dmax,
                          INTERVAL 1 DAY)) AS DATE) AS dt
                 FROM types, span),
       daily AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                        CAST(COUNT(*) AS BIGINT) AS y
                 FROM events GROUP BY 1, 2),
       ser AS (SELECT s.event_type, s.dt, COALESCE(dy.y, 0) AS y,
                      ROW_NUMBER() OVER (PARTITION BY s.event_type
                                         ORDER BY s.dt) AS t
               FROM spine s LEFT JOIN daily dy
                 ON dy.event_type = s.event_type AND dy.dt = s.dt)"""

  val oracle: Map[String, String] = Map(

    "q_ts_holt_winters" ->
      s"""WITH RECURSIVE $serCte,
            arr AS (SELECT event_type, list(y * 1000000 ORDER BY t) AS ys,
                           CAST(COUNT(*) AS BIGINT) AS n
                    FROM ser GROUP BY 1),
            init AS (SELECT event_type, ys, n,
                            CAST(list_sum(ys[1:7]) AS BIGINT) AS s1,
                            CAST(list_sum(ys[8:14]) AS BIGINT) AS s2
                     FROM arr WHERE n >= 15),
            r AS (
              SELECT event_type, ys, n, CAST(14 AS BIGINT) AS t,
                     s2 // 7 AS l, (s2 - s1) // 49 AS b,
                     list_transform(range(1, 8),
                       i -> ys[7 + i] - s2 // 7) AS seas
              FROM init
              UNION ALL
              SELECT event_type, ys, n, t, lnew AS l,
                     ((lnew - l0) + 4 * b0) // 5 AS b,
                     seas0[2:] || [((yt - lnew) + 9 * seas0[1]) // 10]
                       AS seas
              FROM (SELECT event_type, ys, n, t + 1 AS t, l AS l0,
                           b AS b0, seas AS seas0,
                           ys[CAST(t + 1 AS INT)] AS yt,
                           ((ys[CAST(t + 1 AS INT)] - seas[1]) + (l + b))
                             // 2 AS lnew
                    FROM r WHERE t < n) q),
            fin AS (SELECT event_type, l, b, seas FROM r WHERE t = n)
         SELECT f.event_type, h.h AS h,
                f.l + h.h * f.b + f.seas[CAST(h.h AS INT)]
                  AS forecast_micro,
                f.l AS level_micro, f.b AS trend_micro
         FROM fin f, (SELECT UNNEST(range(1, 8)) AS h) h
         ORDER BY 1, 2""",

    "q_ts_dtw" ->
      s"""WITH RECURSIVE $serCte,
            arr AS (SELECT event_type, list(y ORDER BY t) AS ys,
                           CAST(COUNT(*) AS BIGINT) AS n
                    FROM ser GROUP BY 1),
            pairs AS (SELECT a.event_type AS type_a,
                             b.event_type AS type_b,
                             a.ys AS xs, b.ys AS ys, a.n AS n
                      FROM arr a JOIN arr b
                        ON a.event_type < b.event_type),
            r AS (
              SELECT type_a, type_b, xs, ys, n, CAST(2 AS BIGINT) AS k,
                     list_transform(range(1, CAST(n AS INT) + 1),
                       i -> CASE WHEN i = 1 THEN abs(xs[1] - ys[1])
                                 ELSE 4611686018427387904 END) AS d1,
                     list_transform(range(1, CAST(n AS INT) + 1),
                       i -> 4611686018427387904) AS d2
              FROM pairs
              UNION ALL
              SELECT type_a, type_b, xs, ys, n, k + 1,
                     list_transform(range(1, CAST(n AS INT) + 1), i ->
                       CASE WHEN k + 1 - i BETWEEN 1 AND n
                                 AND abs(2 * i - k - 1) <= 3
                            THEN abs(xs[i] - ys[CAST(k + 1 - i AS INT)])
                                 + least(
                                CASE WHEN i > 1 THEN d1[i - 1]
                                     ELSE 4611686018427387904 END,
                                d1[i],
                                CASE WHEN i > 1 THEN d2[i - 1]
                                     ELSE 4611686018427387904 END)
                            ELSE 4611686018427387904 END) AS d1,
                     d1 AS d2
              FROM r WHERE k < 2 * n)
         SELECT type_a, type_b, d1[CAST(n AS INT)] AS dtw_dist
         FROM r WHERE k = 2 * n ORDER BY 1, 2"""
  )
}
