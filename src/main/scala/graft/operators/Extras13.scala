package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-7 additions, part 3: spatial grid join, geodesic scalar family,
  * and two more series diagnostics (day-of-week seasonal index, CUSUM
  * changepoint series).
  *
  * The spatial join is the operator of record for "within distance r"
  * at scale: bucket points into r-sized grid cells and equi-join each
  * point's cell against the 3×3 neighborhood — candidate count is
  * density-bounded (each pair produced exactly once because the probe
  * side explodes its 9 neighbor cells while the build side keeps its
  * unique home cell), where the naive theta join is O(n²). Coordinates
  * are synthesized from the portable md5 hash (testdata has no geo
  * columns) — the POINT is the join algorithm, not the data.
  */
object Extras13 {
  import Det._

  /** Deterministic synthetic integer coordinates on a 1000×1000 grid. */
  private def pts(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("id"),
      pmod(md5long(concat(col("c_custkey"), lit(":x"))), lit(1000L)).as("px"),
      pmod(md5long(concat(col("c_custkey"), lit(":y"))), lit(1000L)).as("py"))

  private val PtsSql =
    """pts AS (SELECT c_custkey AS id,
         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 15))
              AS BIGINT) % 1000 AS px,
         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 15))
              AS BIGINT) % 1000 AS py
       FROM customer)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SPATIAL GRID JOIN — all point pairs within Chebyshev distance 25,
    // via 25-unit grid cells + 3×3 neighborhood equi-join. The probe side
    // explodes 9 (cell, point) copies; the build side stays at 1 copy
    // per point, so every qualifying pair is produced exactly once (no
    // post-dedup) and the join is a plain hash join on the cell key —
    // the shape that survives 100 TB where the oracle's theta join
    // cannot. Expected output is density-bounded: n²·(51/1000)² pairs.
    "q_join_spatial_grid" -> ((s, d) => {
      val p = pts(s, d)
      val probe = p.select(col("id").as("a"), col("px").as("ax"),
          col("py").as("ay"),
          explode(expr("sequence(-1, 1)")).as("ox"))
        .select(col("a"), col("ax"), col("ay"), col("ox"),
          explode(expr("sequence(-1, 1)")).as("oy"))
        .select(col("a"), col("ax"), col("ay"),
          (expr("ax div 25") + col("ox")).as("cx"),
          (expr("ay div 25") + col("oy")).as("cy"))
      val build = p.select(col("id").as("b"), col("px").as("bx"),
        col("py").as("by"), expr("px div 25").as("cx"),
        expr("py div 25").as("cy"))
      probe.join(build, Seq("cx", "cy"))
        .where(col("a") < col("b")
          && abs(col("ax") - col("bx")) <= 25
          && abs(col("ay") - col("by")) <= 25)
        .select(col("a"), col("b"),
          abs(col("ax") - col("bx")).as("dx"),
          abs(col("ay") - col("by")).as("dy"))
        .orderBy("a", "b")
    }),

    // HAVERSINE SCALAR FAMILY — great-circle distance from synthetic
    // 4-dp lat/lon to two fixed anchors, shared IEEE formula (the
    // sin/cos/asin determinism q_fn_trig already established), km on
    // the 6371 sphere, round 4. Pure per-row projection, codegen.
    "q_fn_geo" -> ((s, d) => {
      def latc(k: Column, salt: String): Column =
        pmod(md5long(concat(k, lit(salt))), lit(1800000L))
          .cast("double") / 10000.0 - 90.0
      def lonc(k: Column, salt: String): Column =
        pmod(md5long(concat(k, lit(salt))), lit(3600000L))
          .cast("double") / 10000.0 - 180.0
      def hav(lat1: Column, lon1: Column, lat2: Column, lon2: Column) = {
        val rl1 = radians(lat1); val rl2 = radians(lat2)
        val dphi = radians(lat2 - lat1); val dlam = radians(lon2 - lon1)
        val h = sin(dphi / 2) * sin(dphi / 2) +
          cos(rl1) * cos(rl2) * sin(dlam / 2) * sin(dlam / 2)
        round(lit(2 * 6371.0) * asin(sqrt(h)), 4)
      }
      val k = col("c_custkey")
      Tables.customer(s, d)
        .select(col("c_custkey"),
          latc(k, ":lat").as("lat"), lonc(k, ":lon").as("lon"),
          hav(latc(k, ":lat"), lonc(k, ":lon"), lit(0.0), lit(0.0))
            .as("d_origin"),
          hav(latc(k, ":lat"), lonc(k, ":lon"), lit(48.8566), lit(2.3522))
            .as("d_paris"))
        .orderBy("c_custkey")
    }),

    // DAY-OF-WEEK SEASONAL INDEX — per-dow mean of the daily revenue
    // series over the overall mean. Dow is pinned to the engine-neutral
    // (days-since-1970-01-01) mod 7 (0 = Thursday) — both engines'
    // native dayofweek disagree on numbering. Means divide an exact
    // decimal sum by an exact count (one shared IEEE division each).
    "q_ts_seasonal" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum(dec(col("o_totalprice"))).as("v"))
      val dow = daily.select(
        pmod(datediff(col("dt"), lit("1970-01-01").cast("date")), lit(7))
          .as("dow"), col("v"))
      val per = dow.groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("v")).cast("double").as("sv"))
      val tot = dow.agg(count(lit(1)).as("tn"),
        sum(col("v")).cast("double").as("tv"))
      per.crossJoin(broadcast(tot))
        .select(col("dow"), col("n_days"),
          round(col("sv") / col("n_days"), 6).as("mean_rev"),
          round((col("sv") / col("n_days")) / (col("tv") / col("tn")), 6)
            .as("seasonal_index"))
        .orderBy("dow")
    }),

    // CUSUM CHANGEPOINT SERIES — cumulative deviation from the series
    // mean, shipped as its EXACT integer numerator (round 8):
    // cusum_k = S_k − k·(T/N) scales to tn·S_k − k·T, all BIGINT cents
    // (headroom: N≈2 400 days × T<2^44 cents at sf100 stays < 2^63).
    // The former round(double,4) output was hostage to the oracle
    // engine's round() build; an all-integer emit cannot diverge, and
    // telescoping makes the final row EXACTLY zero (spec-asserted).
    // Calendar-bounded single-partition tail window (the q_ts_acf
    // argument); the daily aggregate is the only data-sized shuffle.
    "q_ts_cusum" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("v_cents"))
      val w = Window.orderBy("dt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = daily.agg(count(lit(1)).as("tn"),
        sum(col("v_cents")).as("t_cents"))
      daily.crossJoin(broadcast(tot))
        .select(col("dt"), col("v_cents"),
          (col("tn") * sum(col("v_cents")).over(w)
            - row_number().over(Window.orderBy("dt")).cast("long")
              * col("t_cents")).as("cusum_num"),
          col("tn"))
        .orderBy("dt")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_spatial_grid" ->
      s"""WITH $PtsSql
         SELECT p.id AS a, q.id AS b,
                abs(p.px - q.px) AS dx, abs(p.py - q.py) AS dy
         FROM pts p JOIN pts q
           ON p.id < q.id AND abs(p.px - q.px) <= 25 AND abs(p.py - q.py) <= 25
         ORDER BY a, b""",
    "q_fn_geo" ->
      """WITH c AS (SELECT c_custkey,
           CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lat'),
                 1, 15)) AS BIGINT) % 1800000 / 10000.0 - 90.0 AS lat,
           CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lon'),
                 1, 15)) AS BIGINT) % 3600000 / 10000.0 - 180.0 AS lon
         FROM customer)
         SELECT c_custkey, lat, lon,
           round(2 * 6371.0 * asin(sqrt(
             sin(radians(0.0 - lat) / 2) * sin(radians(0.0 - lat) / 2)
             + cos(radians(lat)) * cos(radians(0.0))
               * sin(radians(0.0 - lon) / 2) * sin(radians(0.0 - lon) / 2))),
             4) AS d_origin,
           round(2 * 6371.0 * asin(sqrt(
             sin(radians(48.8566 - lat) / 2) * sin(radians(48.8566 - lat) / 2)
             + cos(radians(lat)) * cos(radians(48.8566))
               * sin(radians(2.3522 - lon) / 2)
               * sin(radians(2.3522 - lon) / 2))), 4) AS d_paris
         FROM c ORDER BY c_custkey""",
    "q_ts_seasonal" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
              FROM orders GROUP BY 1),
            dw AS (SELECT CAST((dt - DATE '1970-01-01') % 7 AS INT) AS dow,
                          v FROM daily),
            per AS (SELECT dow, COUNT(*) AS n_days,
                      CAST(SUM(v) AS DOUBLE) AS sv FROM dw GROUP BY 1),
            tot AS (SELECT COUNT(*) AS tn, CAST(SUM(v) AS DOUBLE) AS tv
                    FROM dw)
         SELECT dow, n_days, round(sv / n_days, 6) AS mean_rev,
                round((sv / n_days) / (tv / tn), 6) AS seasonal_index
         FROM per CROSS JOIN tot ORDER BY dow""",
    "q_ts_cusum" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS v_cents
              FROM orders GROUP BY 1),
            tot AS (SELECT COUNT(*) AS tn,
                           CAST(SUM(v_cents) AS BIGINT) AS t_cents
                    FROM daily)
         SELECT dt, v_cents,
                CAST(tn * CAST(SUM(v_cents) OVER (ORDER BY dt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT)
                  - row_number() OVER (ORDER BY dt) * t_cents
                  AS BIGINT) AS cusum_num,
                tn
         FROM daily CROSS JOIN tot ORDER BY dt"""
  )
}
