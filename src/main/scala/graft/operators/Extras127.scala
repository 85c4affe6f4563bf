package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 53: interrupted-time-series segmented
  * regression (the policy-evaluation staple: level and slope change
  * at a fixed intervention date — the saturated two-segment model is
  * exactly two independent OLS fits), Hoeffding's D dependence
  * measure between daily order count and revenue (catches
  * non-monotone dependence that Kendall/Spearman miss), and the
  * Poisson overdispersion test on per-customer order counts
  * (zero-inclusive via the customer dimension — the decision gate
  * before q_agg_negbin_fit's NB2 fit).
  *
  * Scale shape: ITS folds two exact moment sets over the calendar
  * spine; hoeffding rides the broadcast calendar² pair spine (the
  * q_ts_kendall_tau shape — flat at any fact scale because the
  * calendar is bounded); overdispersion is one left-join + exact
  * moment fold at customer grain.
  *
  * Determinism contract (SURVEY §2.13): ITS slopes/levels are IEEE
  * chains from exact DECIMAL(38,0) moments. Hoeffding uses PINNED
  * ranks ((value, dt) total order — the siegel_tukey stated-tiebreak
  * convention; the classic no-ties formula then applies exactly);
  * D1/D2/D3 are exact integer sums (D2 in DECIMAL(38,0)).
  * Overdispersion is exact integers with one IEEE tail.
  */
object Extras127 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // INTERRUPTED TIME SERIES — daily revenue, intervention at
    // 1998-01-01: per-segment OLS (t in days since epoch), level
    // change at the boundary and slope change.
    "q_ts_its_segmented" -> ((s, d) => {
      val t0 = 10227L // unix_date('1998-01-01'), mid-span of the 1995-2001 testdata
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .select(unix_date(col("dt")).cast("long").as("t"), col("y"))
        .withColumn("seg", when(col("t") < t0, "pre").otherwise("post"))
      val fits = daily.groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
          sum(col("y")).as("sy"),
          sum(col("t").cast(Big) * col("y").cast(Big)).as("sty"),
          sum(col("t").cast(Big) * col("t").cast(Big)).as("stt"))
      val nD = col("n").cast("double")
      val slope = (nD * col("sty").cast("double")
        - col("st").cast("double") * col("sy").cast("double")) /
        (nD * col("stt").cast("double")
          - col("st").cast("double") * col("st").cast("double"))
      val withFit = fits
        .withColumn("slope", slope)
        .withColumn("icept",
          col("sy").cast("double") / nD
            - col("slope") * col("st").cast("double") / nD)
        .withColumn("at_t0",
          col("icept") + col("slope") * lit(t0.toDouble))
      val pre = withFit.where(col("seg") === "pre")
        .select(col("n").as("n_pre"), col("slope").as("sl_pre"),
          col("at_t0").as("lvl_pre"))
      val post = withFit.where(col("seg") === "post")
        .select(col("n").as("n_post"), col("slope").as("sl_post"),
          col("at_t0").as("lvl_post"))
      pre.crossJoin(broadcast(post))
        .select(col("n_pre"), col("n_post"),
          r6(col("sl_pre") / lit(100.0)).as("slope_pre_dollars"),
          r6(col("sl_post") / lit(100.0)).as("slope_post_dollars"),
          r6((col("sl_post") - col("sl_pre")) / lit(100.0))
            .as("slope_change"),
          r6((col("lvl_post") - col("lvl_pre")) / lit(100.0))
            .as("level_change_dollars"))
    }),

    // HOEFFDING'S D — daily (order count, revenue): pinned ranks,
    // Q via the broadcast calendar² pair spine, the classical
    // 30·((n−2)(n−3)D1 + D2 − 2(n−2)D3) / (n..(n−4)) form.
    "q_ts_hoeffding_d" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(count(lit(1)).as("x"),
          sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val ranked = daily
        .withColumn("rx", row_number().over(
          Window.orderBy(col("x"), col("dt"))).cast("long"))
        .withColumn("ry", row_number().over(
          Window.orderBy(col("y"), col("dt"))).cast("long"))
        .select(col("dt"), col("rx"), col("ry"))
      val qrel = ranked.as("a").join(broadcast(ranked.as("b")),
          col("b.rx") < col("a.rx") && col("b.ry") < col("a.ry"))
        .groupBy(col("a.dt").as("dt")).agg(count(lit(1)).as("qi"))
      val full = ranked.join(qrel, Seq("dt"), "left")
        .withColumn("qi", coalesce(col("qi"), lit(0L)))
      val agg = full.agg(count(lit(1)).as("n"),
        sum(col("qi") * (col("qi") - 1)).as("d1"),
        sum((col("rx") - 1).cast(Big) * (col("rx") - 2).cast(Big)
          * (col("ry") - 1).cast(Big) * (col("ry") - 2).cast(Big))
          .as("d2"),
        sum((col("rx") - 2) * (col("ry") - 2) * col("qi")).as("d3"))
      val nD = col("n").cast("double")
      val dstat = lit(30.0) *
        ((nD - 2) * (nD - 3) * col("d1").cast("double")
          + col("d2").cast("double")
          - lit(2.0) * (nD - 2) * col("d3").cast("double")) /
        (nD * (nD - 1) * (nD - 2) * (nD - 3) * (nD - 4))
      agg.select(col("n").as("n_days"), col("d1"), col("d3"),
        r6(dstat).as("hoeffding_d"))
    }),

    // POISSON OVERDISPERSION — per-customer order counts including
    // zero-order customers: dispersion ratio var/mean and the
    // Poisson χ² = (nΣx² − S²)/(n·x̄·(n−1))·(n−1) = (nΣx² − S²)/S.
    "q_agg_overdispersion" -> ((s, d) => {
      val cnt = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("c")).agg(count(lit(1)).as("x"))
      val all = Tables.customer(s, d)
        .select(col("c_custkey").as("c"))
        .join(cnt, Seq("c"), "left")
        .withColumn("x", coalesce(col("x"), lit(0L)))
      val a = all.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val nD = col("n").cast("double")
      val mean = col("sx").cast("double") / nD
      val varr = (nD * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double")) /
        (nD * (nD - 1))
      a.select(col("n").as("n_customers"), r6(mean).as("mean_orders"),
        r6(varr).as("var_orders"),
        r6(varr / mean).as("dispersion_ratio"),
        r6((nD * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double")) /
          col("sx").cast("double")).as("chi2_poisson"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_its_segmented" ->
      """WITH daily AS (SELECT CAST(CAST(o_orderdate AS DATE)
                      - DATE '1970-01-01' AS BIGINT) AS t,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            seg AS (SELECT t, y,
                    CASE WHEN t < 10227 THEN 'pre' ELSE 'post' END AS seg
                  FROM daily),
            fits AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(t) AS BIGINT) AS st,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    CAST(SUM(CAST(t AS HUGEINT) * CAST(y AS HUGEINT))
                      AS HUGEINT) AS sty,
                    CAST(SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT))
                      AS HUGEINT) AS stt
                  FROM seg GROUP BY 1),
            wf AS (SELECT seg, n,
                    (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                      - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                      AS slope,
                    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                    CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS mt
                  FROM fits),
            f2 AS (SELECT seg, n, slope,
                    (my - slope * mt) + slope * 10227.0 AS at_t0
                  FROM wf),
            pre AS (SELECT n AS n_pre, slope AS sl_pre,
                      at_t0 AS lvl_pre FROM f2 WHERE seg = 'pre'),
            post AS (SELECT n AS n_post, slope AS sl_post,
                      at_t0 AS lvl_post FROM f2 WHERE seg = 'post')
         SELECT n_pre, n_post,
                round(sl_pre / 100.0, 6) AS slope_pre_dollars,
                round(sl_post / 100.0, 6) AS slope_post_dollars,
                round((sl_post - sl_pre) / 100.0, 6) AS slope_change,
                round((lvl_post - lvl_pre) / 100.0, 6)
                  AS level_change_dollars
         FROM pre, post""",

    "q_ts_hoeffding_d" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(COUNT(*) AS BIGINT) AS x,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            ranked AS (SELECT dt,
                    CAST(row_number() OVER (ORDER BY x, dt) AS BIGINT)
                      AS rx,
                    CAST(row_number() OVER (ORDER BY y, dt) AS BIGINT)
                      AS ry
                  FROM daily),
            qrel AS (SELECT a.dt, CAST(COUNT(*) AS BIGINT) AS qi
                     FROM ranked a JOIN ranked b
                       ON b.rx < a.rx AND b.ry < a.ry
                     GROUP BY 1),
            fl AS (SELECT r.rx, r.ry, COALESCE(q.qi, 0) AS qi
                     FROM ranked r LEFT JOIN qrel q ON r.dt = q.dt),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(qi * (qi - 1)) AS BIGINT) AS d1,
                    CAST(SUM(CAST(rx - 1 AS HUGEINT)
                      * CAST(rx - 2 AS HUGEINT)
                      * CAST(ry - 1 AS HUGEINT)
                      * CAST(ry - 2 AS HUGEINT)) AS HUGEINT) AS d2,
                    CAST(SUM((rx - 2) * (ry - 2) * qi) AS BIGINT) AS d3
                  FROM fl),
            f AS (SELECT n, d1, d3, CAST(n AS DOUBLE) AS nD,
                    CAST(d1 AS DOUBLE) AS d1D, CAST(d2 AS DOUBLE) AS d2D,
                    CAST(d3 AS DOUBLE) AS d3D
                  FROM a)
         SELECT n AS n_days, d1, d3,
                round(30.0 * ((nD - 2) * (nD - 3) * d1D + d2D
                    - 2.0 * (nD - 2) * d3D)
                  / (nD * (nD - 1) * (nD - 2) * (nD - 3) * (nD - 4)),
                  6) AS hoeffding_d
         FROM f""",

    "q_agg_overdispersion" ->
      """WITH cnt AS (SELECT o_custkey AS c, CAST(COUNT(*) AS BIGINT)
                      AS x
                 FROM orders GROUP BY 1),
            al AS (SELECT cu.c_custkey AS c, COALESCE(cnt.x, 0) AS x
                   FROM customer cu LEFT JOIN cnt
                     ON cu.c_custkey = cnt.c),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(x * x) AS BIGINT) AS sxx
                  FROM al),
            f AS (SELECT n, sx, sxx, CAST(n AS DOUBLE) AS nD,
                    CAST(sx AS DOUBLE) AS sxD,
                    CAST(sxx AS DOUBLE) AS sxxD
                  FROM a)
         SELECT n AS n_customers,
                round(sxD / nD, 6) AS mean_orders,
                round((nD * sxxD - sxD * sxD) / (nD * (nD - 1)), 6)
                  AS var_orders,
                round((nD * sxxD - sxD * sxD) / (nD * (nD - 1))
                  / (sxD / nD), 6) AS dispersion_ratio,
                round((nD * sxxD - sxD * sxD) / sxD, 6) AS chi2_poisson
         FROM f"""
  )
}
