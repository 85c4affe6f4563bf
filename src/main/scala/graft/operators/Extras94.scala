package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 20: multivariate-moment round-out —
  * the augmented Dickey-Fuller test (one lagged difference), partial
  * correlation of quantity/price controlling for discount, Cronbach's
  * alpha over the five event-type "items", and the one-way intraclass
  * correlation across users.
  *
  * Determinism contract (SURVEY §2.13): every regression/reliability
  * statistic folds exact integer cross-moments (DECIMAL(38,0) before
  * any multiply) into ONE fixed-shape IEEE chain; the 2×2 normal
  * equations invert via adjugate/determinant, never an iterative
  * solver.
  */
object Extras94 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // AUGMENTED DICKEY-FULLER (p=1) — Δy on (y₁, Δy₁) + intercept
    // over the daily revenue series: the scaled centered Gram
    // A = nS_ij − S_iS_j and C = nS_iy − S_iS_y solve the 2×2 by
    // adjugate; t_γ = γ/√(s²·n·A22/det), s² = SSR/(n−3) with
    // n·SSR = (nSyy−Sy²) − γC1 − δC2 — exact scalars throughout.
    "q_ts_adf_lag1" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val sp = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("dy", col("y") - col("y1"))
        .withColumn("dy1", lag(col("dy"), 1).over(w))
        .where(col("y1").isNotNull && col("dy1").isNotNull)
        .select(col("dy").as("yy"), col("y1").as("x1"), col("dy1").as("x2"))
      val m = sp.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(col("yy")).as("sy"),
        sum(col("x1").cast(Big) * col("x1").cast(Big)).as("s11"),
        sum(col("x2").cast(Big) * col("x2").cast(Big)).as("s22"),
        sum(col("x1").cast(Big) * col("x2").cast(Big)).as("s12"),
        sum(col("x1").cast(Big) * col("yy").cast(Big)).as("s1y"),
        sum(col("x2").cast(Big) * col("yy").cast(Big)).as("s2y"),
        sum(col("yy").cast(Big) * col("yy").cast(Big)).as("syy"))
      val nD = col("n").cast("double")
      def ctr(sab: String, sa: String, sb: String) =
        (col("n").cast(Big) * col(sab)
          - col(sa).cast(Big) * col(sb).cast(Big)).cast("double")
      val a11 = ctr("s11", "sx1", "sx1")
      val a22 = ctr("s22", "sx2", "sx2")
      val a12 = ctr("s12", "sx1", "sx2")
      val c1 = ctr("s1y", "sx1", "sy")
      val c2 = ctr("s2y", "sx2", "sy")
      val cyy = ctr("syy", "sy", "sy")
      val det = a11 * a22 - a12 * a12
      val g = (a22 * c1 - a12 * c2) / det
      val del = (a11 * c2 - a12 * c1) / det
      val s2e = (cyy - g * c1 - del * c2) / nD / (nD - 3)
      m.select(col("n").as("n_obs"), r6(g).as("gamma"),
        r6(del).as("delta_lag"),
        r6(g / sqrt(s2e * nD * a22 / det)).as("t_adf"))
    }),

    // PARTIAL CORRELATION — r(qty, price | discount):
    // (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) from the three exact
    // pairwise moment sets.
    "q_agg_partial_corr" -> ((s, d) => {
      val base = Tables.lineitem(s, d).select(
        col("l_quantity").cast("long").as("x"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("y"),
        (dec(col("l_discount")) * 10000).cast("long").as("z"))
      val m = base.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"),
        sum(col("z").cast(Big) * col("z").cast(Big)).as("szz"),
        sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"),
        sum(col("x").cast(Big) * col("z").cast(Big)).as("sxz"),
        sum(col("y").cast(Big) * col("z").cast(Big)).as("syz"))
      def ctr(sab: String, sa: String, sb: String) =
        (col("n").cast(Big) * col(sab)
          - col(sa).cast(Big) * col(sb).cast(Big)).cast("double")
      val rxy = ctr("sxy", "sx", "sy") /
        sqrt(ctr("sxx", "sx", "sx") * ctr("syy", "sy", "sy"))
      val rxz = ctr("sxz", "sx", "sz") /
        sqrt(ctr("sxx", "sx", "sx") * ctr("szz", "sz", "sz"))
      val ryz = ctr("syz", "sy", "sz") /
        sqrt(ctr("syy", "sy", "sy") * ctr("szz", "sz", "sz"))
      m.select(col("n").as("n_rows"), r6(rxy).as("r_xy"),
        r6(rxz).as("r_xz"), r6(ryz).as("r_yz"),
        r6((rxy - rxz * ryz) /
          sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)))
          .as("partial_r"))
    }),

    // CRONBACH'S ALPHA — internal consistency of the five event-type
    // per-user counts as "items": α = k/(k−1)·(1 − Σσ²ᵢ/σ²_T), sample
    // variances from exact per-item and total-score moments.
    "q_agg_cronbach_alpha" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val conds = types.zipWithIndex.map { case (t, i) =>
        sum((col("event_type") === t).cast("long")).as(s"c${i + 1}")
      }
      val per = Tables.events(s, d).groupBy(col("user_id"))
        .agg(conds.head, conds.tail: _*)
        .withColumn("tt",
          col("c1") + col("c2") + col("c3") + col("c4") + col("c5"))
      val aggs = (1 to 5).flatMap(i => Seq(
        sum(col(s"c$i")).as(s"s$i"),
        sum(col(s"c$i").cast(Big) * col(s"c$i").cast(Big)).as(s"ss$i"))) ++
        Seq(count(lit(1)).as("n"), sum(col("tt")).as("st"),
          sum(col("tt").cast(Big) * col("tt").cast(Big)).as("sst"))
      val m = per.agg(aggs.head, aggs.tail: _*)
      def sv(ss: String, s1: String) =
        (col("n").cast(Big) * col(ss)
          - col(s1).cast(Big) * col(s1).cast(Big)).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double"))
      val sumItems = (1 to 5).map(i => sv(s"ss$i", s"s$i")).reduce(_ + _)
      val vt = sv("sst", "st")
      m.select(col("n").as("n_users"),
        r6(sumItems).as("sum_item_var"), r6(vt).as("total_var"),
        r6(lit(1.25) * (lit(1.0) - sumItems / vt)).as("cronbach_alpha"))
    }),

    // INTRACLASS CORRELATION ICC(1) — users as groups, their event
    // values (cents) as ratings: one-way ANOVA MSB/MSW with the
    // unbalanced-design k₀ = (N − Σnⱼ²/N)/(g−1);
    // ICC = (MSB−MSW)/(MSB+(k₀−1)MSW). Group moments are exact; the
    // per-user sⱼ²/nⱼ term is MICRO-quantized (×1e6) before the fold
    // so the between-groups sum is an exact integer, never a
    // cross-row double sum; Σnⱼ² rides DECIMAL(38,0).
    "q_agg_icc" -> ((s, d) => {
      val per = Tables.events(s, d)
        .select(col("user_id"),
          (dec(col("value")) * 100).cast("long").as("x"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("nj"), sum(col("x")).as("sj"),
          sum(col("x").cast(Big) * col("x").cast(Big)).as("ssj"))
      val m = per.agg(count(lit(1)).as("g"), sum(col("nj")).as("nn"),
        sum(col("sj")).as("s"), sum(col("ssj")).as("ss"),
        sum(col("nj").cast(Big) * col("nj").cast(Big)).as("snj2"),
        sum(round((col("sj").cast(Big) * col("sj").cast(Big))
          .cast("double") / col("nj").cast("double") * 1e6)
          .cast(Big)).as("ssb_micro"))
      val nD = col("nn").cast("double")
      val gD = col("g").cast("double")
      val ssbRaw = col("ssb_micro").cast("double") / 1e6
      val ssb = ssbRaw -
        col("s").cast("double") * col("s").cast("double") / nD
      val ssw = col("ss").cast("double") - ssbRaw
      val msb = ssb / (gD - 1)
      val msw = ssw / (nD - gD)
      val k0 = (nD - col("snj2").cast("double") / nD) / (gD - 1)
      m.select(col("g").as("n_users"), col("nn").as("n_events"),
        r6(msb / 100 / 100).as("msb_dollars2"),
        r6(msw / 100 / 100).as("msw_dollars2"),
        r6((msb - msw) / (msb + (k0 - 1) * msw)).as("icc1"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_adf_lag1" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            sp0 AS (SELECT dt, y, lag(y, 1) OVER (ORDER BY dt) AS y1
                    FROM daily),
            sp1 AS (SELECT dt, y - y1 AS dy, y1,
                      lag(y - y1, 1) OVER (ORDER BY dt) AS dy1
                    FROM sp0),
            sp AS (SELECT dy AS yy, y1 AS x1, dy1 AS x2 FROM sp1
                   WHERE y1 IS NOT NULL AND dy1 IS NOT NULL),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x1) AS BIGINT) AS sx1,
                    CAST(SUM(x2) AS BIGINT) AS sx2,
                    CAST(SUM(yy) AS BIGINT) AS sy,
                    SUM(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT)) AS s11,
                    SUM(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s22,
                    SUM(CAST(x1 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s12,
                    SUM(CAST(x1 AS HUGEINT) * CAST(yy AS HUGEINT)) AS s1y,
                    SUM(CAST(x2 AS HUGEINT) * CAST(yy AS HUGEINT)) AS s2y,
                    SUM(CAST(yy AS HUGEINT) * CAST(yy AS HUGEINT)) AS syy
                  FROM sp),
            e AS (SELECT n,
                    CAST(CAST(n AS HUGEINT) * s11 - CAST(sx1 AS HUGEINT)
                      * CAST(sx1 AS HUGEINT) AS DOUBLE) AS a11,
                    CAST(CAST(n AS HUGEINT) * s22 - CAST(sx2 AS HUGEINT)
                      * CAST(sx2 AS HUGEINT) AS DOUBLE) AS a22,
                    CAST(CAST(n AS HUGEINT) * s12 - CAST(sx1 AS HUGEINT)
                      * CAST(sx2 AS HUGEINT) AS DOUBLE) AS a12,
                    CAST(CAST(n AS HUGEINT) * s1y - CAST(sx1 AS HUGEINT)
                      * CAST(sy AS HUGEINT) AS DOUBLE) AS c1,
                    CAST(CAST(n AS HUGEINT) * s2y - CAST(sx2 AS HUGEINT)
                      * CAST(sy AS HUGEINT) AS DOUBLE) AS c2,
                    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT)
                      * CAST(sy AS HUGEINT) AS DOUBLE) AS cyy
                  FROM m),
            f AS (SELECT n, a11, a22, a12, c1, c2, cyy,
                    a11 * a22 - a12 * a12 AS det,
                    (a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12) AS g,
                    (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) AS del
                  FROM e)
         SELECT n AS n_obs, round(g, 6) AS gamma,
                round(del, 6) AS delta_lag,
                round(g / sqrt((cyy - g * c1 - del * c2)
                    / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 3)
                    * CAST(n AS DOUBLE) * a22 / det), 6) AS t_adf
         FROM f""",

    "q_agg_partial_corr" ->
      """WITH base AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y,
                    CAST(CAST(l_discount AS DECIMAL(18,2)) * 10000
                      AS BIGINT) AS z
                 FROM lineitem),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    CAST(SUM(z) AS BIGINT) AS sz,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
                    SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS szz,
                    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                    SUM(CAST(x AS HUGEINT) * CAST(z AS HUGEINT)) AS sxz,
                    SUM(CAST(y AS HUGEINT) * CAST(z AS HUGEINT)) AS syz
                  FROM base),
            e AS (SELECT n,
                    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT)
                        * CAST(sy AS HUGEINT) AS DOUBLE)
                      / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                          - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                          AS DOUBLE)
                        * CAST(CAST(n AS HUGEINT) * syy
                          - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                          AS DOUBLE)) AS rxy,
                    CAST(CAST(n AS HUGEINT) * sxz - CAST(sx AS HUGEINT)
                        * CAST(sz AS HUGEINT) AS DOUBLE)
                      / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                          - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                          AS DOUBLE)
                        * CAST(CAST(n AS HUGEINT) * szz
                          - CAST(sz AS HUGEINT) * CAST(sz AS HUGEINT)
                          AS DOUBLE)) AS rxz,
                    CAST(CAST(n AS HUGEINT) * syz - CAST(sy AS HUGEINT)
                        * CAST(sz AS HUGEINT) AS DOUBLE)
                      / sqrt(CAST(CAST(n AS HUGEINT) * syy
                          - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                          AS DOUBLE)
                        * CAST(CAST(n AS HUGEINT) * szz
                          - CAST(sz AS HUGEINT) * CAST(sz AS HUGEINT)
                          AS DOUBLE)) AS ryz
                  FROM m)
         SELECT n AS n_rows, round(rxy, 6) AS r_xy,
                round(rxz, 6) AS r_xz, round(ryz, 6) AS r_yz,
                round((rxy - rxz * ryz)
                  / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
                  AS partial_r
         FROM e""",

    "q_agg_cronbach_alpha" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val conds = types.zipWithIndex.map { case (t, i) =>
        s"""CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)
            AS BIGINT) AS c${i + 1}"""
      }.mkString(", ")
      val sums = (1 to 5).map(i =>
        s"""CAST(SUM(c$i) AS BIGINT) AS s$i,
            SUM(CAST(c$i AS HUGEINT) * CAST(c$i AS HUGEINT)) AS ss$i""")
        .mkString(", ")
      def sv(ss: String, s1: String) =
        s"""CAST(CAST(n AS HUGEINT) * $ss - CAST($s1 AS HUGEINT)
              * CAST($s1 AS HUGEINT) AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"""
      val sumItems = (1 to 5).map(i => s"(${sv(s"ss$i", s"s$i")})")
        .mkString(" + ")
      s"""WITH per AS (SELECT user_id, $conds
                 FROM events GROUP BY 1),
            tot AS (SELECT user_id, c1, c2, c3, c4, c5,
                      c1 + c2 + c3 + c4 + c5 AS tt FROM per),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, $sums,
                    CAST(SUM(tt) AS BIGINT) AS st,
                    SUM(CAST(tt AS HUGEINT) * CAST(tt AS HUGEINT)) AS sst
                  FROM tot)
         SELECT n AS n_users,
                round($sumItems, 6) AS sum_item_var,
                round(${sv("sst", "st")}, 6) AS total_var,
                round(1.25 * (1.0 - ($sumItems) / (${sv("sst", "st")})), 6)
                  AS cronbach_alpha
         FROM m"""
    },

    "q_agg_icc" ->
      """WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nj,
                    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS sj,
                    SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS HUGEINT)
                      * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS HUGEINT)) AS ssj
                 FROM events GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
                    CAST(SUM(nj) AS BIGINT) AS nn,
                    CAST(SUM(sj) AS BIGINT) AS s,
                    SUM(ssj) AS ss,
                    SUM(CAST(nj AS HUGEINT) * CAST(nj AS HUGEINT)) AS snj2,
                    SUM(CAST(round(CAST(CAST(sj AS HUGEINT)
                        * CAST(sj AS HUGEINT) AS DOUBLE)
                      / CAST(nj AS DOUBLE) * 1e6) AS HUGEINT)) AS ssb_micro
                  FROM per),
            e AS (SELECT g, nn, snj2,
                    CAST(ssb_micro AS DOUBLE) / 1e6
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(nn AS DOUBLE) AS ssb,
                    CAST(ss AS DOUBLE)
                      - CAST(ssb_micro AS DOUBLE) / 1e6 AS ssw
                  FROM m),
            f AS (SELECT g, nn,
                    ssb / (CAST(g AS DOUBLE) - 1) AS msb,
                    ssw / (CAST(nn AS DOUBLE) - CAST(g AS DOUBLE)) AS msw,
                    (CAST(nn AS DOUBLE) - CAST(snj2 AS DOUBLE)
                      / CAST(nn AS DOUBLE)) / (CAST(g AS DOUBLE) - 1)
                      AS k0
                  FROM e)
         SELECT g AS n_users, nn AS n_events,
                round(msb / 100 / 100, 6) AS msb_dollars2,
                round(msw / 100 / 100, 6) AS msw_dollars2,
                round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
         FROM f"""
  )
}
