package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 31: multivariate-statistics round-out —
  * Mahalanobis outlier days on the (revenue, order-count) plane,
  * two-sample Hotelling's T² and Box's M (covariance equality) on the
  * (quantity, price) plane between returned and kept lineitems, and
  * the Fisher linear-discriminant axis for the same two classes.
  *
  * Scale shape: every operator folds its fact table once into exact
  * first/second moments (count/sum/sum-of-products — one partial+final
  * aggregate); the 2×2 inverses/determinants are closed-form adjugate
  * algebra on the driver-free aggregate row. Mahalanobis re-joins the
  * bounded day spine against the broadcast moment row.
  *
  * Determinism contract (SURVEY §2.13): all cross-moments are exact
  * DECIMAL(38,0); each statistic is ONE fixed-shape IEEE chain
  * (adjugate inverse, never iterative); the Mahalanobis top-10 orders
  * by the ROUNDED distance with the date as tiebreak.
  */
object Extras105 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Exact 2-class first/second moments of (quantity, price-cents) for
    * returned (R) vs kept (N) lineitems, one row per class. */
  private def classMoments(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_returnflag").isin("R", "N"))
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("x"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))

  /** (n, mean x, mean y, sample cov a/b/c) as double columns with a
    * per-class prefix. */
  private def covCols(p: String): Seq[Column] = {
    val n = col(s"${p}n").cast("double")
    val mx = col(s"${p}sx").cast("double") / n
    val my = col(s"${p}sy").cast("double") / n
    val vxx = (col(s"${p}sxx").cast("double") -
      col(s"${p}sx").cast("double") * col(s"${p}sx").cast("double") / n) /
      (n - 1)
    val vxy = (col(s"${p}sxy").cast("double") -
      col(s"${p}sx").cast("double") * col(s"${p}sy").cast("double") / n) /
      (n - 1)
    val vyy = (col(s"${p}syy").cast("double") -
      col(s"${p}sy").cast("double") * col(s"${p}sy").cast("double") / n) /
      (n - 1)
    Seq(n.as(s"${p}nd"), mx.as(s"${p}mx"), my.as(s"${p}my"),
      vxx.as(s"${p}vxx"), vxy.as(s"${p}vxy"), vyy.as(s"${p}vyy"))
  }

  private def twoClass(s: SparkSession, d: String): DataFrame = {
    val m = classMoments(s, d)
    val r = m.where(col("g") === "R").select(col("n").as("rn"),
      col("sx").as("rsx"), col("sy").as("rsy"), col("sxx").as("rsxx"),
      col("sxy").as("rsxy"), col("syy").as("rsyy"))
    val nn = m.where(col("g") === "N").select(col("n").as("nn"),
      col("sx").as("nsx"), col("sy").as("nsy"), col("sxx").as("nsxx"),
      col("sxy").as("nsxy"), col("syy").as("nsyy"))
    r.crossJoin(broadcast(nn))
      .select(col("rn") +: col("nn") +:
        (covCols("r") ++ covCols("n")): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MAHALANOBIS OUTLIER DAYS — top-10 days by squared Mahalanobis
    // distance of (daily revenue, daily order count) from the global
    // mean under the sample covariance (adjugate inverse).
    "q_agg_mahalanobis" -> ((s, d) => {
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"),
          count(lit(1)).as("y"))
      val m = byday.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      val nD = col("n").cast("double")
      val mx = col("sx").cast("double") / nD
      val my = col("sy").cast("double") / nD
      val a = (col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / nD) / (nD - 1)
      val b = (col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") / nD) / (nD - 1)
      val c = (col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double") / nD) / (nD - 1)
      val stats = m.select(mx.as("mx"), my.as("my"), a.as("va"),
        b.as("vb"), c.as("vc"))
      val dx = col("x").cast("double") - col("mx")
      val dy = col("y").cast("double") - col("my")
      val det = col("va") * col("vc") - col("vb") * col("vb")
      val d2 = (dx * dx * col("vc") - dx * dy * col("vb") * 2
        + dy * dy * col("va")) / det
      byday.crossJoin(broadcast(stats))
        .select(col("dt"), col("y").as("n_orders"), r6(d2).as("maha_d2"))
        .orderBy(col("maha_d2").desc, col("dt"))
        .limit(10)
    }),

    // HOTELLING'S T² — two-sample test on the (quantity, price) mean
    // vectors of returned vs kept lineitems with the pooled
    // covariance: T² = (n₁n₂/N)·δᵀ S⁻¹ δ, F = (N−3)/(2(N−2))·T².
    "q_agg_hotelling_t2" -> ((s, d) => {
      val t = twoClass(s, d)
      val n1 = col("rnd")
      val n2 = col("nnd")
      val bigN = n1 + n2
      def pool(p: String) = (col(s"r$p") * (n1 - 1) +
        col(s"n$p") * (n2 - 1)) / (bigN - 2)
      val pa = pool("vxx")
      val pb = pool("vxy")
      val pc = pool("vyy")
      val dx = col("rmx") - col("nmx")
      val dy = col("rmy") - col("nmy")
      val det = pa * pc - pb * pb
      val t2 = n1 * n2 / bigN *
        (dx * dx * pc - dx * dy * pb * 2 + dy * dy * pa) / det
      t.select(col("rn").as("n_returned"), col("nn").as("n_kept"),
        r6(t2).as("t2"),
        r6(t2 * (bigN - 3) / ((bigN - 2) * 2)).as("f_stat"))
    }),

    // BOX'S M — covariance-equality test for the same two classes:
    // M = (N−2)ln|S_pool| − Σ(nᵢ−1)ln|Sᵢ|, with the standard
    // small-sample correction factor c₁ for p=2, k=2.
    "q_agg_box_m" -> ((s, d) => {
      val t = twoClass(s, d)
      val n1 = col("rnd")
      val n2 = col("nnd")
      val bigN = n1 + n2
      def pool(p: String) = (col(s"r$p") * (n1 - 1) +
        col(s"n$p") * (n2 - 1)) / (bigN - 2)
      val detP = pool("vxx") * pool("vyy") - pool("vxy") * pool("vxy")
      val det1 = col("rvxx") * col("rvyy") - col("rvxy") * col("rvxy")
      val det2 = col("nvxx") * col("nvyy") - col("nvxy") * col("nvxy")
      val mStat = (bigN - 2) * log(detP) -
        ((n1 - 1) * log(det1) + (n2 - 1) * log(det2))
      // c1 = (2p²+3p−1)/(6(p+1)(k−1)) · (Σ1/(nᵢ−1) − 1/(N−k)), p=2 k=2
      val c1 = lit(13.0 / 18.0) *
        (lit(1.0) / (n1 - 1) + lit(1.0) / (n2 - 1) - lit(1.0) / (bigN - 2))
      t.select(col("rn").as("n_returned"), col("nn").as("n_kept"),
        r6(mStat).as("box_m"),
        r6(mStat * (lit(1.0) - c1)).as("chi2_approx"))
    }),

    // FISHER LDA AXIS — w ∝ S_w⁻¹(μ_R − μ_N) for the two classes,
    // normalized to unit x-component sign convention; the separation
    // is the between/within variance ratio along w.
    "q_agg_lda_axis" -> ((s, d) => {
      val t = twoClass(s, d)
      val n1 = col("rnd")
      val n2 = col("nnd")
      def sw(p: String) = col(s"r$p") * (n1 - 1) + col(s"n$p") * (n2 - 1)
      val sa = sw("vxx")
      val sb = sw("vxy")
      val sc = sw("vyy")
      val dx = col("rmx") - col("nmx")
      val dy = col("rmy") - col("nmy")
      val det = sa * sc - sb * sb
      val wx = (sc * dx - sb * dy) / det
      val wy = (sa * dy - sb * dx) / det
      val sep = wx * dx + wy * dy
      t.select(col("rn").as("n_returned"), col("nn").as("n_kept"),
        r6(wy / wx).as("axis_slope"), r6(sep).as("separation"))
    })
  )

  private val momentsSql =
    """cm AS (SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
           FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT) AS y
                 FROM lineitem WHERE l_returnflag IN ('R', 'N'))
          GROUP BY 1),
       tc AS (SELECT
                r.n AS rn, nn.n AS nn,
                CAST(r.n AS DOUBLE) AS rnd, CAST(nn.n AS DOUBLE) AS nnd,
                CAST(r.sx AS DOUBLE) / CAST(r.n AS DOUBLE) AS rmx,
                CAST(r.sy AS DOUBLE) / CAST(r.n AS DOUBLE) AS rmy,
                (CAST(r.sxx AS DOUBLE) - CAST(r.sx AS DOUBLE)
                  * CAST(r.sx AS DOUBLE) / CAST(r.n AS DOUBLE))
                  / (CAST(r.n AS DOUBLE) - 1) AS rvxx,
                (CAST(r.sxy AS DOUBLE) - CAST(r.sx AS DOUBLE)
                  * CAST(r.sy AS DOUBLE) / CAST(r.n AS DOUBLE))
                  / (CAST(r.n AS DOUBLE) - 1) AS rvxy,
                (CAST(r.syy AS DOUBLE) - CAST(r.sy AS DOUBLE)
                  * CAST(r.sy AS DOUBLE) / CAST(r.n AS DOUBLE))
                  / (CAST(r.n AS DOUBLE) - 1) AS rvyy,
                CAST(nn.sx AS DOUBLE) / CAST(nn.n AS DOUBLE) AS nmx,
                CAST(nn.sy AS DOUBLE) / CAST(nn.n AS DOUBLE) AS nmy,
                (CAST(nn.sxx AS DOUBLE) - CAST(nn.sx AS DOUBLE)
                  * CAST(nn.sx AS DOUBLE) / CAST(nn.n AS DOUBLE))
                  / (CAST(nn.n AS DOUBLE) - 1) AS nvxx,
                (CAST(nn.sxy AS DOUBLE) - CAST(nn.sx AS DOUBLE)
                  * CAST(nn.sy AS DOUBLE) / CAST(nn.n AS DOUBLE))
                  / (CAST(nn.n AS DOUBLE) - 1) AS nvxy,
                (CAST(nn.syy AS DOUBLE) - CAST(nn.sy AS DOUBLE)
                  * CAST(nn.sy AS DOUBLE) / CAST(nn.n AS DOUBLE))
                  / (CAST(nn.n AS DOUBLE) - 1) AS nvyy
              FROM (SELECT * FROM cm WHERE g = 'R') r,
                   (SELECT * FROM cm WHERE g = 'N') nn)"""

  val oracle: Map[String, String] = Map(

    "q_agg_mahalanobis" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS x,
                    CAST(COUNT(*) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
                  FROM byday),
            st AS (SELECT
                    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1) AS va,
                    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1) AS vb,
                    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1) AS vc
                  FROM m)
         SELECT dt, y AS n_orders,
                round(((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)
                    * vc
                  - (CAST(x AS DOUBLE) - mx) * (CAST(y AS DOUBLE) - my)
                    * vb * 2
                  + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my)
                    * va)
                  / (va * vc - vb * vb), 6) AS maha_d2
         FROM byday, st
         ORDER BY maha_d2 DESC, dt LIMIT 10""",

    "q_agg_hotelling_t2" ->
      s"""WITH $momentsSql,
            e AS (SELECT rn, nn, rnd, nnd,
                    (rvxx * (rnd - 1) + nvxx * (nnd - 1))
                      / (rnd + nnd - 2) AS pa,
                    (rvxy * (rnd - 1) + nvxy * (nnd - 1))
                      / (rnd + nnd - 2) AS pb,
                    (rvyy * (rnd - 1) + nvyy * (nnd - 1))
                      / (rnd + nnd - 2) AS pc,
                    rmx - nmx AS dx, rmy - nmy AS dy
                  FROM tc),
            f AS (SELECT rn, nn, rnd, nnd,
                    rnd * nnd / (rnd + nnd)
                      * (dx * dx * pc - dx * dy * pb * 2 + dy * dy * pa)
                      / (pa * pc - pb * pb) AS t2
                  FROM e)
         SELECT rn AS n_returned, nn AS n_kept, round(t2, 6) AS t2,
                round(t2 * (rnd + nnd - 3) / ((rnd + nnd - 2) * 2), 6)
                  AS f_stat
         FROM f""",

    "q_agg_box_m" ->
      s"""WITH $momentsSql,
            e AS (SELECT rn, nn, rnd, nnd,
                    ((rvxx * (rnd - 1) + nvxx * (nnd - 1))
                        / (rnd + nnd - 2))
                      * ((rvyy * (rnd - 1) + nvyy * (nnd - 1))
                        / (rnd + nnd - 2))
                      - ((rvxy * (rnd - 1) + nvxy * (nnd - 1))
                        / (rnd + nnd - 2))
                        * ((rvxy * (rnd - 1) + nvxy * (nnd - 1))
                          / (rnd + nnd - 2)) AS detp,
                    rvxx * rvyy - rvxy * rvxy AS det1,
                    nvxx * nvyy - nvxy * nvxy AS det2
                  FROM tc),
            f AS (SELECT rn, nn, rnd, nnd,
                    (rnd + nnd - 2) * ln(detp)
                      - ((rnd - 1) * ln(det1) + (nnd - 1) * ln(det2))
                      AS mstat,
                    (13.0 / 18.0) * (1.0 / (rnd - 1) + 1.0 / (nnd - 1)
                      - 1.0 / (rnd + nnd - 2)) AS c1
                  FROM e)
         SELECT rn AS n_returned, nn AS n_kept, round(mstat, 6) AS box_m,
                round(mstat * (1.0 - c1), 6) AS chi2_approx
         FROM f""",

    "q_agg_lda_axis" ->
      s"""WITH $momentsSql,
            e AS (SELECT rn, nn,
                    rvxx * (rnd - 1) + nvxx * (nnd - 1) AS sa,
                    rvxy * (rnd - 1) + nvxy * (nnd - 1) AS sb,
                    rvyy * (rnd - 1) + nvyy * (nnd - 1) AS sc,
                    rmx - nmx AS dx, rmy - nmy AS dy
                  FROM tc),
            f AS (SELECT rn, nn, dx, dy,
                    (sc * dx - sb * dy) / (sa * sc - sb * sb) AS wx,
                    (sa * dy - sb * dx) / (sa * sc - sb * sb) AS wy
                  FROM e)
         SELECT rn AS n_returned, nn AS n_kept,
                round(wy / wx, 6) AS axis_slope,
                round(wx * dx + wy * dy, 6) AS separation
         FROM f"""
  )
}
