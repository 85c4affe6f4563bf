package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 18: estimation round-out —
  * capture-recapture population estimation from the two calendar
  * halves of the event stream, TOST equivalence testing between the
  * URGENT/LOW order groups, the two-sample Poisson rate test on
  * purchase counts, and closed-form ridge regression on two lineitem
  * features.
  *
  * Determinism contract (SURVEY §2.13): every count/moment is an
  * exact integer (DECIMAL(38,0) for products); each estimator is one
  * fixed-shape IEEE chain over named scalars; the ridge normal
  * equations invert a 2×2 exactly via adjugate/determinant.
  */
object Extras92 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CAPTURE-RECAPTURE — users seen in the first calendar half (n1),
    // the second (n2), and both (m): Lincoln-Petersen N̂ = n1·n2/m and
    // the bias-corrected Chapman estimator with its variance. The
    // population-size estimate behind "how many distinct users does
    // this stream really have" when each half is a capture occasion.
    "q_agg_capture_recapture" -> ((s, d) => {
      val span = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).as("dmin"),
          max(to_date(col("ts"))).as("dmax"))
      val per = Tables.events(s, d).crossJoin(broadcast(span))
        .select(col("user_id"),
          (datediff(to_date(col("ts")), col("dmin")) * 2
            <= datediff(col("dmax"), col("dmin"))).cast("int").as("early"))
        .groupBy(col("user_id"))
        .agg(max(col("early")).as("h1"),
          max(lit(1) - col("early")).as("h2"))
      val a = per.agg(
        sum(col("h1").cast("long")).as("n1"),
        sum(col("h2").cast("long")).as("n2"),
        sum((col("h1") === 1 && col("h2") === 1).cast("long")).as("m"),
        count(lit(1)).as("n_users"))
      def d1(c: String) = col(c).cast("double")
      val chap = (d1("n1") + 1) * (d1("n2") + 1) / (d1("m") + 1) - 1
      val varc = (d1("n1") + 1) * (d1("n2") + 1) *
        (d1("n1") - d1("m")) * (d1("n2") - d1("m")) /
        ((d1("m") + 1) * (d1("m") + 1) * (d1("m") + 2))
      a.select(col("n1"), col("n2"), col("m"), col("n_users"),
        r6((col("n1").cast(Big) * col("n2").cast(Big)).cast("double")
          / d1("m")).as("lincoln_petersen"),
        r6(chap).as("chapman"),
        r6(sqrt(varc)).as("chapman_se"))
    }),

    // TOST EQUIVALENCE — are URGENT and LOW order means equivalent
    // within ±1% of the pooled mean? Two one-sided Welch t statistics
    // against the ±δ bounds; equivalent iff both reject at z=1.645.
    "q_agg_tost_equivalence" -> ((s, d) => {
      val a = Tables.orders(s, d)
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderpriority").as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("x"))
        .agg(
          sum((col("g") === "1-URGENT").cast("long")).as("n1"),
          sum(when(col("g") === "1-URGENT", col("x"))).as("s1"),
          sum(when(col("g") === "1-URGENT",
            col("x").cast(Big) * col("x").cast(Big))).as("ss1"),
          sum((col("g") === "5-LOW").cast("long")).as("n2"),
          sum(when(col("g") === "5-LOW", col("x"))).as("s2"),
          sum(when(col("g") === "5-LOW",
            col("x").cast(Big) * col("x").cast(Big))).as("ss2"))
      def m(i: Int) = col(s"s$i").cast("double") / col(s"n$i").cast("double")
      def vn(i: Int) = (col(s"n$i").cast(Big) * col(s"ss$i")
        - col(s"s$i").cast(Big) * col(s"s$i").cast(Big)).cast("double") /
        (col(s"n$i").cast("double") * (col(s"n$i") - 1).cast("double")) /
        col(s"n$i").cast("double")
      val se = sqrt(vn(1) + vn(2))
      val delta = (col("s1") + col("s2")).cast("double") /
        (col("n1") + col("n2")).cast("double") * 0.01
      val tl = (m(1) - m(2) + delta) / se
      val tu = (m(1) - m(2) - delta) / se
      a.select(col("n1"), col("n2"),
        r6(delta / 100).as("delta_dollars"),
        r6(tl).as("t_lower"), r6(tu).as("t_upper"),
        (tl > 1.645 && tu < -1.645).cast("long").as("equivalent"))
    }),

    // POISSON RATE TEST — purchase counts vs exposure days across the
    // two calendar halves (first half gets the extra day when the span
    // is odd): the conditional binomial z on c1 given c1+c2.
    "q_agg_poisson_rate_test" -> ((s, d) => {
      val span = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).as("dmin"),
          max(to_date(col("ts"))).as("dmax"))
      val a = Tables.events(s, d).crossJoin(broadcast(span))
        .where(col("event_type") === "purchase")
        .select(
          (datediff(to_date(col("ts")), col("dmin")) * 2
            <= datediff(col("dmax"), col("dmin"))).cast("long").as("early"),
          (datediff(col("dmax"), col("dmin")) + 1).as("span_days"))
        .agg(sum(col("early")).as("c1"),
          sum(lit(1L) - col("early")).as("c2"),
          max(col("span_days")).as("sd"))
        .select(col("c1"), col("c2"),
          expr("CAST((sd + 1) div 2 AS BIGINT)").as("d1"),
          expr("CAST(sd - (sd + 1) div 2 AS BIGINT)").as("d2"))
      val p = col("d1").cast("double") /
        (col("d1") + col("d2")).cast("double")
      val en = (col("c1") + col("c2")).cast("double") * p
      val z = (col("c1").cast("double") - en) /
        sqrt((col("c1") + col("c2")).cast("double") * p * (lit(1.0) - p))
      a.select(col("c1"), col("c2"), col("d1"), col("d2"),
        r6((col("c1").cast("double") / col("d1").cast("double"))
          / (col("c2").cast("double") / col("d2").cast("double")))
          .as("rate_ratio"),
        r6(z).as("z_stat"))
    }),

    // RIDGE REGRESSION (2 features, closed form) — price cents on
    // (quantity, discount bps) with λ on the centered Gram: the 2×2
    // (A+λI) inverts exactly via adjugate/determinant over exact
    // DECIMAL moments; coefficients and intercept are one chain.
    "q_agg_ridge2" -> ((s, d) => {
      val lam = 1e6
      val base = Tables.lineitem(s, d).select(
        col("l_quantity").cast("long").as("x1"),
        (dec(col("l_discount")) * 10000).cast("long").as("x2"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("y"))
      val a = base.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(col("y")).as("sy"),
        sum(col("x1").cast(Big) * col("x1").cast(Big)).as("s11"),
        sum(col("x2").cast(Big) * col("x2").cast(Big)).as("s22"),
        sum(col("x1").cast(Big) * col("x2").cast(Big)).as("s12"),
        sum(col("x1").cast(Big) * col("y").cast(Big)).as("s1y"),
        sum(col("x2").cast(Big) * col("y").cast(Big)).as("s2y"))
      val nD = col("n").cast("double")
      def c2(a1: String, a2: String, b1: String, b2: String) =
        (col("n").cast(Big) * col(a1) - col(b1).cast(Big)
          * col(b2).cast(Big)).cast("double") / nD
      val a11 = c2("s11", "", "sx1", "sx1") + lit(lam)
      val a22 = c2("s22", "", "sx2", "sx2") + lit(lam)
      val a12 = c2("s12", "", "sx1", "sx2")
      val c1y = c2("s1y", "", "sx1", "sy")
      val c2y = c2("s2y", "", "sx2", "sy")
      val det = a11 * a22 - a12 * a12
      val b1 = (a22 * c1y - a12 * c2y) / det
      val b2 = (a11 * c2y - a12 * c1y) / det
      val b0 = (col("sy").cast("double") - b1 * col("sx1").cast("double")
        - b2 * col("sx2").cast("double")) / nD
      a.select(col("n").as("n_rows"), r6(b1).as("beta_qty"),
        r6(b2).as("beta_disc"), r6(b0 / 100).as("intercept_dollars"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_capture_recapture" ->
      """WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS dmin,
                    MAX(CAST(ts AS DATE)) AS dmax FROM events),
            per AS (SELECT user_id,
                      MAX(CASE WHEN (CAST(ts AS DATE) - dmin) * 2
                            <= (dmax - dmin) THEN 1 ELSE 0 END) AS h1,
                      MAX(CASE WHEN (CAST(ts AS DATE) - dmin) * 2
                            > (dmax - dmin) THEN 1 ELSE 0 END) AS h2
                    FROM events, span GROUP BY 1),
            a AS (SELECT CAST(SUM(h1) AS BIGINT) AS n1,
                    CAST(SUM(h2) AS BIGINT) AS n2,
                    CAST(SUM(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS m,
                    CAST(COUNT(*) AS BIGINT) AS n_users
                  FROM per)
         SELECT n1, n2, m, n_users,
                round(CAST(CAST(n1 AS HUGEINT) * CAST(n2 AS HUGEINT)
                    AS DOUBLE) / CAST(m AS DOUBLE), 6) AS lincoln_petersen,
                round((CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)
                  / (CAST(m AS DOUBLE) + 1) - 1, 6) AS chapman,
                round(sqrt((CAST(n1 AS DOUBLE) + 1)
                  * (CAST(n2 AS DOUBLE) + 1)
                  * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
                  * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
                  / ((CAST(m AS DOUBLE) + 1) * (CAST(m AS DOUBLE) + 1)
                    * (CAST(m AS DOUBLE) + 2))), 6) AS chapman_se
         FROM a""",

    "q_agg_tost_equivalence" ->
      """WITH r AS (SELECT o_orderpriority AS g,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS x
                 FROM orders
                 WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
            a AS (SELECT
                    CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                    CAST(SUM(CASE WHEN g = '1-URGENT' THEN x END)
                      AS BIGINT) AS s1,
                    SUM(CASE WHEN g = '1-URGENT' THEN
                      CAST(x AS HUGEINT) * CAST(x AS HUGEINT) END) AS ss1,
                    CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                    CAST(SUM(CASE WHEN g = '5-LOW' THEN x END)
                      AS BIGINT) AS s2,
                    SUM(CASE WHEN g = '5-LOW' THEN
                      CAST(x AS HUGEINT) * CAST(x AS HUGEINT) END) AS ss2
                  FROM r),
            e AS (SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                    sqrt(CAST(CAST(n1 AS HUGEINT) * ss1
                        - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
                        AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
                      / CAST(n1 AS DOUBLE)
                      + CAST(CAST(n2 AS HUGEINT) * ss2
                        - CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT)
                        AS DOUBLE)
                      / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))
                      / CAST(n2 AS DOUBLE)) AS se,
                    CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                      * 0.01 AS delta
                  FROM a)
         SELECT n1, n2, round(delta / 100, 6) AS delta_dollars,
                round((m1 - m2 + delta) / se, 6) AS t_lower,
                round((m1 - m2 - delta) / se, 6) AS t_upper,
                CAST(CASE WHEN (m1 - m2 + delta) / se > 1.645
                       AND (m1 - m2 - delta) / se < -1.645
                     THEN 1 ELSE 0 END AS BIGINT) AS equivalent
         FROM e""",

    "q_agg_poisson_rate_test" ->
      """WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS dmin,
                    MAX(CAST(ts AS DATE)) AS dmax FROM events),
            a AS (SELECT
                    CAST(SUM(CASE WHEN (CAST(ts AS DATE) - dmin) * 2
                          <= (dmax - dmin) THEN 1 ELSE 0 END) AS BIGINT)
                      AS c1,
                    CAST(SUM(CASE WHEN (CAST(ts AS DATE) - dmin) * 2
                          > (dmax - dmin) THEN 1 ELSE 0 END) AS BIGINT)
                      AS c2,
                    CAST(MAX(dmax - dmin + 1) AS BIGINT) AS sd
                  FROM events, span
                  WHERE event_type = 'purchase'),
            b AS (SELECT c1, c2,
                    CAST((sd + 1) // 2 AS BIGINT) AS d1,
                    CAST(sd - (sd + 1) // 2 AS BIGINT) AS d2
                  FROM a),
            e AS (SELECT c1, c2, d1, d2,
                    CAST(d1 AS DOUBLE) / CAST(d1 + d2 AS DOUBLE) AS p
                  FROM b)
         SELECT c1, c2, d1, d2,
                round((CAST(c1 AS DOUBLE) / CAST(d1 AS DOUBLE))
                  / (CAST(c2 AS DOUBLE) / CAST(d2 AS DOUBLE)), 6)
                  AS rate_ratio,
                round((CAST(c1 AS DOUBLE) - CAST(c1 + c2 AS DOUBLE) * p)
                  / sqrt(CAST(c1 + c2 AS DOUBLE) * p * (1.0 - p)), 6)
                  AS z_stat
         FROM e""",

    "q_agg_ridge2" ->
      """WITH base AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
                    CAST(CAST(l_discount AS DECIMAL(18,2)) * 10000
                      AS BIGINT) AS x2,
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y
                 FROM lineitem),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x1) AS BIGINT) AS sx1,
                    CAST(SUM(x2) AS BIGINT) AS sx2,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT)) AS s11,
                    SUM(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s22,
                    SUM(CAST(x1 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s12,
                    SUM(CAST(x1 AS HUGEINT) * CAST(y AS HUGEINT)) AS s1y,
                    SUM(CAST(x2 AS HUGEINT) * CAST(y AS HUGEINT)) AS s2y
                  FROM base),
            e AS (SELECT n, sx1, sx2, sy,
                    CAST(CAST(n AS HUGEINT) * s11 - CAST(sx1 AS HUGEINT)
                      * CAST(sx1 AS HUGEINT) AS DOUBLE)
                      / CAST(n AS DOUBLE) + 1000000.0 AS a11,
                    CAST(CAST(n AS HUGEINT) * s22 - CAST(sx2 AS HUGEINT)
                      * CAST(sx2 AS HUGEINT) AS DOUBLE)
                      / CAST(n AS DOUBLE) + 1000000.0 AS a22,
                    CAST(CAST(n AS HUGEINT) * s12 - CAST(sx1 AS HUGEINT)
                      * CAST(sx2 AS HUGEINT) AS DOUBLE)
                      / CAST(n AS DOUBLE) AS a12,
                    CAST(CAST(n AS HUGEINT) * s1y - CAST(sx1 AS HUGEINT)
                      * CAST(sy AS HUGEINT) AS DOUBLE)
                      / CAST(n AS DOUBLE) AS c1y,
                    CAST(CAST(n AS HUGEINT) * s2y - CAST(sx2 AS HUGEINT)
                      * CAST(sy AS HUGEINT) AS DOUBLE)
                      / CAST(n AS DOUBLE) AS c2y
                  FROM a),
            f AS (SELECT n, sx1, sx2, sy,
                    (a22 * c1y - a12 * c2y) / (a11 * a22 - a12 * a12)
                      AS b1,
                    (a11 * c2y - a12 * c1y) / (a11 * a22 - a12 * a12)
                      AS b2
                  FROM e)
         SELECT n AS n_rows, round(b1, 6) AS beta_qty,
                round(b2, 6) AS beta_disc,
                round((CAST(sy AS DOUBLE) - b1 * CAST(sx1 AS DOUBLE)
                  - b2 * CAST(sx2 AS DOUBLE)) / CAST(n AS DOUBLE) / 100, 6)
                  AS intercept_dollars
         FROM f"""
  )
}
