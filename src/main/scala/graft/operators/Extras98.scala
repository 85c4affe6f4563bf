package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 24: distribution-comparison round-out —
  * the Brunner-Munzel heteroscedastic rank test and the two-sample
  * Cramér-von Mises ECDF distance (returned vs kept quantities), and
  * the D'Agostino-Pearson K² normality omnibus on the quantity
  * distribution.
  *
  * Scale note: the two rank tests fold the fact table once into the
  * ≤50-value quantity spine and do all rank algebra there; K² needs
  * only the four raw power sums. Nothing is quadratic in rows.
  *
  * Determinism contract (SURVEY §2.13): midranks are carried DOUBLED
  * (exact integers); rank-sum/deviation folds are exact
  * DECIMAL(38,0); each z/statistic is ONE fixed-shape IEEE chain
  * (ln/sqrt/cbrt shared verbatim with the oracle).
  */
object Extras98 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Per-quantity-value counts for returned (R) vs kept (N) rows, with
    * cumulative-before counts: the shared rank spine. */
  private def spine(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .where(col("l_returnflag").isin("R", "N"))
      .select(col("l_quantity").cast("long").as("v"),
        (col("l_returnflag") === "R").cast("long").as("g1"))
    val per = base.groupBy(col("v"))
      .agg(sum(col("g1")).as("c1"),
        sum(lit(1) - col("g1")).as("c2"))
      .withColumn("c", col("c1") + col("c2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cb", sum(col("c")).over(w) - col("c"))
      .withColumn("cb1", sum(col("c1")).over(w) - col("c1"))
      .withColumn("cb2", sum(col("c2")).over(w) - col("c2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BRUNNER-MUNZEL — rank test without equal-variance assumptions:
    // doubled combined/internal midranks m₂ = 2·cb + c + 1 keep every
    // rank integer; σ̂ᵢ² = (S2ᵢ − S1ᵢ²/nᵢ)/(4(nᵢ−1)) off the exact
    // Δ = m₂ − m₂ⁱⁿᵗ fold; W = n₁n₂(R̄₂−R̄₁)/(N√(n₁σ̂₁²+n₂σ̂₂²)).
    "q_agg_brunner_munzel" -> ((s, d) => {
      val sp = spine(s, d)
        .withColumn("m2", lit(2) * col("cb") + col("c") + 1)
        .withColumn("d1",
          col("m2") - (lit(2) * col("cb1") + col("c1") + 1))
        .withColumn("d2",
          col("m2") - (lit(2) * col("cb2") + col("c2") + 1))
      val m = sp.agg(
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1").cast(Big) * col("m2").cast(Big)).as("t1"),
        sum(col("c2").cast(Big) * col("m2").cast(Big)).as("t2"),
        sum(col("c1").cast(Big) * col("d1").cast(Big)).as("s11"),
        sum(col("c1").cast(Big) * col("d1").cast(Big)
          * col("d1").cast(Big)).as("s21"),
        sum(col("c2").cast(Big) * col("d2").cast(Big)).as("s12"),
        sum(col("c2").cast(Big) * col("d2").cast(Big)
          * col("d2").cast(Big)).as("s22"))
      val n1 = col("n1").cast("double")
      val n2 = col("n2").cast("double")
      val r1 = col("t1").cast("double") / n1 / 2
      val r2 = col("t2").cast("double") / n2 / 2
      val v1 = (col("s21").cast("double")
        - col("s11").cast("double") * col("s11").cast("double") / n1) /
        (n1 - 1) / 4
      val v2 = (col("s22").cast("double")
        - col("s12").cast("double") * col("s12").cast("double") / n2) /
        (n2 - 1) / 4
      m.select(col("n1").as("n_returned"), col("n2").as("n_kept"),
        r6((r2 - (n2 + 1) / 2) / n1).as("p_hat"),
        r6(n1 * n2 * (r2 - r1) / (n1 + n2) /
          sqrt(n1 * v1 + n2 * v2)).as("w_bm"))
    }),

    // CRAMÉR-VON MISES (two-sample, tie-aware ECDF form) —
    // T = Σ_v c(v)·(C₁(v)n₂ − C₂(v)n₁)² / (n₁n₂N²): the squared ECDF
    // gap integrated over the pooled sample, all-integer numerators.
    "q_agg_cramer_von_mises" -> ((s, d) => {
      val sp = spine(s, d)
        .withColumn("cc1", col("cb1") + col("c1"))
        .withColumn("cc2", col("cb2") + col("c2"))
      val tot = sp.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val m = sp.crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          (col("cc1").cast(Big) * col("n2").cast(Big)
            - col("cc2").cast(Big) * col("n1").cast(Big)).as("gap"),
          col("c"))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(col("c").cast(Big) * col("gap") * col("gap")).as("sg"))
      val nD = (col("n1") + col("n2")).cast("double")
      m.select(col("n1").as("n_returned"), col("n2").as("n_kept"),
        r6(col("sg").cast("double") / col("n1").cast("double") /
          col("n2").cast("double") / nD / nD).as("t_cvm"))
    }),

    // D'AGOSTINO-PEARSON K² — skewness (D'Agostino 1970) and kurtosis
    // (Anscombe-Glynn 1983) z-transforms from the four exact power
    // sums of quantity; K² = Z₁² + Z₂².
    "q_agg_dagostino_k2" -> ((s, d) => {
      val x = col("v").cast(Big)
      val m = Tables.lineitem(s, d)
        .select(col("l_quantity").cast("long").as("v"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
          sum(x * x).as("s2"), sum(x * x * x).as("s3"),
          sum(x * x * x * x).as("s4"))
      val nD = col("n").cast("double")
      val d1 = col("s1").cast("double")
      val d2 = col("s2").cast("double")
      val d3 = col("s3").cast("double")
      val d4 = col("s4").cast("double")
      val m2 = (d2 - d1 * d1 / nD) / nD
      val m3 = (d3 - lit(3.0) * d1 * d2 / nD
        + lit(2.0) * d1 * d1 * d1 / nD / nD) / nD
      val m4 = (d4 - lit(4.0) * d1 * d3 / nD
        + lit(6.0) * d1 * d1 * d2 / nD / nD
        - lit(3.0) * d1 * d1 * d1 * d1 / nD / nD / nD) / nD
      val g1 = m3 / sqrt(m2 * m2 * m2)
      val y = g1 * sqrt((nD + 1) * (nD + 3) / 6 / (nD - 2))
      val b2 = lit(3.0) * (nD * nD + nD * 27 - 70) * (nD + 1) * (nD + 3) /
        ((nD - 2) * (nD + 5) * (nD + 7) * (nD + 9))
      val w2 = sqrt(lit(2.0) * (b2 - 1)) - 1
      val dl = lit(1.0) / sqrt(log(sqrt(w2)))
      val al = sqrt(lit(2.0) / (w2 - 1))
      val z1 = dl * log(y / al + sqrt(y * y / (al * al) + 1))
      val b2k = m4 / (m2 * m2)
      val eb2 = lit(3.0) * (nD - 1) / (nD + 1)
      val vb2 = lit(24.0) * nD * (nD - 2) * (nD - 3) /
        ((nD + 1) * (nD + 1) * (nD + 3) * (nD + 5))
      val xx = (b2k - eb2) / sqrt(vb2)
      val sb1 = lit(6.0) * (nD * nD - nD * 5 + 2) / ((nD + 7) * (nD + 9)) *
        sqrt(lit(6.0) * (nD + 3) * (nD + 5) / nD / (nD - 2) / (nD - 3))
      val aa = lit(6.0) + lit(8.0) / sb1 *
        (lit(2.0) / sb1 + sqrt(lit(1.0) + lit(4.0) / (sb1 * sb1)))
      val z2 = ((lit(1.0) - lit(2.0) / (aa * 9)) -
        cbrt((lit(1.0) - lit(2.0) / aa) /
          (lit(1.0) + xx * sqrt(lit(2.0) / (aa - 4))))) *
        sqrt(lit(4.5) * aa)
      m.select(col("n").as("n_rows"), r6(z1).as("z_skew"),
        r6(z2).as("z_kurt"), r6(z1 * z1 + z2 * z2).as("k2"))
    })
  )

  private val spineSql =
    """per AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
                CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
           FROM lineitem WHERE l_returnflag IN ('R', 'N')
          GROUP BY 1),
       sp AS (SELECT v, c1, c2, c1 + c2 AS c,
                CAST(SUM(c1 + c2) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - (c1 + c2) AS BIGINT) AS cb,
                CAST(SUM(c1) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - c1 AS BIGINT) AS cb1,
                CAST(SUM(c2) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - c2 AS BIGINT) AS cb2
              FROM per)"""

  val oracle: Map[String, String] = Map(

    "q_agg_brunner_munzel" ->
      s"""WITH $spineSql,
            rk AS (SELECT c1, c2,
                     2 * cb + c + 1 AS m2,
                     2 * cb + c + 1 - (2 * cb1 + c1 + 1) AS d1,
                     2 * cb + c + 1 - (2 * cb2 + c2 + 1) AS d2
                   FROM sp),
            m AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                    CAST(SUM(c2) AS BIGINT) AS n2,
                    SUM(CAST(c1 AS HUGEINT) * CAST(m2 AS HUGEINT)) AS t1,
                    SUM(CAST(c2 AS HUGEINT) * CAST(m2 AS HUGEINT)) AS t2,
                    SUM(CAST(c1 AS HUGEINT) * CAST(d1 AS HUGEINT)) AS s11,
                    SUM(CAST(c1 AS HUGEINT) * CAST(d1 AS HUGEINT)
                      * CAST(d1 AS HUGEINT)) AS s21,
                    SUM(CAST(c2 AS HUGEINT) * CAST(d2 AS HUGEINT)) AS s12,
                    SUM(CAST(c2 AS HUGEINT) * CAST(d2 AS HUGEINT)
                      * CAST(d2 AS HUGEINT)) AS s22
                  FROM rk),
            e AS (SELECT n1, n2,
                    CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 2 AS r1,
                    CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 2 AS r2,
                    (CAST(s21 AS DOUBLE) - CAST(s11 AS DOUBLE)
                        * CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) - 1) / 4 AS v1,
                    (CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE)
                        * CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
                      / (CAST(n2 AS DOUBLE) - 1) / 4 AS v2
                  FROM m)
         SELECT n1 AS n_returned, n2 AS n_kept,
                round((r2 - (CAST(n2 AS DOUBLE) + 1) / 2)
                  / CAST(n1 AS DOUBLE), 6) AS p_hat,
                round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (r2 - r1)
                  / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                  / sqrt(CAST(n1 AS DOUBLE) * v1
                    + CAST(n2 AS DOUBLE) * v2), 6) AS w_bm
         FROM e""",

    "q_agg_cramer_von_mises" ->
      s"""WITH $spineSql,
            t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                    CAST(SUM(c2) AS BIGINT) AS n2 FROM sp),
            g AS (SELECT n1, n2, c,
                    CAST(cb1 + c1 AS HUGEINT) * CAST(n2 AS HUGEINT)
                      - CAST(cb2 + c2 AS HUGEINT) * CAST(n1 AS HUGEINT)
                      AS gap
                  FROM sp, t),
            m AS (SELECT n1, n2,
                    SUM(CAST(c AS HUGEINT) * gap * gap) AS sg
                  FROM g GROUP BY 1, 2)
         SELECT n1 AS n_returned, n2 AS n_kept,
                round(CAST(sg AS DOUBLE) / CAST(n1 AS DOUBLE)
                  / CAST(n2 AS DOUBLE)
                  / CAST(n1 + n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE), 6)
                  AS t_cvm
         FROM m""",

    "q_agg_dagostino_k2" ->
      """WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(v) AS BIGINT) AS s1,
                    SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2,
                    SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)
                      * CAST(v AS HUGEINT)) AS s3,
                    SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)
                      * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s4
                  FROM (SELECT CAST(l_quantity AS BIGINT) AS v
                        FROM lineitem)),
            c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                    CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
                    CAST(s3 AS DOUBLE) AS d3, CAST(s4 AS DOUBLE) AS d4
                  FROM m),
            mm AS (SELECT n, nd,
                    (d2 - d1 * d1 / nd) / nd AS m2,
                    (d3 - 3.0 * d1 * d2 / nd
                      + 2.0 * d1 * d1 * d1 / nd / nd) / nd AS m3,
                    (d4 - 4.0 * d1 * d3 / nd
                      + 6.0 * d1 * d1 * d2 / nd / nd
                      - 3.0 * d1 * d1 * d1 * d1 / nd / nd / nd) / nd AS m4
                  FROM c),
            sk AS (SELECT n, nd, m2, m4,
                    m3 / sqrt(m2 * m2 * m2)
                      * sqrt((nd + 1) * (nd + 3) / 6 / (nd - 2)) AS y,
                    sqrt(2.0 * (3.0 * (nd * nd + 27 * nd - 70) * (nd + 1)
                        * (nd + 3)
                      / ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9)) - 1))
                      - 1 AS w2
                  FROM mm),
            alc AS (SELECT n, nd, m2, m4, y, w2,
                    sqrt(2.0 / (w2 - 1)) AS al FROM sk),
            z1c AS (SELECT n, nd, m2, m4,
                    (1.0 / sqrt(ln(sqrt(w2))))
                      * ln(y / al + sqrt(y * y / (al * al) + 1)) AS z1
                  FROM alc),
            kt AS (SELECT n, z1,
                    (m4 / (m2 * m2) - 3.0 * (nd - 1) / (nd + 1))
                      / sqrt(24.0 * nd * (nd - 2) * (nd - 3)
                        / ((nd + 1) * (nd + 1) * (nd + 3) * (nd + 5)))
                      AS x,
                    6.0 * (nd * nd - 5 * nd + 2) / ((nd + 7) * (nd + 9))
                      * sqrt(6.0 * (nd + 3) * (nd + 5) / nd / (nd - 2)
                        / (nd - 3)) AS sb1
                  FROM z1c),
            ac AS (SELECT n, z1, x,
                    6.0 + 8.0 / sb1 * (2.0 / sb1
                      + sqrt(1.0 + 4.0 / (sb1 * sb1))) AS aa
                  FROM kt),
            z2c AS (SELECT n, z1,
                    ((1.0 - 2.0 / (9 * aa))
                      - cbrt((1.0 - 2.0 / aa)
                        / (1.0 + x * sqrt(2.0 / (aa - 4)))))
                      * sqrt(4.5 * aa) AS z2
                  FROM ac)
         SELECT n AS n_rows, round(z1, 6) AS z_skew,
                round(z2, 6) AS z_kurt,
                round(z1 * z1 + z2 * z2, 6) AS k2
         FROM z2c"""
  )
}
