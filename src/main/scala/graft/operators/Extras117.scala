package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 43: the distribution-distance family —
  * exact 1-D Wasserstein-1 (earth mover's) distance between the
  * returned (A) and refused (R) quantity distributions, the
  * closed-form 1-D energy distance over the same pair, and the
  * k-sample Anderson-Darling test (Scholz-Stephens 1987, the
  * tie-adjusted A²_akN) across all three return flags.
  *
  * Anderson-Darling was on the declared-unreachable list next to
  * ARIMA ("special-function coefficients"); that was wrong for the
  * K-SAMPLE rank form, which needs only integer cell/cumulative
  * counts — the same retirement Holt-Winters got this round. The
  * one-sample normality AD (which needs Φ) stays unreachable.
  *
  * Scale shape: every operator folds the bounded VALUE SPINE
  * (distinct l_quantity ≤ 50 rows) after one linear groupBy of the
  * fact table — map-side partial aggregation does all the heavy
  * lifting; the spine windows are constant-size at any corpus scale.
  *
  * Determinism contract (SURVEY §2.13): all pair-mass sums are exact
  * BIGINT/DECIMAL(38,0) folds on the value spine (W1 numerator via
  * cross-multiplied CDFs |cA·nR − cR·nA|, energy via cumulative
  * count/sum prefix identities, AD via the ×2-scaled integer
  * midrank identities T_ij = N(2M_ij−l_ij) − n_i(2B_j−l_j),
  * D_j = (2B_j−l_j)(2N−2B_j+l_j) − N·l_j); AD per-spine-cell terms
  * are micro-quantized to nano-units before the integer sum
  * (ld·T²/N/D/ni — identical association both engines).
  */
object Extras117 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WASSERSTEIN-1 — ∫|F_A − F_R| over the integer quantity support:
    // Σ_v |cumA(v)·nR − cumR(v)·nA| · gap(v), exact BIGINT; W1 is the
    // single final division by nA·nR.
    "q_agg_wasserstein" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("v"))
      val per = base.groupBy(col("v"))
        .agg(sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === "R", 1L).otherwise(0L)).as("cr"))
      val tot = per.agg(sum(col("ca")).as("na"), sum(col("cr")).as("nr"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per
        .withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumr", sum(col("cr")).over(w))
        .withColumn("gap",
          coalesce(lead(col("v"), 1).over(Window.orderBy(col("v")))
            - col("v"), lit(0L)))
        .crossJoin(broadcast(tot))
        .agg(max(col("na")).as("n_a"), max(col("nr")).as("n_r"),
          sum(abs(col("cuma") * col("nr") - col("cumr") * col("na"))
            * col("gap")).as("w1_num"))
        .select(col("n_a"), col("n_r"), col("w1_num"),
          r6(col("w1_num").cast("double")
            / (col("n_a").cast("double") * col("n_r").cast("double")))
            .as("w1"))
    }),

    // ENERGY DISTANCE — E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| (V-statistic,
    // all ordered pairs): each pairwise-|diff| mass folds closed-form
    // on the sorted value spine as Σ_v c(v)·[2(v·C(v) − S(v)) + T − v·N]
    // with cumulative count C / weighted sum S of the OTHER sample —
    // exact BIGINT throughout, three divisions at the very end.
    "q_agg_energy_distance" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("v"))
      val per = base.groupBy(col("v"))
        .agg(sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === "R", 1L).otherwise(0L)).as("cr"))
      val tot = per.agg(sum(col("ca")).as("na"), sum(col("cr")).as("nr"),
        sum(col("v") * col("ca")).as("ta"),
        sum(col("v") * col("cr")).as("tr"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sp = per
        .withColumn("cna", sum(col("ca")).over(w))
        .withColumn("csa", sum(col("v") * col("ca")).over(w))
        .withColumn("cnr", sum(col("cr")).over(w))
        .withColumn("csr", sum(col("v") * col("cr")).over(w))
        .crossJoin(broadcast(tot))
      // Σ_w cOther(w)·|v − w| given cumulative (C,S) of other at v.
      val dA = (col("v") * col("cna") - col("csa")) * 2 +
        col("ta") - col("v") * col("na")
      val dR = (col("v") * col("cnr") - col("csr")) * 2 +
        col("tr") - col("v") * col("nr")
      sp.agg(max(col("na")).as("n_a"), max(col("nr")).as("n_r"),
          sum(col("ca") * dR).as("s_ar"),
          sum(col("ca") * dA).as("s_aa"),
          sum(col("cr") * dR).as("s_rr"))
        .select(col("n_a"), col("n_r"), col("s_ar"), col("s_aa"),
          col("s_rr"),
          r6(lit(2.0) * col("s_ar").cast("double")
              / (col("n_a").cast("double") * col("n_r").cast("double"))
            - col("s_aa").cast("double")
              / (col("n_a").cast("double") * col("n_a").cast("double"))
            - col("s_rr").cast("double")
              / (col("n_r").cast("double") * col("n_r").cast("double")))
            .as("energy_dist"))
    }),

    // K-SAMPLE ANDERSON-DARLING (Scholz-Stephens A²_akN, ties) — the
    // three return-flag quantity samples on the pooled value spine.
    // Full k×L cell grid (missing cells materialized as 0 — their
    // T_ij is nonzero), ×2-scaled integer midranks, per-cell term
    // l_j·T²/(N·D_j·n_i) nano-quantized then integer-summed.
    "q_agg_anderson_darling" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("v"))
      val cell = base.groupBy(col("g"), col("v"))
        .agg(count(lit(1)).as("lij"))
      val groups = cell.select(col("g")).distinct()
      val vals = cell.select(col("v")).distinct()
      val grid = vals.crossJoin(broadcast(groups))
        .join(cell, Seq("g", "v"), "left")
        .withColumn("lij", coalesce(col("lij"), lit(0L)))
      val wg = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ni = Window.partitionBy(col("g"))
      val sp = grid
        .withColumn("mij", sum(col("lij")).over(wg))
        .withColumn("nI", sum(col("lij")).over(ni))
        .withColumn("lj", sum(col("lij")).over(
          Window.partitionBy(col("v"))))
        // RANGE frame, not ROWS: the grid carries k tied rows per v and
        // the pooled cumulative must include the whole tie group.
        .withColumn("bj", sum(col("lij")).over(
          Window.orderBy(col("v"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nN", sum(col("lij")).over(
          Window.partitionBy(lit(1))))
      val t = col("nN") * (col("mij") * 2 - col("lij")) -
        col("nI") * (col("bj") * 2 - col("lj"))
      val dj = (col("bj") * 2 - col("lj")) *
        (col("nN") * 2 - col("bj") * 2 + col("lj")) -
        col("nN") * col("lj")
      val term = col("lj").cast("double") *
        (t.cast(Big) * t.cast(Big)).cast("double") /
        col("nN").cast("double") / dj.cast("double") /
        col("nI").cast("double")
      sp.withColumn("term_nano",
          round(term * lit(1e9)).cast("long"))
        .agg(countDistinct(col("g")).as("k_samples"),
          max(col("nN")).as("n_total"),
          countDistinct(col("v")).as("n_values"),
          sum(col("term_nano")).as("sum_nano"))
        .select(col("k_samples"), col("n_total"), col("n_values"),
          r6((col("n_total") - 1).cast("double")
            / col("n_total").cast("double")
            * col("sum_nano").cast("double") / lit(1e9)).as("a2_akn"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_wasserstein" ->
      """WITH base AS (SELECT l_returnflag AS g,
                    CAST(l_quantity AS BIGINT) AS v
                 FROM lineitem WHERE l_returnflag IN ('A','R')),
            per AS (SELECT v,
                    CAST(SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END)
                      AS BIGINT) AS ca,
                    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END)
                      AS BIGINT) AS cr
                  FROM base GROUP BY 1),
            t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                    CAST(SUM(cr) AS BIGINT) AS nr FROM per),
            sp AS (SELECT v,
                     CAST(SUM(ca) OVER wc AS BIGINT) AS cuma,
                     CAST(SUM(cr) OVER wc AS BIGINT) AS cumr,
                     COALESCE(lead(v) OVER (ORDER BY v) - v, 0) AS gap
                   FROM per
                   WINDOW wc AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT MAX(na) AS n_a, MAX(nr) AS n_r,
                CAST(SUM(abs(cuma * nr - cumr * na) * gap) AS BIGINT)
                  AS w1_num,
                round(CAST(SUM(abs(cuma * nr - cumr * na) * gap)
                    AS DOUBLE)
                  / (CAST(MAX(na) AS DOUBLE) * CAST(MAX(nr) AS DOUBLE)),
                  6) AS w1
         FROM sp, t""",

    "q_agg_energy_distance" ->
      """WITH base AS (SELECT l_returnflag AS g,
                    CAST(l_quantity AS BIGINT) AS v
                 FROM lineitem WHERE l_returnflag IN ('A','R')),
            per AS (SELECT v,
                    CAST(SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END)
                      AS BIGINT) AS ca,
                    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END)
                      AS BIGINT) AS cr
                  FROM base GROUP BY 1),
            t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                    CAST(SUM(cr) AS BIGINT) AS nr,
                    CAST(SUM(v * ca) AS BIGINT) AS ta,
                    CAST(SUM(v * cr) AS BIGINT) AS tr FROM per),
            sp AS (SELECT v, ca, cr,
                     CAST(SUM(ca) OVER wc AS BIGINT) AS cna,
                     CAST(SUM(v * ca) OVER wc AS BIGINT) AS csa,
                     CAST(SUM(cr) OVER wc AS BIGINT) AS cnr,
                     CAST(SUM(v * cr) OVER wc AS BIGINT) AS csr
                   FROM per
                   WINDOW wc AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            f AS (SELECT MAX(na) AS n_a, MAX(nr) AS n_r,
                    CAST(SUM(ca * ((v * cnr - csr) * 2 + tr - v * nr))
                      AS BIGINT) AS s_ar,
                    CAST(SUM(ca * ((v * cna - csa) * 2 + ta - v * na))
                      AS BIGINT) AS s_aa,
                    CAST(SUM(cr * ((v * cnr - csr) * 2 + tr - v * nr))
                      AS BIGINT) AS s_rr
                  FROM sp, t)
         SELECT n_a, n_r, s_ar, s_aa, s_rr,
                round(2.0 * CAST(s_ar AS DOUBLE)
                    / (CAST(n_a AS DOUBLE) * CAST(n_r AS DOUBLE))
                  - CAST(s_aa AS DOUBLE)
                    / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
                  - CAST(s_rr AS DOUBLE)
                    / (CAST(n_r AS DOUBLE) * CAST(n_r AS DOUBLE)), 6)
                  AS energy_dist
         FROM f""",

    "q_agg_anderson_darling" ->
      """WITH base AS (SELECT l_returnflag AS g,
                    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
            cell AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS lij
                     FROM base GROUP BY 1, 2),
            grid AS (SELECT vv.v, gg.g, COALESCE(c.lij, 0) AS lij
                     FROM (SELECT DISTINCT v FROM cell) vv
                     CROSS JOIN (SELECT DISTINCT g FROM cell) gg
                     LEFT JOIN cell c ON c.g = gg.g AND c.v = vv.v),
            sp AS (SELECT g, v, lij,
                     CAST(SUM(lij) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS mij,
                     CAST(SUM(lij) OVER (PARTITION BY g) AS BIGINT)
                       AS nI,
                     CAST(SUM(lij) OVER (PARTITION BY v) AS BIGINT)
                       AS lj,
                     CAST(SUM(lij) OVER (ORDER BY v
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS bj,
                     CAST(SUM(lij) OVER () AS BIGINT) AS nN
                   FROM grid),
            tm AS (SELECT g, v, nN, lj,
                     nN * (mij * 2 - lij) - nI * (bj * 2 - lj) AS t,
                     (bj * 2 - lj) * (nN * 2 - bj * 2 + lj) - nN * lj
                       AS dj,
                     nI
                   FROM sp),
            q AS (SELECT g, v, nN,
                    CAST(round(CAST(lj AS DOUBLE)
                        * CAST(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
                          AS DOUBLE)
                        / CAST(nN AS DOUBLE) / CAST(dj AS DOUBLE)
                        / CAST(nI AS DOUBLE) * 1e9) AS BIGINT)
                      AS term_nano
                  FROM tm)
         SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS k_samples,
                MAX(nN) AS n_total,
                CAST(COUNT(DISTINCT v) AS BIGINT) AS n_values,
                round(CAST(MAX(nN) - 1 AS DOUBLE)
                  / CAST(MAX(nN) AS DOUBLE)
                  * CAST(SUM(term_nano) AS DOUBLE) / 1e9, 6) AS a2_akn
         FROM q"""
  )
}
