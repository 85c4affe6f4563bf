package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 22: ordinal/nominal association round-out —
  * Goodman-Kruskal gamma, Somers' D (price-bucket dependent), and
  * Stuart-Kendall tau-c over the priority × price-bucket contingency
  * table, plus Goodman-Kruskal lambda for predicting a document's
  * source from its language.
  *
  * Scale note: every statistic folds the FACT table once into a
  * bounded contingency table (≤5×5 / ≤|lang|×|source| cells); the
  * concordance pair walk is a broadcast nested-loop self-join over
  * those ≤25 cells — O(cells²) driver-free work that is independent
  * of fact cardinality, so the plan is corpus-linear end to end.
  *
  * Determinism contract (SURVEY §2.13): concordant/discordant pair
  * counts are exact integers (DECIMAL(38,0) products before any sum);
  * each final statistic is ONE fixed-shape IEEE expression over those
  * exact scalars.
  */
object Extras96 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** priority (ordinal 1..5) × totalprice bucket (ordinal 1..5, fixed
    * cent thresholds) cell counts — the shared contingency fold. */
  private def cells(s: SparkSession, d: String): DataFrame = {
    val cents = (dec(col("o_totalprice")) * 100).cast("long")
    Tables.orders(s, d)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("xi"),
        when(cents < 5000000L, 1L).when(cents < 10000000L, 2L)
          .when(cents < 15000000L, 3L).when(cents < 20000000L, 4L)
          .otherwise(5L).as("yi"))
      .groupBy(col("xi"), col("yi")).agg(count(lit(1)).as("n"))
  }

  /** One row holding exact C (concordant) and D (discordant) pair
    * counts off the bounded cell self-join, plus N and Σ row-totals². */
  private def concordance(s: SparkSession, d: String): DataFrame = {
    val c = cells(s, d).duckCkpt()
    val pairs = c.as("a")
      .join(broadcast(c.as("b")), col("b.xi") > col("a.xi"))
      .agg(
        sum(when(col("b.yi") > col("a.yi"),
          col("a.n").cast(Big) * col("b.n").cast(Big))
          .otherwise(lit(0).cast(Big))).as("cc"),
        sum(when(col("b.yi") < col("a.yi"),
          col("a.n").cast(Big) * col("b.n").cast(Big))
          .otherwise(lit(0).cast(Big))).as("dd"))
    val tot = c.agg(sum(col("n")).as("nn"),
      countDistinct(col("xi")).as("nx"),
      countDistinct(col("yi")).as("ny"))
    val rows2 = c.groupBy(col("xi")).agg(sum(col("n")).as("ri"))
      .agg(sum(col("ri").cast(Big) * col("ri").cast(Big)).as("sr2"))
    pairs.crossJoin(broadcast(tot)).crossJoin(broadcast(rows2))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GOODMAN-KRUSKAL GAMMA — γ = (C−D)/(C+D) over the ordered
    // priority × price-bucket table: ties ignored by construction.
    "q_agg_gk_gamma" -> ((s, d) => {
      concordance(s, d).select(
        col("cc").cast("long").as("conc_pairs"),
        col("dd").cast("long").as("disc_pairs"),
        r6((col("cc") - col("dd")).cast("double") /
          (col("cc") + col("dd")).cast("double")).as("gamma"))
    }),

    // SOMERS' D (price bucket dependent) — d_yx = (C−D)/W_x with
    // W_x = (N² − Σᵢ nᵢ₊²)/2 the pairs untied on the priority axis.
    "q_agg_somers_d" -> ((s, d) => {
      val wx = (col("nn").cast(Big) * col("nn").cast(Big) - col("sr2"))
        .cast("double") / 2
      concordance(s, d).select(
        col("nn").as("n_orders"),
        col("cc").cast("long").as("conc_pairs"),
        col("dd").cast("long").as("disc_pairs"),
        r6((col("cc") - col("dd")).cast("double") / wx).as("somers_dyx"))
    }),

    // STUART-KENDALL TAU-C — τ_c = 2m(C−D)/(N²(m−1)), m = min(r, c):
    // the square-table correction that reaches ±1 on rectangular
    // margins.
    "q_agg_tau_c" -> ((s, d) => {
      val m = least(col("nx"), col("ny")).cast("double")
      concordance(s, d).select(
        col("nn").as("n_orders"),
        least(col("nx"), col("ny")).as("m_min"),
        r6((col("cc") - col("dd")).cast("double") * 2 * m /
          (col("nn").cast(Big) * col("nn").cast(Big)).cast("double") /
          (m - 1)).as("tau_c"))
    }),

    // GOODMAN-KRUSKAL LAMBDA — λ_{source|lang}: proportional error
    // reduction predicting a document's source from its language:
    // (Σ_lang max_source n − max_source n₊ⱼ)/(N − max_source n₊ⱼ).
    "q_agg_gk_lambda" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
        .duckCkpt()
      val rowMax = c.groupBy(col("lang")).agg(max(col("n")).as("mx"))
        .agg(sum(col("mx")).as("sum_row_max"))
      val colMax = c.groupBy(col("source")).agg(sum(col("n")).as("cj"))
        .agg(max(col("cj")).as("col_max"))
      val tot = c.agg(sum(col("n")).as("n_docs"))
      tot.crossJoin(broadcast(rowMax)).crossJoin(broadcast(colMax))
        .select(col("n_docs"), col("sum_row_max"), col("col_max"),
          r6((col("sum_row_max") - col("col_max")).cast("double") /
            (col("n_docs") - col("col_max")).cast("double"))
            .as("lambda_yx"))
    })
  )

  private val cellsSql =
    """cells AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS xi,
                CASE WHEN cents < 5000000 THEN 1
                     WHEN cents < 10000000 THEN 2
                     WHEN cents < 15000000 THEN 3
                     WHEN cents < 20000000 THEN 4 ELSE 5 END AS yi,
                CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT o_orderpriority,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT) AS cents FROM orders)
          GROUP BY 1, 2),
       cd AS (SELECT
                SUM(CASE WHEN b.yi > a.yi
                    THEN CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)
                    ELSE 0 END) AS cc,
                SUM(CASE WHEN b.yi < a.yi
                    THEN CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)
                    ELSE 0 END) AS dd
              FROM cells a JOIN cells b ON b.xi > a.xi),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                 CAST(COUNT(DISTINCT xi) AS BIGINT) AS nx,
                 CAST(COUNT(DISTINCT yi) AS BIGINT) AS ny
               FROM cells),
       r2 AS (SELECT SUM(CAST(ri AS HUGEINT) * CAST(ri AS HUGEINT)) AS sr2
              FROM (SELECT xi, CAST(SUM(n) AS BIGINT) AS ri
                    FROM cells GROUP BY 1))"""

  val oracle: Map[String, String] = Map(

    "q_agg_gk_gamma" ->
      s"""WITH $cellsSql
         SELECT CAST(cc AS BIGINT) AS conc_pairs,
                CAST(dd AS BIGINT) AS disc_pairs,
                round(CAST(cc - dd AS DOUBLE) / CAST(cc + dd AS DOUBLE), 6)
                  AS gamma
         FROM cd""",

    "q_agg_somers_d" ->
      s"""WITH $cellsSql
         SELECT nn AS n_orders, CAST(cc AS BIGINT) AS conc_pairs,
                CAST(dd AS BIGINT) AS disc_pairs,
                round(CAST(cc - dd AS DOUBLE)
                  / (CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT) - sr2
                      AS DOUBLE) / 2), 6) AS somers_dyx
         FROM cd, tot, r2""",

    "q_agg_tau_c" ->
      s"""WITH $cellsSql
         SELECT nn AS n_orders,
                CASE WHEN nx < ny THEN nx ELSE ny END AS m_min,
                round(CAST(cc - dd AS DOUBLE) * 2
                    * CAST(CASE WHEN nx < ny THEN nx ELSE ny END AS DOUBLE)
                  / CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT)
                      AS DOUBLE)
                  / (CAST(CASE WHEN nx < ny THEN nx ELSE ny END AS DOUBLE)
                      - 1), 6) AS tau_c
         FROM cd, tot""",

    "q_agg_gk_lambda" ->
      """WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
                 FROM documents GROUP BY 1, 2),
            rm AS (SELECT CAST(SUM(mx) AS BIGINT) AS sum_row_max
                   FROM (SELECT lang, MAX(n) AS mx FROM c GROUP BY 1)),
            cm AS (SELECT CAST(MAX(cj) AS BIGINT) AS col_max
                   FROM (SELECT source, SUM(n) AS cj FROM c GROUP BY 1)),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs FROM c)
         SELECT n_docs, sum_row_max, col_max,
                round(CAST(sum_row_max - col_max AS DOUBLE)
                  / CAST(n_docs - col_max AS DOUBLE), 6) AS lambda_yx
         FROM t, rm, cm"""
  )
}
