package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 58: approximate entropy (Pincus ApEn —
  * the self-match-inclusive sibling of q_ts_sample_entropy, the pair
  * that regularity papers always quote together), recurrence
  * quantification (recurrence rate + determinism from the
  * thresholded recurrence matrix — the nonlinear-dynamics view of
  * the daily series), and the projection-duplicate profile (largest
  * duplicate groups of (partkey, suppkey, quantity) — the fuzzy-key
  * DQ screen between full-row dup detection and q_dq_uniqueness).
  *
  * Scale shape: ApEn/RQA ride the broadcast calendar² pair spine
  * (the q_ts_sample_entropy shape — the tolerance r is quantized to
  * integer cents so EVERY match decision is an exact integer
  * comparison); RQA's diagonal test is an equi-join of the recurrent
  * set with itself on (i+1, j+1). duplicate_rows is one linear
  * groupBy + bounded top-5.
  *
  * Determinism contract (SURVEY §2.13): r = floor(0.2·sd) in whole
  * cents (the Extras89 convention); ApEn's per-template ln terms are
  * nano-quantized before the fold; RQA emits exact counts + IEEE
  * ratios; dup groups tie-break by the group key.
  */
object Extras132 {
  import Det._

  private val Big = DecimalType(38, 0)

  private def dailyIdx(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("dt")))
        .cast("long"))

  private def rCents(s: SparkSession, d: String): DataFrame =
    dailyIdx(s, d).agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      .select(col("n"),
        floor(lit(0.2) * sqrt((col("n").cast(Big) * col("syy")
          - col("sy").cast(Big) * col("sy").cast(Big)).cast("double"))
          / col("n").cast("double")).cast("long").as("r"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // APPROXIMATE ENTROPY — φ_m − φ_{m+1} with self-matches, m = 2:
    // per-template match counts over ALL ordered pairs (incl. self),
    // per-template ln nano-quantized.
    "q_ts_approx_entropy" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val tpl = dailyIdx(s, d)
        .withColumn("y1", lead(col("y"), 1).over(ord))
        .withColumn("y2", lead(col("y"), 2).over(ord))
        .select(col("t"), col("y"), col("y1"), col("y2"))
      val pairs = tpl.as("ta")
        .join(broadcast(tpl.as("tb")), lit(true))
        .crossJoin(broadcast(rCents(s, d)))
      val m2 = abs(col("ta.y") - col("tb.y")) <= col("r") &&
        abs(col("ta.y1") - col("tb.y1")) <= col("r")
      val m3 = m2 && abs(col("ta.y2") - col("tb.y2")) <= col("r")
      val per = pairs
        .where(col("ta.y1").isNotNull)
        .groupBy(col("ta.t").as("i"))
        .agg(max(col("n")).as("n"), max(col("r")).as("r"),
          sum((col("tb.y1").isNotNull && m2).cast("long")).as("c2"),
          sum((col("ta.y2").isNotNull && col("tb.y2").isNotNull && m3)
            .cast("long")).as("c3"),
          max(col("ta.y2").isNotNull.cast("long")).as("has3"))
      val n2 = col("n") - 1
      val n3 = col("n") - 2
      val phi = per
        .withColumn("l2_nano", round(log(col("c2").cast("double")
          / n2.cast("double")) * lit(1e9)).cast("long"))
        .withColumn("l3_nano", when(col("has3") === 1,
          round(log(col("c3").cast("double") / n3.cast("double"))
            * lit(1e9)).cast("long")))
        .agg(max(col("n")).as("n_days"), max(col("r")).as("r_cents"),
          count(lit(1)).as("n_tpl2"),
          sum(col("l2_nano")).as("s2_nano"),
          sum(when(col("has3") === 1, 1L).otherwise(0L)).as("n_tpl3"),
          sum(col("l3_nano")).as("s3_nano"))
      phi.select(col("n_days"), col("r_cents"),
        r6(col("s2_nano").cast("double") / lit(1e9)
          / col("n_tpl2").cast("double")
          - col("s3_nano").cast("double") / lit(1e9)
            / col("n_tpl3").cast("double")).as("apen"))
    }),

    // RECURRENCE QUANTIFICATION — RR = recurrent share of i<j pairs;
    // DET = share of recurrent points with a diagonal neighbor
    // ((i+1, j+1) or (i−1, j−1) also recurrent).
    "q_ts_rqa" -> ((s, d) => {
      val pts = dailyIdx(s, d).select(col("t"), col("y"))
      val rec = pts.as("a")
        .join(broadcast(pts.as("b")), col("a.t") < col("b.t"))
        .crossJoin(broadcast(rCents(s, d)))
        .where(abs(col("a.y") - col("b.y")) <= col("r"))
        .select(col("a.t").as("i"), col("b.t").as("j"),
          col("n"), col("r"))
        // the recurrent set feeds three plan references (itself plus
        // two shifted probes) — materialize once (the
        // banding_tradeoff shared-subplan lesson)
        .duckCkpt()
      val nxt = rec.select((col("i") - 1).as("i"),
        (col("j") - 1).as("j"), lit(1L).as("has_next"))
      val onDiag = rec
        .join(nxt, Seq("i", "j"), "left")
        .join(rec.select((col("i") + 1).as("i"), (col("j") + 1).as("j"),
          lit(1L).as("has_prev")), Seq("i", "j"), "left")
        .withColumn("on_line",
          (coalesce(col("has_next"), lit(0L))
            + coalesce(col("has_prev"), lit(0L)) > 0).cast("long"))
      onDiag.agg(max(col("n")).as("n_days"), max(col("r")).as("r_cents"),
          count(lit(1)).as("n_recurrent"),
          sum(col("on_line")).as("n_on_lines"))
        .select(col("n_days"), col("r_cents"), col("n_recurrent"),
          r6(col("n_recurrent").cast("double") * 2 /
            (col("n_days").cast("double")
              * (col("n_days") - 1).cast("double"))).as("rec_rate"),
          r6(col("n_on_lines").cast("double")
            / col("n_recurrent").cast("double")).as("determinism"))
    }),

    // DUPLICATE PROFILE — the 5 largest duplicate groups of the
    // (partkey, suppkey, quantity) projection plus the global share.
    "q_dq_duplicate_rows" -> ((s, d) => {
      val g = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"))
        .agg(count(lit(1)).as("c"))
      val tot = g.agg(sum(col("c")).as("n_rows"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_rows"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_groups"))
      g.where(col("c") > 1)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("c").desc, col("l_partkey"),
            col("l_suppkey"), col("qty"))).cast("long"))
        .where(col("rk") <= 5)
        .crossJoin(broadcast(tot))
        .select(col("rk").as("rank"), col("l_partkey"),
          col("l_suppkey"), col("qty"), col("c").as("group_size"),
          col("n_dup_groups"),
          r6(col("n_dup_rows").cast("double")
            / col("n_rows").cast("double")).as("dup_row_share"))
        .orderBy(col("rank"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_approx_entropy" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT y,
                    CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t,
                    lead(y, 1) OVER (ORDER BY dt) AS y1,
                    lead(y, 2) OVER (ORDER BY dt) AS y2
                  FROM daily),
            rr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(floor(0.2 * sqrt(CAST(CAST(COUNT(*) AS HUGEINT)
                        * SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                        - CAST(SUM(y) AS HUGEINT)
                          * CAST(SUM(y) AS HUGEINT) AS DOUBLE))
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS r
                  FROM daily),
            per AS (SELECT a.t AS i, MAX(rr.n) AS n, MAX(rr.r) AS r,
                    CAST(SUM(CASE WHEN b.y1 IS NOT NULL
                        AND abs(a.y - b.y) <= rr.r
                        AND abs(a.y1 - b.y1) <= rr.r
                      THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                    CAST(SUM(CASE WHEN a.y2 IS NOT NULL
                        AND b.y2 IS NOT NULL
                        AND abs(a.y - b.y) <= rr.r
                        AND abs(a.y1 - b.y1) <= rr.r
                        AND abs(a.y2 - b.y2) <= rr.r
                      THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                    MAX(CASE WHEN a.y2 IS NOT NULL THEN 1 ELSE 0 END)
                      AS has3
                  FROM idx a, idx b, rr
                  WHERE a.y1 IS NOT NULL
                  GROUP BY 1),
            phi AS (SELECT MAX(n) AS n_days, MAX(r) AS r_cents,
                    CAST(COUNT(*) AS BIGINT) AS n_tpl2,
                    CAST(SUM(CAST(round(ln(CAST(c2 AS DOUBLE)
                      / CAST(n - 1 AS DOUBLE)) * 1e9) AS BIGINT))
                      AS BIGINT) AS s2_nano,
                    CAST(SUM(has3) AS BIGINT) AS n_tpl3,
                    CAST(SUM(CASE WHEN has3 = 1 THEN
                      CAST(round(ln(CAST(c3 AS DOUBLE)
                        / CAST(n - 2 AS DOUBLE)) * 1e9) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS s3_nano
                  FROM per)
         SELECT n_days, r_cents,
                round(CAST(s2_nano AS DOUBLE) / 1e9
                    / CAST(n_tpl2 AS DOUBLE)
                  - CAST(s3_nano AS DOUBLE) / 1e9
                    / CAST(n_tpl3 AS DOUBLE), 6) AS apen
         FROM phi""",

    "q_ts_rqa" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT y,
                    CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                  FROM daily),
            rr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(floor(0.2 * sqrt(CAST(CAST(COUNT(*) AS HUGEINT)
                        * SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                        - CAST(SUM(y) AS HUGEINT)
                          * CAST(SUM(y) AS HUGEINT) AS DOUBLE))
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS r
                  FROM daily),
            rec AS MATERIALIZED (SELECT a.t AS i, b.t AS j, rr.n, rr.r
                    FROM idx a, idx b, rr
                    WHERE a.t < b.t AND abs(a.y - b.y) <= rr.r),
            diag AS (SELECT rec.i, rec.j, rec.n, rec.r,
                      CASE WHEN nx.i IS NOT NULL OR pv.i IS NOT NULL
                           THEN 1 ELSE 0 END AS on_line
                    FROM rec
                    LEFT JOIN rec nx
                      ON nx.i = rec.i + 1 AND nx.j = rec.j + 1
                    LEFT JOIN rec pv
                      ON pv.i = rec.i - 1 AND pv.j = rec.j - 1)
         SELECT MAX(n) AS n_days, MAX(r) AS r_cents,
                CAST(COUNT(*) AS BIGINT) AS n_recurrent,
                round(CAST(COUNT(*) AS DOUBLE) * 2
                  / (CAST(MAX(n) AS DOUBLE)
                    * (CAST(MAX(n) AS DOUBLE) - 1)), 6) AS rec_rate,
                round(CAST(SUM(on_line) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS determinism
         FROM diag""",

    "q_dq_duplicate_rows" ->
      """WITH g AS (SELECT l_partkey, l_suppkey,
                    CAST(l_quantity AS BIGINT) AS qty,
                    CAST(COUNT(*) AS BIGINT) AS c
                 FROM lineitem GROUP BY 1, 2, 3),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                      AS BIGINT) AS n_dup_rows,
                    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup_groups
                  FROM g),
            rk AS (SELECT l_partkey, l_suppkey, qty, c,
                    CAST(row_number() OVER (ORDER BY c DESC, l_partkey,
                      l_suppkey, qty) AS BIGINT) AS rank
                   FROM g WHERE c > 1)
         SELECT rank, l_partkey, l_suppkey, qty, c AS group_size,
                n_dup_groups,
                round(CAST(n_dup_rows AS DOUBLE)
                  / CAST(n_rows AS DOUBLE), 6) AS dup_row_share
         FROM rk, t WHERE rank <= 5 ORDER BY rank"""
  )
}
