package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 additions, part 12: retrieval-evaluation staples (mean
  * reciprocal rank, rank-biased overlap between two retrieval
  * metrics) and the Durbin-Watson residual-autocorrelation test.
  *
  * Scale shape: MRR/RBO score the corpus against ≤4 broadcast query
  * vectors with the packed integer-dot kernel (one corpus pass per
  * key, top-k folds bounded); Durbin-Watson is one orders fold onto
  * the calendar spine + a lag window over ≤2.4k days.
  *
  * Determinism contract (SURVEY §2.13): ranks come from exact
  * integer dot/L2 orderings tie-broken on vec_id; reciprocal ranks
  * and the p-weighted RBO terms are nano-quantized before their
  * bounded folds; the OLS residual is quantized to whole dollars
  * (one shared IEEE tree off exact integer moments) so the DW sums
  * are exact BIGINT.
  */
object Extras158 {
  import graft.Det._

  private def q6v(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1e6).cast("long"))

  private def dot(a: Column, b: Column): Column =
    graft.functions.LongArrayDot.longDot(a, b)

  private def d2(a: Column, b: Column): Column = expr(
    s"""aggregate(zip_with(${a.toString}, ${b.toString},
          (x, y) -> (x - y) * (x - y)),
          CAST(0 AS BIGINT), (s, v) -> s + v)""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MEAN RECIPROCAL RANK — for each query vector 0..3, the corpus
    // ranks by exact integer dot (desc, vec_id ties); RR = 1/rank of
    // the first same-label hit; MRR = mean over the 4 queries.
    "q_llm_mrr" -> ((s, d) => {
      val qs = Tables.embeddings(s, d).where(col("vec_id") <= 3)
        .select(col("vec_id").as("qid"), q6v(col("embedding")).as("qe"),
          col("label").as("qlabel"))
      val ranked = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), q6v(col("embedding")).as("ve"))
        .crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (col("label") === col("qlabel")).cast("long").as("rel"),
          dot(col("ve"), col("qe")).as("s"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("s").desc, col("vec_id"))).cast("long"))
      val firsts = ranked.where(col("rel") === 1)
        .groupBy(col("qid")).agg(min(col("pos")).as("first_rank"))
        .withColumn("rr_nano",
          round(lit(1e9) / col("first_rank").cast("double")).cast("long"))
      val mrr = firsts.agg(
        (sum(col("rr_nano")).cast("double") / 1e9
          / count(lit(1)).cast("double")).as("m"))
      firsts.crossJoin(broadcast(mrr))
        .select(col("qid"), col("first_rank"),
          r6(col("rr_nano").cast("double") / 1e9).as("rr"),
          r6(col("m")).as("mrr"))
        .orderBy(col("qid"))
    }),

    // RANK-BIASED OVERLAP — RBO@10 (p = 0.9, truncated form) between
    // the dot-product ranking and the L2-distance ranking for query
    // vector 0: (1−p)·Σ_d p^(d−1)·|A_d ∩ B_d|/d + p^10·|A∩B|/10,
    // every per-depth term nano-quantized. Measures how much the two
    // retrieval metrics agree at the top.
    "q_llm_rbo" -> ((s, d) => {
      val qrow = Tables.embeddings(s, d).where(col("vec_id") === 0)
        .select(q6v(col("embedding")).as("qe"))
      val scored = Tables.embeddings(s, d).where(col("vec_id") =!= 0)
        .select(col("vec_id"), q6v(col("embedding")).as("ve"))
        .crossJoin(broadcast(qrow))
        .select(col("vec_id"), dot(col("ve"), col("qe")).as("dp"),
          d2(col("ve"), col("qe")).as("l2"))
        .duckCkpt() // both rankings read it
      val ra = scored
        .withColumn("pa", row_number().over(
          Window.orderBy(col("dp").desc, col("vec_id"))).cast("long"))
        .where(col("pa") <= 10).select(col("vec_id"), col("pa"))
      val rb = scored
        .withColumn("pb", row_number().over(
          Window.orderBy(col("l2"), col("vec_id"))).cast("long"))
        .where(col("pb") <= 10).select(col("vec_id"), col("pb"))
      val both = ra.join(rb, "vec_id") // intersection with both ranks
      val depths = s.range(1, 11).select(col("id").as("dd"))
      val xa = depths.join(both,
          col("pa") <= col("dd") && col("pb") <= col("dd"), "left")
        .groupBy(col("dd"))
        .agg(count(col("vec_id")).as("xd"))
      val terms = xa.select(col("dd"), col("xd"),
        round(lit(0.1) * pow(lit(0.9), col("dd").cast("double") - 1)
          * col("xd").cast("double") / col("dd").cast("double") * 1e9)
          .cast("long").as("t_nano"),
        when(col("dd") === 10,
          round(pow(lit(0.9), lit(10.0)) * col("xd").cast("double")
            / 10 * 1e9).cast("long")).otherwise(lit(0L)).as("tail_nano"))
      terms.agg(max(when(col("dd") === 10, col("xd"))).as("overlap10"),
          sum(col("t_nano") + col("tail_nano")).as("sn"))
        .select(col("overlap10"),
          r6(col("sn").cast("double") / 1e9).as("rbo10"))
    }),

    // DURBIN-WATSON — first-order residual autocorrelation of the
    // daily-revenue-on-time OLS: DW = Σ(Δr)²/Σr² on whole-dollar
    // quantized residuals (exact BIGINT sums), plus the ρ ≈ 1 − DW/2
    // readout.
    "q_ts_durbin_watson" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("vc"))
        .select(col("dt"), expr("vc div 100").as("v"))
        .withColumn("t", row_number().over(Window.orderBy(col("dt")))
          .cast("long"))
      val mo = daily.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("v")).as("sv"), sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("v")).as("stv"))
      val b = (col("n").cast("double") * col("stv").cast("double")
        - col("st").cast("double") * col("sv").cast("double")) /
        (col("n").cast("double") * col("stt").cast("double")
          - col("st").cast("double") * col("st").cast("double"))
      val resid = daily.crossJoin(broadcast(mo))
        .select(col("dt"),
          round(col("v").cast("double")
            - (col("sv").cast("double") - b * col("st").cast("double"))
              / col("n").cast("double")
            - b * col("t").cast("double")).cast("long").as("rq"))
      // DECIMAL(38,0)/HUGEINT accumulation + two-limb emission
      // (round-14 FenceProbe: Σrq² read 1.26e16 > 2^53 at sf0.1 and
      // the residuals scale with volume — int64 overflow by ~sf3)
      val big = org.apache.spark.sql.types.DecimalType(38, 0)
      val w = Window.orderBy(col("dt"))
      val dw = resid
        .withColumn("pr", lag(col("rq"), 1).over(w))
        // one operand cast to DECIMAL(38,0) BEFORE the multiply
        // (round-14 ADVICE): the per-row product itself can outgrow
        // int64 where Spark wraps silently but DuckDB raises — the
        // decimal multiply makes the whole path wrap-free, not just
        // the accumulation
        .agg(sum(col("rq").cast(big) * col("rq")).as("s2"),
          sum(when(col("pr").isNotNull,
            (col("rq") - col("pr")).cast(big) * (col("rq") - col("pr")))
            .otherwise(lit(0L).cast(big))).as("sd"),
          count(lit(1)).as("n"))
      dw.select(col("n"),
        r6(limbDouble("sd") / limbDouble("s2")).as("dw"),
        r6(lit(1.0) - limbDouble("sd") / limbDouble("s2") / 2)
          .as("rho1"))
    })
  )

  private val DotSql =
    """SUM(CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT) *
           CAST(round(CAST(qe[i] AS DOUBLE) * 1000000) AS BIGINT))"""

  private val L2Sql =
    """SUM((CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT) -
            CAST(round(CAST(qe[i] AS DOUBLE) * 1000000) AS BIGINT)) *
           (CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT) -
            CAST(round(CAST(qe[i] AS DOUBLE) * 1000000) AS BIGINT)))"""

  val oracle: Map[String, String] = Map(

    "q_llm_mrr" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe,
                      label AS qlabel
                    FROM embeddings WHERE vec_id <= 3),
            x AS (SELECT q.qid, em.vec_id, em.label, q.qlabel,
                    em.embedding AS e, q.qe
                  FROM embeddings em CROSS JOIN q
                  WHERE em.vec_id <> q.qid),
            u AS (SELECT qid, vec_id, label, qlabel, e, qe,
                    unnest(generate_series(1, len(e))) AS i FROM x),
            sc AS (SELECT qid, vec_id,
                     MAX(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                       AS rel,
                     $DotSql AS s
                   FROM u GROUP BY qid, vec_id, label, qlabel),
            rk AS (SELECT qid, vec_id, rel, row_number() OVER (
                     PARTITION BY qid ORDER BY s DESC, vec_id) AS pos
                   FROM sc),
            fr AS (SELECT qid, MIN(pos) AS first_rank FROM rk
                   WHERE rel = 1 GROUP BY qid),
            rrn AS (SELECT qid, first_rank,
                      CAST(round(1e9 / first_rank) AS BIGINT) AS rr_nano
                    FROM fr),
            m AS (SELECT CAST(SUM(rr_nano) AS DOUBLE) / 1e9 / COUNT(*)
                    AS mm FROM rrn)
         SELECT qid, CAST(first_rank AS BIGINT) AS first_rank,
                round(CAST(rr_nano AS DOUBLE) / 1e9, 6) AS rr,
                round(mm, 6) AS mrr
         FROM rrn, m ORDER BY qid""",

    "q_llm_rbo" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings
                    WHERE vec_id = 0),
            x AS (SELECT vec_id, embedding AS e, qe
                  FROM embeddings, q WHERE vec_id <> 0),
            u AS (SELECT vec_id, e, qe,
                    unnest(generate_series(1, len(e))) AS i FROM x),
            sc AS (SELECT vec_id, $DotSql AS dp, $L2Sql AS l2
                   FROM u GROUP BY vec_id),
            ra AS (SELECT vec_id, row_number() OVER (
                     ORDER BY dp DESC, vec_id) AS pa FROM sc
                   QUALIFY pa <= 10),
            rb AS (SELECT vec_id, row_number() OVER (
                     ORDER BY l2, vec_id) AS pb FROM sc
                   QUALIFY pb <= 10),
            bth AS (SELECT ra.vec_id, ra.pa, rb.pb
                     FROM ra JOIN rb USING (vec_id)),
            dg AS (SELECT unnest(generate_series(1, 10)) AS dd),
            xa AS (SELECT dg.dd, COUNT(b.vec_id) AS xd
                   FROM dg LEFT JOIN bth b
                     ON b.pa <= dg.dd AND b.pb <= dg.dd
                   GROUP BY dg.dd),
            terms AS (SELECT dd, xd,
                     CAST(round(0.1 * pow(0.9, dd - 1)
                       * CAST(xd AS DOUBLE) / dd * 1e9) AS BIGINT)
                       AS t_nano,
                     CASE WHEN dd = 10 THEN CAST(round(pow(0.9, 10.0)
                       * CAST(xd AS DOUBLE) / 10 * 1e9) AS BIGINT)
                       ELSE 0 END AS tail_nano
                   FROM xa)
         SELECT CAST(MAX(CASE WHEN dd = 10 THEN xd END) AS BIGINT)
                  AS overlap10,
                round(CAST(SUM(t_nano + tail_nano) AS DOUBLE) / 1e9, 6)
                  AS rbo10
         FROM terms""",

    "q_ts_durbin_watson" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      * 100 AS BIGINT)) // 100 AS BIGINT) AS v
                  FROM orders GROUP BY 1),
            tz AS (SELECT dt, v, CAST(row_number() OVER (ORDER BY dt)
                     AS BIGINT) AS t FROM daily),
            mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(t) AS BIGINT) AS st,
                     CAST(SUM(v) AS BIGINT) AS sv,
                     CAST(SUM(t * t) AS BIGINT) AS stt,
                     CAST(SUM(t * v) AS BIGINT) AS stv
                   FROM tz),
            bb AS (SELECT *,
                     (CAST(n AS DOUBLE) * stv - CAST(st AS DOUBLE) * sv)
                       / (CAST(n AS DOUBLE) * stt
                          - CAST(st AS DOUBLE) * st) AS b
                   FROM mo),
            resid AS (SELECT tz.dt,
                     CAST(round(CAST(tz.v AS DOUBLE)
                       - (CAST(bb.sv AS DOUBLE)
                          - bb.b * CAST(bb.st AS DOUBLE))
                         / CAST(bb.n AS DOUBLE)
                       - bb.b * CAST(tz.t AS DOUBLE)) AS BIGINT) AS rq
                   FROM tz, bb),
            lagd AS (SELECT rq, lag(rq) OVER (ORDER BY dt) AS pr
                     FROM resid),
            ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN pr IS NOT NULL
                       THEN (rq - pr) * (rq - pr) ELSE 0 END)
                       AS HUGEINT) AS sd,
                     CAST(SUM(rq * rq) AS HUGEINT) AS s2
                   FROM lagd),
            lm AS (SELECT n,
                     (CAST(CAST(sd // 1073741824 AS BIGINT) AS DOUBLE)
                        * 1073741824.0
                      + CAST(CAST(sd % 1073741824 AS BIGINT)
                        AS DOUBLE)) AS sdd,
                     (CAST(CAST(s2 // 1073741824 AS BIGINT) AS DOUBLE)
                        * 1073741824.0
                      + CAST(CAST(s2 % 1073741824 AS BIGINT)
                        AS DOUBLE)) AS s2d
                   FROM ag)
         SELECT n, round(sdd / s2d, 6) AS dw,
                round(1.0 - sdd / s2d / 2, 6) AS rho1
         FROM lm"""
  )
}
