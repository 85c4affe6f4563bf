package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 47: Garman-Klass volatility (the OHLC
  * estimator beside q_ts_parkinson's high/low form), the Cuzick
  * trend test (Wilcoxon-type trend across ordered groups — the
  * Jonckheere sibling on midrank machinery), two-half categorical
  * drift χ² (the event_type sibling of q_dq_drift_ks's numeric KS),
  * and RAKE keyphrase extraction (stopword-delimited candidate
  * phrases scored by word degree/frequency).
  *
  * Scale shape: garman_klass folds daily revenue into monthly OHLC
  * bars (calendar-bounded); cuzick folds the ≤350-cell
  * (line, quantity) grid after one linear groupBy; drift_chi2 is one
  * fact pass into the type×2 grid; RAKE is corpus-linear (per-doc
  * stopword run-splitting via a per-doc window) into vocab-bounded
  * word and phrase-type relations.
  *
  * Determinism contract (SURVEY §2.13): GK/OHLC picks open/close via
  * min_by/max_by on the unique day key (arg_min/arg_max in the
  * oracle); ln chains are shared expressions of exact cents. Cuzick
  * keeps DOUBLED midranks (2·Bprev + l + 1) so every rank sum is an
  * exact integer (T2 accumulates in DECIMAL(38,0), EMITS as BIGINT —
  * no 128-bit output cells, round-12 verdict); the tie term Σ(l³−l)
  * rides DECIMAL(38,0); z is one IEEE tail. drift_chi2 materializes the
  * full type×2 grid (absent cells as 0) and nano-quantizes per-cell
  * terms. RAKE phrases join tokens back in exact position order
  * (string_agg ORDER BY / array_sort(struct(pos, w))); phrase scores
  * are nano-quantized word-score sums; the top-15 is pinned by
  * (score_nano desc, phrase).
  */
object Extras121 {
  import Det._

  private val Big = DecimalType(38, 0)

  private val Stops = Seq("a", "the", "and", "of", "to", "in", "is", "it")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GARMAN-KLASS — monthly variance estimate from the month's
    // daily-revenue OHLC bar: 0.5·ln(H/L)² − (2ln2−1)·ln(C/O)².
    "q_ts_garman_klass" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val bars = daily
        .groupBy(trunc(col("dt"), "month").as("ym"))
        .agg(count(lit(1)).as("n_days"),
          min_by(col("y"), col("dt")).as("o"),
          max(col("y")).as("h"), min(col("y")).as("l"),
          max_by(col("y"), col("dt")).as("c"))
      val lhl = log(col("h").cast("double") / col("l").cast("double"))
      val lco = log(col("c").cast("double") / col("o").cast("double"))
      bars.select(col("ym"), col("n_days"), col("o"), col("h"),
          col("l"), col("c"),
          r6(lit(0.5) * lhl * lhl
            - (lit(2.0) * lit(0.6931471805599453) - lit(1.0))
              * lco * lco).as("gk_var"))
        .orderBy(col("ym"))
    }),

    // CUZICK TREND TEST — Wilcoxon-type trend of l_quantity across
    // the ordered line numbers 1..7: T = Σ g·R_g over pooled
    // midranks, tie-corrected variance. Doubled midranks keep every
    // rank sum an exact integer on the ≤350-cell (line, quantity)
    // grid.
    "q_agg_cuzick" -> ((s, d) => {
      val cell = Tables.lineitem(s, d)
        .select(col("l_linenumber").cast("long").as("g"),
          col("l_quantity").cast("long").as("v"))
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      val lv = Window.partitionBy(col("v"))
      val cumAll = Window.orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val sp = cell
        .withColumn("lj", sum(col("c")).over(lv))
        .withColumn("bj", sum(col("c")).over(cumAll))
        .withColumn("mr2", lit(2) * (col("bj") - col("lj"))
          + col("lj") + 1)
      val agg = sp.agg(
        sum(col("c")).as("n"),
        sum(col("c") * col("g")).as("l1"),
        sum(col("c") * col("g") * col("g")).as("l2"),
        sum(col("c").cast(Big) * col("mr2").cast(Big)
          * col("g").cast(Big)).as("t2"))
      val ties = sp.select(col("v"), col("lj")).distinct()
        .agg(sum(col("lj").cast(Big) * col("lj").cast(Big)
          * col("lj").cast(Big) - col("lj").cast(Big)).as("tt"))
      // Exact-integer restructure (round-11 verdict): the former
      // ~10-op double chain sat on a cross-engine round(x,6)
      // knife-edge. Numerator 2*(T - E[T]) = t2 - (n+1)*l1 and
      // vr = B/C are exact DECIMAL(38,0)/HUGEINT; the shared IEEE
      // tail is 3 correctly-rounded ops (div, sqrt, div; /2.0 is
      // exact) — engine-exact per the q_agg_gini precedent.
      // Round-12 ADVICE headroom restructure: the textbook
      // B = (n+1)*(n*l2 - l1^2)*(n^3 - n - tt) peaked ~4e35 at
      // sf0.1 (~n^6 growth — silent DECIMAL(38,0) overflow at a
      // 3-4x larger input). B and C = 12*n*(n^3 - n) share the
      // EXACT factor (n+1) (since n^3 - n = n(n-1)(n+1)); dividing
      // it out of both BEFORE the triple product leaves
      // B' = (n*l2 - l1^2)*(n^3 - n - tt)  (~2.6e29 at sf0.1) and
      // C' = 12*n^2*(n-1), moving the overflow horizon to ~50x
      // sf0.1 with the identical 3-op IEEE tail.
      // t2_stat emits as BIGINT (~1.4e10, 8 digits of headroom):
      // 128-bit output cells are the one driver-hash-fragile class
      // (round-12 verdict; fenced by OutputSchemaSpec).
      val nB = col("n").cast(Big)
      val aNum = col("t2") - (nB + 1) * col("l1").cast(Big)
      val n3n = nB * nB * nB - nB
      val bNum =
        (nB * col("l2").cast(Big)
          - col("l1").cast(Big) * col("l1").cast(Big)) *
        (n3n - col("tt"))
      val cDen = lit(12).cast(Big) * nB * nB * (nB - 1)
      agg.crossJoin(broadcast(ties))
        .select(col("n").as("n_rows"),
          col("t2").cast("long").as("t2_stat"),
          r6((aNum.cast("double") / lit(2.0)) /
            sqrt(bNum.cast("double") / cDen.cast("double"))).as("z"))
    }),

    // CATEGORICAL DRIFT χ² — event_type mix of the first vs second
    // half of the event window (split at the exact midpoint of the
    // epoch-µs span): the categorical sibling of q_dq_drift_ks.
    "q_dq_drift_chi2" -> ((s, d) => {
      val base = Tables.events(s, d)
        .select(col("event_type").as("et"), tsUs(col("ts")).as("t"))
      val mid = base.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      val halves = base.crossJoin(broadcast(mid))
        .withColumn("half", when(col("t") < col("mid"), "a")
          .otherwise("b"))
        .groupBy(col("et"), col("half")).agg(count(lit(1)).as("o"))
      val grid = halves.select(col("et")).distinct()
        .crossJoin(broadcast(
          halves.select(col("half")).distinct()))
        .join(halves, Seq("et", "half"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .withColumn("rm", sum(col("o")).over(
          Window.partitionBy(col("et"))))
        .withColumn("cm", sum(col("o")).over(
          Window.partitionBy(col("half"))))
        .withColumn("nn", sum(col("o")).over(
          Window.partitionBy(lit(1))))
      val e = col("rm").cast("double") * col("cm").cast("double") /
        col("nn").cast("double")
      val term = (col("o").cast("double") - e) *
        (col("o").cast("double") - e) / e
      grid
        .withColumn("term_nano", round(term * lit(1e9)).cast("long"))
        .agg(countDistinct(col("et")).as("n_types"),
          max(when(col("half") === "a", col("cm"))).as("n_first"),
          max(when(col("half") === "b", col("cm"))).as("n_second"),
          sum(col("term_nano")).as("sum_nano"))
        .select(col("n_types"), col("n_first"), col("n_second"),
          r6(col("sum_nano").cast("double") / lit(1e9))
            .as("chi2_drift"))
    }),

    // RAKE KEYPHRASES — stopword-delimited candidate phrases (≤ 4
    // tokens, stated cap) scored by Σ member word degree/frequency;
    // the corpus top-15.
    "q_llm_rake_keyphrases" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("stop",
          col("w").isin(Stops.map(lit(_)): _*).cast("int"))
        .withColumn("run", sum(col("stop")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      val phr = toks.where(col("stop") === 0)
        .groupBy(col("doc_id"), col("run"))
        .agg(count(lit(1)).as("ntok"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ").as("phrase"))
        .where(col("ntok") <= 4)
      val wordStats = phr
        .select(col("ntok"), explode(split(col("phrase"), " ")).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("ntok")).as("deg"))
        .withColumn("score_nano",
          round(col("deg").cast("double") / col("freq").cast("double")
            * lit(1e9)).cast("long"))
      val ptype = phr.groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occ"))
      val scored = ptype
        .select(col("phrase"), col("n_occ"),
          explode(split(col("phrase"), " ")).as("w"))
        .join(wordStats.select(col("w"), col("score_nano")), "w")
        .groupBy(col("phrase"), col("n_occ"))
        .agg(sum(col("score_nano")).as("p_nano"))
      scored
        .withColumn("rank", row_number().over(
          Window.orderBy(col("p_nano").desc, col("phrase")))
          .cast("long"))
        .where(col("rank") <= 15)
        .select(col("rank"), col("phrase"), col("n_occ"),
          r6(col("p_nano").cast("double") / lit(1e9)).as("rake_score"))
        .orderBy(col("rank"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_garman_klass" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            bars AS (SELECT date_trunc('month', dt) AS ym,
                    CAST(COUNT(*) AS BIGINT) AS n_days,
                    arg_min(y, dt) AS o, MAX(y) AS h, MIN(y) AS l,
                    arg_max(y, dt) AS c
                  FROM daily GROUP BY 1)
         SELECT ym, n_days, o, h, l, c,
                round(0.5 * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
                        * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
                  - (2.0 * 0.6931471805599453 - 1.0)
                    * ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))
                    * ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE)), 6)
                  AS gk_var
         FROM bars ORDER BY ym""",

    "q_agg_cuzick" ->
      """WITH cell AS (SELECT CAST(l_linenumber AS BIGINT) AS g,
                    CAST(l_quantity AS BIGINT) AS v,
                    CAST(COUNT(*) AS BIGINT) AS c
                 FROM lineitem GROUP BY 1, 2),
            sp AS (SELECT g, v, c,
                    CAST(SUM(c) OVER (PARTITION BY v) AS BIGINT) AS lj,
                    CAST(SUM(c) OVER (ORDER BY v
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS bj
                  FROM cell),
            mr AS (SELECT g, v, c, lj,
                    2 * (bj - lj) + lj + 1 AS mr2
                  FROM sp),
            a AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                    CAST(SUM(c * g) AS BIGINT) AS l1,
                    CAST(SUM(c * g * g) AS BIGINT) AS l2,
                    CAST(SUM(CAST(c AS HUGEINT) * CAST(mr2 AS HUGEINT)
                      * CAST(g AS HUGEINT)) AS HUGEINT) AS t2
                  FROM mr),
            t AS (SELECT CAST(SUM(CAST(lj AS HUGEINT) * CAST(lj AS HUGEINT)
                      * CAST(lj AS HUGEINT) - CAST(lj AS HUGEINT))
                      AS HUGEINT) AS tt
                  FROM (SELECT DISTINCT v, lj FROM sp)),
            f AS (SELECT n, t2,
                    t2 - (CAST(n AS HUGEINT) + 1) * CAST(l1 AS HUGEINT)
                      AS a_num,
                    (CAST(n AS HUGEINT) * CAST(l2 AS HUGEINT)
                       - CAST(l1 AS HUGEINT) * CAST(l1 AS HUGEINT))
                      * (CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                           * CAST(n AS HUGEINT)
                         - CAST(n AS HUGEINT) - tt) AS b_num,
                    12 * CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                      * (CAST(n AS HUGEINT) - 1) AS c_den
                  FROM a, t)
         SELECT n AS n_rows, CAST(t2 AS BIGINT) AS t2_stat,
                round((CAST(a_num AS DOUBLE) / 2.0)
                  / sqrt(CAST(b_num AS DOUBLE) / CAST(c_den AS DOUBLE)),
                  6) AS z
         FROM f""",

    "q_dq_drift_chi2" ->
      """WITH base AS (SELECT event_type AS et,
                    epoch_us(ts::TIMESTAMP) AS t
                 FROM events),
            mid AS (SELECT (MIN(t) + MAX(t)) // 2 AS mid FROM base),
            halves AS (SELECT et,
                      CASE WHEN t < mid THEN 'a' ELSE 'b' END AS half,
                      CAST(COUNT(*) AS BIGINT) AS o
                    FROM base, mid GROUP BY 1, 2),
            grid AS (SELECT e.et, h.half, COALESCE(hv.o, 0) AS o
                     FROM (SELECT DISTINCT et FROM halves) e
                     CROSS JOIN (SELECT DISTINCT half FROM halves) h
                     LEFT JOIN halves hv
                       ON hv.et = e.et AND hv.half = h.half),
            m AS (SELECT et, half, o,
                    CAST(SUM(o) OVER (PARTITION BY et) AS BIGINT) AS rm,
                    CAST(SUM(o) OVER (PARTITION BY half) AS BIGINT)
                      AS cm,
                    CAST(SUM(o) OVER () AS BIGINT) AS nn
                  FROM grid),
            q AS (SELECT et, half, cm,
                    CAST(round((CAST(o AS DOUBLE)
                        - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(nn AS DOUBLE))
                      * (CAST(o AS DOUBLE)
                        - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(nn AS DOUBLE))
                      / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(nn AS DOUBLE)) * 1e9) AS BIGINT)
                      AS term_nano
                  FROM m)
         SELECT CAST(COUNT(DISTINCT et) AS BIGINT) AS n_types,
                MAX(CASE WHEN half = 'a' THEN cm END) AS n_first,
                MAX(CASE WHEN half = 'b' THEN cm END) AS n_second,
                round(CAST(SUM(term_nano) AS DOUBLE) / 1e9, 6)
                  AS chi2_drift
         FROM q""",

    "q_llm_rake_keyphrases" ->
      """WITH toks AS (SELECT doc_id, i AS pos, ws[i] AS w,
                    CASE WHEN ws[i] IN ('a', 'the', 'and', 'of', 'to',
                                        'in', 'is', 'it')
                         THEN 1 ELSE 0 END AS stop
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws))) AS i
                       FROM (SELECT doc_id, string_split(text, ' ') AS ws
                             FROM documents) t0) t1),
            runs AS (SELECT doc_id, pos, w, stop,
                    CAST(SUM(stop) OVER (PARTITION BY doc_id
                      ORDER BY pos) AS BIGINT) AS run
                  FROM toks),
            phr AS (SELECT doc_id, run,
                    CAST(COUNT(*) AS BIGINT) AS ntok,
                    string_agg(w, ' ' ORDER BY pos) AS phrase
                  FROM runs WHERE stop = 0
                  GROUP BY 1, 2 HAVING COUNT(*) <= 4),
            ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
                    CAST(SUM(ntok) AS BIGINT) AS deg
                  FROM (SELECT ntok, unnest(string_split(phrase, ' '))
                          AS w
                        FROM phr) t
                  GROUP BY 1),
            wsc AS (SELECT w,
                    CAST(round(CAST(deg AS DOUBLE)
                      / CAST(freq AS DOUBLE) * 1e9) AS BIGINT)
                      AS score_nano
                  FROM ws),
            ptype AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ
                      FROM phr GROUP BY 1),
            scored AS (SELECT p.phrase, p.n_occ,
                    CAST(SUM(wsc.score_nano) AS BIGINT) AS p_nano
                  FROM (SELECT phrase, n_occ,
                          unnest(string_split(phrase, ' ')) AS w
                        FROM ptype) p
                  JOIN wsc ON p.w = wsc.w
                  GROUP BY 1, 2),
            rk AS (SELECT phrase, n_occ, p_nano,
                    CAST(row_number() OVER (ORDER BY p_nano DESC, phrase)
                      AS BIGINT) AS rank
                   FROM scored)
         SELECT rank, phrase, n_occ,
                round(CAST(p_nano AS DOUBLE) / 1e9, 6) AS rake_score
         FROM rk WHERE rank <= 15 ORDER BY rank"""
  )
}
