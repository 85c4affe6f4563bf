package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 46: Lomb-Scargle periodogram (the
  * uneven-sampling spectral estimator — the classical q_ts_periodogram
  * assumes a dense grid; LS handles the gapped daily revenue series
  * natively), customer winback/dormancy gap analysis, and the
  * bigram Jaccard overlap matrix between document sources.
  *
  * Scale shape: LS crosses the calendar-bounded daily relation with a
  * 28-row broadcast period spine (two passes: τ fold, then power
  * fold); winback is one per-customer lag pass; bigram_jaccard
  * equi-joins the distinct (source, bigram) relation with itself on
  * the bigram — vocab²-bounded (distinct adjacent pairs), source-pair
  * output.
  *
  * Determinism contract (SURVEY §2.13): LS phases use the shared
  * (2·π)/p ... ω·(t−τ) expression chains on day indices rebased to
  * the series start (the q_ts_periodogram argument-magnitude
  * discipline); every cross-row float term (sin/cos products) is
  * nano-quantized before its integer sum; τ = atan2(Σsin, Σcos)/(2ω)
  * from the quantized sums; the variance normalizer is exact cents
  * moments. winback is exact integer day gaps; bigrams are the
  * space-joined adjacent token pairs of the q_llm_bigram_entropy
  * extraction (shared idiom both engines).
  */
object Extras120 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Shared Lomb-Scargle periodogram core — (p, n_days, power, s2)
    * per trial period 3..30: the chain behind q_ts_lombscargle, also
    * consumed by the round-12 false-alarm readout
    * (q_ts_lombscargle_fap). */
  private def lombCore(s: SparkSession, d: String): DataFrame = {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .select(unix_date(col("dt")).cast("long").as("td"), col("y"))
      val glob = daily.agg(count(lit(1)).as("nn"), sum(col("y")).as("sc"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("ssc"),
        min(col("td")).as("t0"))
      // periods 3..30: p = 2 is the Nyquist edge of daily sampling,
      // where sin(ω(t−τ)) collapses to the 1e-13 noise floor and the
      // SS normalizer quantizes to zero — excluded by construction.
      val freqs = s.range(3, 31).select(col("id").as("p"))
      val base = daily.crossJoin(broadcast(glob))
        .withColumn("t", (col("td") - col("t0")).cast("double"))
        .withColumn("ymil", col("y").cast("double") / lit(1e8))
        .crossJoin(broadcast(freqs))
        .withColumn("om",
          lit(2.0) * lit(math.Pi) / col("p").cast("double"))
      val ph1 = base
        .withColumn("s2n",
          round(sin(col("om") * lit(2.0) * col("t")) * lit(1e9))
            .cast("long"))
        .withColumn("c2n",
          round(cos(col("om") * lit(2.0) * col("t")) * lit(1e9))
            .cast("long"))
        .groupBy(col("p"))
        .agg(sum(col("s2n")).as("ss2"), sum(col("c2n")).as("cc2"))
        .select(col("p"),
          (atan2(col("ss2").cast("double") / lit(1e9),
            col("cc2").cast("double") / lit(1e9)) /
            (lit(2.0) * (lit(2.0) * lit(math.Pi)
              / col("p").cast("double")))).as("tau"))
      val mu = col("sc").cast("double") / lit(1e8) /
        col("nn").cast("double")
      val ph2 = base.join(broadcast(ph1), "p")
        .withColumn("phi", col("om") * (col("t") - col("tau")))
        .withColumn("yc", col("ymil") - mu)
        .withColumn("an",
          round(col("yc") * cos(col("phi")) * lit(1e9)).cast("long"))
        .withColumn("bn",
          round(col("yc") * sin(col("phi")) * lit(1e9)).cast("long"))
        .withColumn("ccn",
          round(cos(col("phi")) * cos(col("phi")) * lit(1e9))
            .cast("long"))
        .withColumn("ssn",
          round(sin(col("phi")) * sin(col("phi")) * lit(1e9))
            .cast("long"))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("an")).as("a"), sum(col("bn")).as("b"),
          sum(col("ccn")).as("cc"), sum(col("ssn")).as("ss"),
          max(col("nn")).as("nn"), max(col("sc")).as("sc"),
          max(col("ssc")).as("ssc"))
      val aD = col("a").cast("double") / lit(1e9)
      val bD = col("b").cast("double") / lit(1e9)
      val power = lit(0.5) *
        (aD * aD / (col("cc").cast("double") / lit(1e9))
          + bD * bD / (col("ss").cast("double") / lit(1e9)))
      val s2 = (col("nn").cast(Big) * col("ssc")
        - col("sc").cast(Big) * col("sc").cast(Big)).cast("double") /
        lit(1e16) /
        (col("nn").cast("double") * (col("nn") - 1).cast("double"))
      ph2.select(col("p"), col("n_days"),
        power.as("power"), s2.as("s2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // LOMB-SCARGLE — power at trial periods 2..30 days over the
    // mean-centered daily revenue (millions), with the classical
    // variance normalization.
    "q_ts_lombscargle" -> ((s, d) =>
      lombCore(s, d)
        .select(col("p").as("period_days"), col("n_days"),
          r6(col("power")).as("ls_power"),
          r6(col("power") / col("s2")).as("ls_norm"))
        .orderBy(col("period_days"))),

    // LOMB-SCARGLE FALSE-ALARM PROBABILITY (round-11 verdict item 9 —
    // the periodogram shipped without its significance readout):
    // Scargle's closed-form M-test FAP(z) = 1 − (1 − e^{−z})^M with
    // M = 28 independent trial frequencies. The normalized power z is
    // nano-quantized FIRST on both engines (shared rounding boundary),
    // e^{−z} is nano-quantized next, and the 28th power is an explicit
    // multiplication chain (b²→b⁴→b⁸→b¹⁶, b²⁸ = b¹⁶·b⁸·b⁴) of
    // correctly-rounded IEEE multiplies — never pow(), whose last-ulp
    // behavior differs across engines.
    "q_ts_lombscargle_fap" -> ((s, d) => {
      val base = lombCore(s, d)
        .withColumn("z9",
          round(col("power") / col("s2") * lit(1e9)).cast("long"))
        .withColumn("em9",
          round(exp(-(col("z9").cast("double") / lit(1e9))) * lit(1e9))
            .cast("long"))
        .withColumn("b1",
          (lit(1000000000L) - col("em9")).cast("double") / lit(1e9))
      val b2 = col("b1") * col("b1")
      val b4 = b2 * b2
      val b8 = b4 * b4
      val b16 = b8 * b8
      base.select(col("p").as("period_days"), col("n_days"),
          r6(col("z9").cast("double") / lit(1e9)).as("z"),
          r6(lit(1.0) - b16 * b8 * b4).as("fap"))
        .orderBy(col("period_days"))
    }),

    // WINBACK — distribution of per-customer order-day gaps in
    // 90-day buckets (capped at 8 = 2+ years): how long do customers
    // go dormant before returning?
    "q_evt_winback" -> ((s, d) => {
      val days = Tables.orders(s, d)
        .select(col("o_custkey").as("c"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("td"))
        .distinct()
      val w = Window.partitionBy(col("c")).orderBy(col("td"))
      val gaps = days
        .withColumn("gap", col("td") - lag(col("td"), 1).over(w))
        .where(col("gap").isNotNull)
        .withColumn("bucket", least(expr("gap div 90"), lit(8L)))
      gaps.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          countDistinct(col("c")).as("n_customers"),
          sum(col("gap")).as("sum_days"))
        .select(col("bucket"), col("n_gaps"), col("n_customers"),
          r6(col("sum_days").cast("double")
            / col("n_gaps").cast("double")).as("avg_gap_days"))
        .orderBy(col("bucket"))
    }),

    // BIGRAM JACCARD — overlap of distinct adjacent-token-pair sets
    // between document sources: the PHRASE-level contamination view
    // (q_llm_source_overlap is single-token; shared bigrams survive
    // vocabulary overlap that shared unigrams overstate).
    "q_llm_bigram_jaccard" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val ents = Tables.documents(s, d)
        .select(col("source"), explode(zip_with(
          slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
          slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
        .distinct()
      val sizes = ents.groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      val inter = ents.select(col("source").as("s1"), col("bg"))
        .join(ents.select(col("source").as("s2"), col("bg")), "bg")
        .where(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("s1"),
          col("n").as("n1"))), "s1")
        .join(broadcast(sizes.select(col("source").as("s2"),
          col("n").as("n2"))), "s2")
        .select(col("s1"), col("s2"), col("n1"), col("n2"),
          col("inter"),
          r6(col("inter").cast("double") /
            (col("n1") + col("n2") - col("inter")).cast("double"))
            .as("jaccard"))
        .orderBy(col("s1"), col("s2"))
    })
  )

  /** Shared SQL core of the Lomb-Scargle oracles — CTE chain through
    * f(p, n_days, power, s2), mirroring lombCore. */
  private val lombCoreSql: String =
      """daily AS (SELECT CAST(CAST(o_orderdate AS DATE)
                      - DATE '1970-01-01' AS BIGINT) AS td,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            gl AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                    CAST(SUM(y) AS BIGINT) AS sc,
                    CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                      AS HUGEINT) AS ssc,
                    CAST(MIN(td) AS BIGINT) AS t0 FROM daily),
            freqs AS (SELECT CAST(unnest(generate_series(3, 30))
                      AS BIGINT) AS p),
            base AS (SELECT p, nn, sc, ssc,
                    CAST(td - t0 AS DOUBLE) AS t,
                    CAST(y AS DOUBLE) / 1e8 AS ymil,
                    2.0 * pi() / CAST(p AS DOUBLE) AS om
                  FROM daily, gl, freqs),
            ph1 AS (SELECT p,
                    CAST(SUM(CAST(round(sin(om * 2.0 * t) * 1e9)
                      AS BIGINT)) AS BIGINT) AS ss2,
                    CAST(SUM(CAST(round(cos(om * 2.0 * t) * 1e9)
                      AS BIGINT)) AS BIGINT) AS cc2
                  FROM base GROUP BY 1),
            tau AS (SELECT p,
                    atan2(CAST(ss2 AS DOUBLE) / 1e9,
                          CAST(cc2 AS DOUBLE) / 1e9)
                      / (2.0 * (2.0 * pi() / CAST(p AS DOUBLE))) AS tau
                  FROM ph1),
            ph2 AS (SELECT b.p,
                    CAST(COUNT(*) AS BIGINT) AS n_days,
                    CAST(SUM(CAST(round((ymil - CAST(sc AS DOUBLE) / 1e8
                        / CAST(nn AS DOUBLE))
                      * cos(om * (t - tau)) * 1e9) AS BIGINT)) AS BIGINT)
                      AS a,
                    CAST(SUM(CAST(round((ymil - CAST(sc AS DOUBLE) / 1e8
                        / CAST(nn AS DOUBLE))
                      * sin(om * (t - tau)) * 1e9) AS BIGINT)) AS BIGINT)
                      AS b,
                    CAST(SUM(CAST(round(cos(om * (t - tau))
                      * cos(om * (t - tau)) * 1e9) AS BIGINT)) AS BIGINT)
                      AS cc,
                    CAST(SUM(CAST(round(sin(om * (t - tau))
                      * sin(om * (t - tau)) * 1e9) AS BIGINT)) AS BIGINT)
                      AS ss,
                    MAX(nn) AS nn, MAX(sc) AS sc, MAX(ssc) AS ssc
                  FROM base b JOIN tau ON b.p = tau.p GROUP BY 1),
            f AS (SELECT p, n_days,
                    0.5 * ((CAST(a AS DOUBLE) / 1e9)
                        * (CAST(a AS DOUBLE) / 1e9)
                        / (CAST(cc AS DOUBLE) / 1e9)
                      + (CAST(b AS DOUBLE) / 1e9)
                        * (CAST(b AS DOUBLE) / 1e9)
                        / (CAST(ss AS DOUBLE) / 1e9)) AS power,
                    CAST(CAST(nn AS HUGEINT) * ssc
                        - CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT)
                      AS DOUBLE) / 1e16
                      / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))
                      AS s2
                  FROM ph2)"""

  val oracle: Map[String, String] = Map(

    "q_ts_lombscargle" ->
      s"""WITH $lombCoreSql
         SELECT p AS period_days, n_days,
                round(power, 6) AS ls_power,
                round(power / s2, 6) AS ls_norm
         FROM f ORDER BY period_days""",

    "q_ts_lombscargle_fap" ->
      s"""WITH $lombCoreSql,
            zq AS (SELECT p, n_days,
                    CAST(round(power / s2 * 1e9) AS BIGINT) AS z9
                  FROM f),
            em AS (SELECT p, n_days, z9,
                    CAST(round(exp(-(CAST(z9 AS DOUBLE) / 1e9)) * 1e9)
                      AS BIGINT) AS em9
                  FROM zq),
            b1t AS (SELECT p, n_days, z9,
                    CAST(1000000000 - em9 AS DOUBLE) / 1e9 AS b1
                  FROM em),
            b2t AS (SELECT p, n_days, z9, b1 * b1 AS b2 FROM b1t),
            b4t AS (SELECT p, n_days, z9, b2 * b2 AS b4, b2 FROM b2t),
            b8t AS (SELECT p, n_days, z9, b4 * b4 AS b8, b4 FROM b4t),
            b16t AS (SELECT p, n_days, z9, b8 * b8 AS b16, b8, b4
                     FROM b8t)
         SELECT p AS period_days, n_days,
                round(CAST(z9 AS DOUBLE) / 1e9, 6) AS z,
                round(1.0 - b16 * b8 * b4, 6) AS fap
         FROM b16t ORDER BY period_days""",

    "q_evt_winback" ->
      """WITH days AS (SELECT DISTINCT o_custkey AS c,
                    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                      AS BIGINT) AS td
                 FROM orders),
            gaps AS (SELECT c,
                    td - lag(td) OVER (PARTITION BY c ORDER BY td) AS gap
                  FROM days),
            b AS (SELECT c, gap,
                    least(gap // 90, 8) AS bucket
                  FROM gaps WHERE gap IS NOT NULL)
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                CAST(COUNT(DISTINCT c) AS BIGINT) AS n_customers,
                round(CAST(SUM(gap) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS avg_gap_days
         FROM b GROUP BY 1 ORDER BY bucket""",

    "q_llm_bigram_jaccard" ->
      """WITH ents AS (SELECT DISTINCT source, bg FROM
                   (SELECT source, ws[i] || ' ' || ws[i + 1] AS bg
                    FROM (SELECT source, ws,
                            unnest(generate_series(1, len(ws) - 1)) AS i
                          FROM (SELECT source, string_split(text, ' ')
                                  AS ws
                                FROM documents) t0) t1)),
            sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                      FROM ents GROUP BY 1),
            inter AS (SELECT a.source AS s1, b.source AS s2,
                        CAST(COUNT(*) AS BIGINT) AS inter
                      FROM ents a JOIN ents b
                        ON a.bg = b.bg AND a.source < b.source
                      GROUP BY 1, 2)
         SELECT s1, s2, sa.n AS n1, sb.n AS n2, inter,
                round(CAST(inter AS DOUBLE)
                  / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON inter.s1 = sa.source
         JOIN sizes sb ON inter.s2 = sb.source
         ORDER BY s1, s2"""
  )
}
