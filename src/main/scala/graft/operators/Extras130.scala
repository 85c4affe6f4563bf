package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 56: Welch's averaged periodogram (the
  * variance-reduced PSD estimate — q_ts_periodogram is one window;
  * Welch averages 64-day segments at 50% overlap), a deterministic
  * bootstrap confidence interval for the daily-revenue median (the
  * order-statistic sibling of q_ts_block_bootstrap's mean SE), and
  * per-source Pearson correlation between document character length
  * and token count (the feature-redundancy screen a quality-filter
  * pipeline runs before training a classifier).
  *
  * Scale shape: welch joins the calendar-day relation to the bounded
  * segment spine (crossJoin(broadcast) + range filter) × an 8-row
  * harmonic spine; median_boot builds a 50×n broadcast-pick spine and
  * sorts per resample (bounded by the calendar); feature_corr is one
  * corpus pass of exact per-source moments.
  *
  * Determinism contract (SURVEY §2.13): welch quantizes cos/sin to
  * integer micro units (the q_ts_periodogram discipline), folds exact
  * y·c integer products per segment, and nano-quantizes each
  * segment's power before the cross-segment mean. median_boot picks
  * ride the portable md5long hash; each resample's median is the
  * exact lower-median position ordered by (y, pick index); the CI
  * bounds are fixed order statistics (3rd and 48th of 50).
  * feature_corr is exact DECIMAL(38,0) moments with one IEEE tail.
  */
object Extras130 {
  import Det._

  private val Big = org.apache.spark.sql.types.DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WELCH PSD — 64-day segments, 50% overlap, harmonics k = 1..8.
    "q_ts_welch" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
          + " AS BIGINT)) div 100000").as("y"))
        .withColumn("t", (row_number().over(Window.orderBy(col("dt")))
          - 1).cast("long"))
      val nT = daily.agg(count(lit(1)).as("nn"))
      val segs = s.range(0, 1024).select(col("id").as("sg"))
      val ks = s.range(1, 9).select(col("id").as("k"))
      val member = daily.crossJoin(broadcast(nT))
        .crossJoin(broadcast(segs))
        .where(col("sg") * 32 + 63 < col("nn") &&
          col("t").between(col("sg") * 32, col("sg") * 32 + 63))
        .withColumn("j", col("t") - col("sg") * 32)
        .crossJoin(broadcast(ks))
      val ang = lit(2.0) * lit(math.Pi) * col("k").cast("double") *
        col("j").cast("double") / lit(64.0)
      val per = member
        .withColumn("c", round(cos(ang) * lit(1e6)).cast("long"))
        .withColumn("s2", round(sin(ang) * lit(1e6)).cast("long"))
        .groupBy(col("sg"), col("k"))
        .agg(sum(col("y") * col("c")).as("a"),
          sum(col("y") * col("s2")).as("b"))
        // a²+b² reads 1.7e18 at sf0.01 (∝ volume²) — already past
        // 2^53, so its double emission must be the two-limb split,
        // not a direct DECIMAL→DOUBLE cast (the round-15 decimal
        // FenceProbe class; limbDouble is divergence-free to 2^93,
        // horizon ~sf700 here)
        .withColumn("ss", col("a").cast(Big) * col("a").cast(Big)
          + col("b").cast(Big) * col("b").cast(Big))
        .withColumn("p_nano",
          round(limbDouble("ss")
            / lit(1e12) / lit(64.0) * lit(1e9)).cast("long"))
      // DECIMAL(38,0)/HUGEINT accumulation + two-limb emission
      // (round-14 FenceProbe: Σp_nano read 4.3e17 > 2^53 at sf0.1,
      // ∝ volume² — int64 overflow by ~sf0.5)
      per.groupBy(col("k"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("p_nano").cast(Big)).as("sum_nano"))
        .select(col("k").as("harmonic"), col("n_segments"),
          r6(limbDouble("sum_nano") / lit(1e9)
            / col("n_segments").cast("double")).as("welch_psd"))
        .orderBy(col("harmonic"))
    }),

    // BOOTSTRAP MEDIAN CI — 50 deterministic md5 resamples (with
    // replacement) of the daily series; per-resample exact lower
    // median; CI = 3rd and 48th of the 50 sorted medians.
    "q_ts_median_boot_ci" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("i", row_number().over(Window.orderBy(col("dt")))
          .cast("long"))
      val nT = daily.agg(count(lit(1)).as("nn"))
      val obs = daily.crossJoin(broadcast(nT))
        .withColumn("r0", row_number().over(
          Window.orderBy(col("y"), col("i"))))
        .where(col("r0") === expr("(nn + 1) div 2"))
        .select(col("y").as("obs_med"))
      // picks: one row per (resample, draw); j indexes the draw
      val spine = s.range(0, 50).select(col("id").as("r"))
        .crossJoin(broadcast(nT))
        .select(col("r"), explode(expr("sequence(1, nn)")).as("j"),
          col("nn"))
      val picks = spine
        .withColumn("i", pmod(
          md5long(concat(col("r"), lit("_"), col("j"))), col("nn")) + 1)
        .join(daily.select(col("i"), col("y")), "i")
      val med = picks
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("r")).orderBy(col("y"), col("j"))))
        .where(col("rk") === expr("(nn + 1) div 2"))
        .select(col("r"), col("y").as("med"))
      val ci = med
        .withColumn("pos", row_number().over(
          Window.orderBy(col("med"), col("r"))))
        .where(col("pos").isin(3, 48))
        .groupBy()
        .agg(count(lit(1)).as("n_bounds"),
          min(col("med")).as("lo"), max(col("med")).as("hi"))
      ci.crossJoin(broadcast(obs))
        .select(lit(50L).as("n_resamples"),
          r6(col("obs_med").cast("double") / lit(100.0))
            .as("obs_median_dollars"),
          r6(col("lo").cast("double") / lit(100.0))
            .as("ci_lo_dollars"),
          r6(col("hi").cast("double") / lit(100.0))
            .as("ci_hi_dollars"))
    }),

    // FEATURE CORR — per source, Pearson r between n_chars and
    // whitespace token count per doc.
    "q_llm_feature_corr" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"),
          length(col("text")).cast("long").as("x"),
          size(split(col("text"), " ")).cast("long").as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"),
          sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
          sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      val nD = col("n").cast("double")
      val cov = nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val vx = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val vy = nD * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")
      per.select(col("source"), col("n").as("n_docs"),
          r6(cov / sqrt(vx * vy)).as("len_token_corr"))
        .orderBy(col("source"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_welch" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) // 100000 AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT y,
                    CAST(row_number() OVER (ORDER BY dt) - 1 AS BIGINT)
                      AS t
                  FROM daily),
            nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM idx),
            segs AS (SELECT CAST(unnest(generate_series(0, 1023))
                      AS BIGINT) AS sg),
            ks AS (SELECT CAST(unnest(generate_series(1, 8)) AS BIGINT)
                     AS k),
            member AS (SELECT i.y, i.t - s.sg * 32 AS j, s.sg, k.k
                    FROM idx i, nt, segs s, ks k
                    WHERE s.sg * 32 + 63 < nt.nn
                      AND i.t BETWEEN s.sg * 32 AND s.sg * 32 + 63),
            per AS (SELECT sg, k,
                    CAST(SUM(y * CAST(round(cos(2 * pi()
                      * CAST(k AS DOUBLE) * CAST(j AS DOUBLE) / 64.0)
                      * 1e6) AS BIGINT)) AS BIGINT) AS a,
                    CAST(SUM(y * CAST(round(sin(2 * pi()
                      * CAST(k AS DOUBLE) * CAST(j AS DOUBLE) / 64.0)
                      * 1e6) AS BIGINT)) AS BIGINT) AS b
                  FROM member GROUP BY 1, 2),
            pss AS (SELECT sg, k,
                    CAST(a AS HUGEINT) * CAST(a AS HUGEINT)
                      + CAST(b AS HUGEINT) * CAST(b AS HUGEINT) AS ss
                  FROM per),
            pw AS (SELECT sg, k,
                    CAST(round(
                      (CAST(CAST(ss // 1073741824 AS BIGINT) AS DOUBLE)
                         * 1073741824.0
                       + CAST(CAST(ss % 1073741824 AS BIGINT)
                         AS DOUBLE))
                      / 1e12 / 64.0 * 1e9) AS BIGINT)
                      AS p_nano
                  FROM pss),
            ag AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_segments,
                     CAST(SUM(p_nano) AS HUGEINT) AS sum_nano
                   FROM pw GROUP BY 1)
         SELECT k AS harmonic, n_segments,
                round((CAST(CAST(sum_nano // 1073741824 AS BIGINT)
                    AS DOUBLE) * 1073741824.0
                  + CAST(CAST(sum_nano % 1073741824 AS BIGINT)
                    AS DOUBLE)) / 1e9
                  / CAST(n_segments AS DOUBLE), 6) AS welch_psd
         FROM ag ORDER BY harmonic""",

    "q_ts_median_boot_ci" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT y,
                    CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS i
                  FROM daily),
            nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM idx),
            obs AS (SELECT y AS obs_med FROM (
                    SELECT y, row_number() OVER (ORDER BY y, i) AS r0,
                      nn
                    FROM idx, nt) t WHERE r0 = (nn + 1) // 2),
            spine AS (SELECT r.r, j.j, nt.nn
                    FROM (SELECT unnest(generate_series(0, 49)) AS r) r
                    CROSS JOIN nt
                    CROSS JOIN (SELECT unnest(generate_series(1,
                      (SELECT nn FROM nt))) AS j) j),
            picks AS (SELECT s.r, s.j, s.nn, i.y
                    FROM (SELECT r, j, nn,
                            CAST(('0x' || substr(md5(CAST(r AS VARCHAR)
                              || '_' || CAST(j AS VARCHAR)), 1, 15))
                              AS BIGINT) % nn + 1 AS i
                          FROM spine) s
                    JOIN idx i ON i.i = s.i),
            med AS (SELECT r, y AS med FROM (
                    SELECT r, y, nn,
                      row_number() OVER (PARTITION BY r
                        ORDER BY y, j) AS rk
                    FROM picks) t WHERE rk = (nn + 1) // 2),
            ci AS (SELECT MIN(med) AS lo, MAX(med) AS hi FROM (
                   SELECT med, row_number() OVER (ORDER BY med, r)
                     AS pos
                   FROM med) t WHERE pos IN (3, 48))
         SELECT CAST(50 AS BIGINT) AS n_resamples,
                round(CAST(obs_med AS DOUBLE) / 100.0, 6)
                  AS obs_median_dollars,
                round(CAST(lo AS DOUBLE) / 100.0, 6) AS ci_lo_dollars,
                round(CAST(hi AS DOUBLE) / 100.0, 6) AS ci_hi_dollars
         FROM ci, obs""",

    "q_llm_feature_corr" ->
      """WITH per AS (SELECT source,
                    CAST(len(text) AS BIGINT) AS x,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
                 FROM documents),
            a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                      AS HUGEINT) AS sxy,
                    CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                      AS HUGEINT) AS sxx,
                    CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                      AS HUGEINT) AS syy
                  FROM per GROUP BY 1)
         SELECT source, n AS n_docs,
                round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                  AS len_token_corr
         FROM a ORDER BY source"""
  )
}
