package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 49: the empirical semivariogram (spatial/
  * temporal correlation-range structure of the daily revenue series),
  * a one-sample Kolmogorov-Smirnov test against the uniform law over
  * the order-date span (q_agg_ks_test is two-sample; the one-sample
  * form compares to a CLOSED-FORM CDF with exact rational gates), and
  * per-source character-level entropy (the char sibling of
  * q_llm_entropy's token form — the OCR/encoding-damage screen).
  *
  * Scale shape: variogram joins the calendar-bounded daily relation
  * to itself through a 30-row broadcast lag spine on the shifted day
  * key (equi-join, gap-aware); ks_uniform folds the date spine with
  * cross-multiplied integer gates; char_entropy is one corpus pass
  * into the ≤alphabet×sources grid.
  *
  * Determinism contract (SURVEY §2.13): variogram diffs square in
  * DECIMAL(38,0); γ is one IEEE division. ks_uniform never divides
  * until the end: D± numerators ride the common N·span denominator as
  * exact BIGINTs, the argmax is integer. char_entropy micro-quantizes
  * per-char c·log2(c/n) terms before the integer sum (the
  * q_agg_geomean discipline).
  */
object Extras123 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SEMIVARIOGRAM — γ(h) = Σ(y_{t+h} − y_t)² / (2·N_h) over day
    // pairs h apart (calendar gaps drop pairs naturally), h = 1..30.
    "q_ts_variogram" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .select(unix_date(col("dt")).cast("long").as("td"), col("y"))
      val lags = s.range(1, 31).select(col("id").as("h"))
      val b = daily.select(col("td").as("td2"), col("y").as("y2"))
      daily.crossJoin(broadcast(lags))
        .withColumn("td2", col("td") + col("h"))
        .join(b, Seq("td2"))
        .withColumn("d2", (col("y2") - col("y")).cast(Big)
          * (col("y2") - col("y")).cast(Big))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("d2")).as("sum_d2"))
        .select(col("h").as("lag_days"), col("n_pairs"),
          r6(col("sum_d2").cast("double")
            / (lit(2.0) * col("n_pairs").cast("double")) / lit(1e8))
            .as("gamma_dollars2"))
        .orderBy(col("lag_days"))
    }),

    // ONE-SAMPLE KS vs UNIFORM — are order dates uniform over the
    // observed span? D⁺/D⁻ numerators on the common N·span
    // denominator stay exact integers; only the final D divides.
    "q_agg_ks_uniform" -> ((s, d) => {
      val days = Tables.orders(s, d)
        .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long")
          .as("td"))
        .agg(count(lit(1)).as("c"))
      val tot = days.agg(sum(col("c")).as("n"), min(col("td")).as("mn"),
        max(col("td")).as("mx"))
      val cum = Window.orderBy(col("td"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sp = days
        .withColumn("cum", sum(col("c")).over(cum))
        .crossJoin(broadcast(tot))
        .withColumn("sp", col("mx") - col("mn"))
        .withColumn("nump",
          col("cum") * col("sp") - (col("td") - col("mn")) * col("n"))
        .withColumn("numm",
          (col("td") - col("mn")) * col("n")
            - (col("cum") - col("c")) * col("sp"))
      sp.agg(max(col("n")).as("n_orders"),
          max(col("sp")).as("span_days"),
          max(greatest(col("nump"), col("numm"))).as("num"))
        .select(col("n_orders"), col("span_days"),
          r6(col("num").cast("double") /
            (col("n_orders").cast("double")
              * col("span_days").cast("double"))).as("d_stat"),
          r6(col("num").cast("double") /
            (col("n_orders").cast("double")
              * col("span_days").cast("double"))
            * sqrt(col("n_orders").cast("double"))).as("sqrt_n_d"))
    }),

    // CHAR ENTROPY — per source, Shannon entropy of the character
    // unigram distribution: encoding damage or templating collapses
    // it, mixed scripts inflate it.
    "q_llm_char_entropy" -> ((s, d) => {
      import s.implicits._
      // Round 16 (the shingleTrips precedent): the declarative
      // transform(sequence)+substring form is an interpreted HOF whose
      // substring re-seeks the string per index — O(n²) per document —
      // and it shuffles one row per character. This per-partition
      // kernel walks each document's CODE POINTS once (the same unit
      // substring(text,i,1) and DuckDB substr index — so the emitted
      // (source, ch) multiset is identical) and pre-counts locally, so
      // only (source, ch, cnt) partials reach the exchange.
      val chars = Tables.documents(s, d)
        .select(col("source"), col("text")).as[(String, String)]
        .mapPartitions { it =>
          val m = scala.collection.mutable.HashMap
            .empty[(String, String), Long]
          it.foreach { case (src, text) =>
            var i = 0
            while (i < text.length) {
              val cp = text.codePointAt(i)
              val ch = new String(Character.toChars(cp))
              val k = (src, ch)
              m.update(k, m.getOrElse(k, 0L) + 1L)
              i += Character.charCount(cp)
            }
          }
          m.iterator.map { case ((src, ch), n) => (src, ch, n) }
        }.toDF("source", "ch", "cnt")
        .groupBy(col("source"), col("ch"))
        .agg(sum(col("cnt")).as("c"))
      val per = chars.groupBy(col("source"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("alphabet"))
      chars.join(broadcast(per), "source")
        .withColumn("t_micro",
          round(col("c").cast("double")
            * log2(col("c").cast("double") / col("n").cast("double"))
            * lit(1e6)).cast("long"))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_chars"),
          max(col("alphabet")).as("alphabet_size"),
          sum(col("t_micro")).as("sum_micro"))
        .select(col("source"), col("n_chars"), col("alphabet_size"),
          r6(-col("sum_micro").cast("double") / lit(1e6)
            / col("n_chars").cast("double")).as("char_entropy_bits"))
        .orderBy(col("source"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_variogram" ->
      """WITH daily AS (SELECT CAST(CAST(o_orderdate AS DATE)
                      - DATE '1970-01-01' AS BIGINT) AS td,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            lags AS (SELECT CAST(unnest(generate_series(1, 30))
                      AS BIGINT) AS h),
            pairs AS (SELECT l.h,
                    CAST(b.y AS HUGEINT) - CAST(a.y AS HUGEINT) AS dd
                  FROM daily a
                  CROSS JOIN lags l
                  JOIN daily b ON b.td = a.td + l.h)
         SELECT h AS lag_days, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                round(CAST(SUM(dd * dd) AS DOUBLE)
                  / (2.0 * CAST(COUNT(*) AS DOUBLE)) / 1e8, 6)
                  AS gamma_dollars2
         FROM pairs GROUP BY 1 ORDER BY lag_days""",

    "q_agg_ks_uniform" ->
      """WITH days AS (SELECT CAST(CAST(o_orderdate AS DATE)
                      - DATE '1970-01-01' AS BIGINT) AS td,
                    CAST(COUNT(*) AS BIGINT) AS c
                 FROM orders GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                    MIN(td) AS mn, MAX(td) AS mx FROM days),
            sp AS (SELECT td, c,
                    CAST(SUM(c) OVER (ORDER BY td
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
                    n, mx - mn AS span, mn
                  FROM days, t),
            q AS (SELECT n, span,
                    greatest(cum * span - (td - mn) * n,
                             (td - mn) * n - (cum - c) * span) AS num
                  FROM sp)
         SELECT MAX(n) AS n_orders, MAX(span) AS span_days,
                round(CAST(MAX(num) AS DOUBLE)
                  / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(span) AS DOUBLE)),
                  6) AS d_stat,
                round(CAST(MAX(num) AS DOUBLE)
                  / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(span) AS DOUBLE))
                  * sqrt(CAST(MAX(n) AS DOUBLE)), 6) AS sqrt_n_d
         FROM q""",

    "q_llm_char_entropy" ->
      """WITH chars AS (SELECT source,
                    substr(text, CAST(i AS INTEGER), 1) AS ch
                 FROM (SELECT source, text,
                         unnest(generate_series(1, len(text))) AS i
                       FROM documents) t),
            cc AS (SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS c
                   FROM chars GROUP BY 1, 2),
            per AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
                    CAST(COUNT(*) AS BIGINT) AS alphabet
                  FROM cc GROUP BY 1),
            q AS (SELECT cc.source, per.n, per.alphabet,
                    CAST(round(CAST(c AS DOUBLE)
                      * log2(CAST(c AS DOUBLE) / CAST(per.n AS DOUBLE))
                      * 1e6) AS BIGINT) AS t_micro
                  FROM cc JOIN per ON cc.source = per.source)
         SELECT source, MAX(n) AS n_chars,
                MAX(alphabet) AS alphabet_size,
                round(-CAST(SUM(t_micro) AS DOUBLE) / 1e6
                  / CAST(MAX(n) AS DOUBLE), 6) AS char_entropy_bits
         FROM q GROUP BY source ORDER BY source"""
  )
}
