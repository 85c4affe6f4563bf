package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-12 additions, part 7: circular (directional) statistics of
  * the event hour-of-day (time-of-day is an angle — the arithmetic
  * mean of 23:00 and 01:00 is NOT noon), per-document sentence
  * segmentation stats (the text-analysis grain between tokens and
  * documents), peak short-window event velocity per user (the
  * fraud/abuse rate-limit readout), and the Benford MAD conformity
  * score (the single-number verdict on q_ts_benford's digit table).
  *
  * Scale shape: circular_hour folds the fact table to 24 hour cells
  * then one bounded trig pass; sentences is corpus-linear regex
  * splitting; velocity_max is one (user) shuffle with a µs RANGE
  * frame + two-phase-friendly top-k; benford_mad is a 9-row fold.
  *
  * Determinism contract (SURVEY §2.13): circular stats nano-quantize
  * sin/cos of EXACT hour angles (24 distinct values) before integer
  * sums; atan2/sqrt ride one shared tail. Sentence counts are exact
  * integers from the identical regex split on both engines; velocity
  * is exact integer counts over µs bounds; benford_mad quantizes the
  * per-digit |obs − log10(1+1/d)| terms to nano before summing.
  */
object Extras143 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CIRCULAR HOUR STATS — mean direction and resultant length of
    // the event time-of-day angle (2π·hour/24), overall and the mean
    // hour it implies.
    "q_ts_circular_hour" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(hour(col("ts")).cast("long").as("h"))
        .agg(count(lit(1)).as("n"))
      val ang = col("h").cast("double") * lit(2.0) * lit(math.Pi) /
        lit(24.0)
      val t = cells
        .withColumn("sn", (round(sin(ang) * 1e9)).cast("long") * col("n"))
        .withColumn("cn", (round(cos(ang) * 1e9)).cast("long") * col("n"))
        .agg(sum(col("n")).as("n_events"),
          sum(col("sn")).as("ss"), sum(col("cn")).as("cc"))
      val sD = col("ss").cast("double") / 1e9
      val cD = col("cc").cast("double") / 1e9
      val nD = col("n_events").cast("double")
      t.select(col("n_events"),
        r6(atan2(sD, cD)).as("mean_angle"),
        r6(sqrt(sD * sD + cD * cD) / nD).as("resultant_r"),
        r6(pmod((atan2(sD, cD) / (lit(2.0) * lit(math.Pi)) * lit(24.0))
          + lit(24.0), lit(24.0))).as("mean_hour"))
    }),

    // SENTENCE SEGMENTATION — split each document on [.!?] runs;
    // per-length-bucket doc counts and exact token totals.
    "q_llm_sentences" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(col("text"), "[.!?]+")).as("sent"))
        .where(length(trim(col("sent"))) > 0)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sent"),
          sum(size(split(trim(col("sent")), " +")).cast("long"))
            .as("n_words"))
      per.groupBy(col("n_sent"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("words"))
        .orderBy("n_sent")
    }),

    // PEAK EVENT VELOCITY — per user, the max event count inside any
    // trailing 5-minute window; the top-20 hottest users.
    "q_evt_velocity_max" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-300000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), tsUs(col("ts")).as("us"))
        .withColumn("v", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("v")).as("peak_5min"), count(lit(1)).as("n_events"))
        .orderBy(col("peak_5min").desc, col("user_id"))
        .limit(20)
    }),

    // BENFORD MAD — mean absolute deviation of the observed leading-
    // digit shares from log10(1 + 1/d): the standard conformity
    // score over q_ts_benford's table (MAD < 0.006 ≈ close
    // conformity, Nigrini's bands).
    "q_agg_benford_mad" -> ((s, d) => {
      val tot = Window.partitionBy(lit(1))
      val digits = Tables.orders(s, d)
        .select(substring((dec(col("o_totalprice")) * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("share",
          col("n").cast("double") / sum(col("n")).over(tot).cast("double"))
      val expect = log(10.0,
        lit(1.0) + lit(1.0) / col("digit").cast("double"))
      digits
        .withColumn("dev_nano",
          round(abs(col("share") - expect) * 1e9).cast("long"))
        .agg(count(lit(1)).as("n_digits"),
          sum(col("n")).as("n_rows"),
          r6(sum(col("dev_nano")).cast("double") / 1e9
            / count(lit(1)).cast("double")).as("mad"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_circular_hour" ->
      """WITH cells AS (SELECT CAST(hour(ts::TIMESTAMP) AS BIGINT) AS h,
                    CAST(COUNT(*) AS BIGINT) AS n
                 FROM events GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_events,
                    CAST(SUM(CAST(round(sin(CAST(h AS DOUBLE) * 2.0 * pi()
                      / 24.0) * 1e9) AS BIGINT) * n) AS BIGINT) AS ss,
                    CAST(SUM(CAST(round(cos(CAST(h AS DOUBLE) * 2.0 * pi()
                      / 24.0) * 1e9) AS BIGINT) * n) AS BIGINT) AS cc
                  FROM cells)
         SELECT n_events,
                round(atan2(CAST(ss AS DOUBLE) / 1e9,
                            CAST(cc AS DOUBLE) / 1e9), 6) AS mean_angle,
                round(sqrt((CAST(ss AS DOUBLE) / 1e9)
                      * (CAST(ss AS DOUBLE) / 1e9)
                    + (CAST(cc AS DOUBLE) / 1e9)
                      * (CAST(cc AS DOUBLE) / 1e9))
                  / CAST(n_events AS DOUBLE), 6) AS resultant_r,
                round(((atan2(CAST(ss AS DOUBLE) / 1e9,
                              CAST(cc AS DOUBLE) / 1e9)
                        / (2.0 * pi()) * 24.0) + 24.0) % 24.0, 6)
                  AS mean_hour
         FROM t""",

    "q_llm_sentences" ->
      """WITH sents AS (SELECT doc_id,
                    unnest(string_split_regex(text, '[.!?]+')) AS sent
                 FROM documents),
            keep AS (SELECT doc_id, sent FROM sents
                     WHERE length(trim(sent)) > 0),
            per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sent,
                    CAST(SUM(len(string_split_regex(trim(sent), ' +')))
                      AS BIGINT) AS n_words
                  FROM keep GROUP BY 1)
         SELECT n_sent, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_words) AS BIGINT) AS words
         FROM per GROUP BY 1 ORDER BY n_sent""",

    "q_evt_velocity_max" ->
      """WITH e AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS us
                 FROM events),
            v AS (SELECT user_id,
                    CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS v
                  FROM e),
            p AS (SELECT user_id, MAX(v) AS peak_5min,
                    CAST(COUNT(*) AS BIGINT) AS n_events
                  FROM v GROUP BY 1)
         SELECT user_id, peak_5min, n_events
         FROM p ORDER BY peak_5min DESC, user_id LIMIT 20""",

    "q_agg_benford_mad" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
                      AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
                      AS INT) AS digit
                    FROM orders),
            g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1),
            sh AS (SELECT digit, n,
                     CAST(n AS DOUBLE)
                       / CAST(SUM(n) OVER () AS DOUBLE) AS share
                   FROM g),
            dv AS (SELECT n,
                     CAST(round(abs(share - log10(1.0 + 1.0
                       / CAST(digit AS DOUBLE))) * 1e9) AS BIGINT)
                       AS dev_nano
                   FROM sh)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_digits,
                CAST(SUM(n) AS BIGINT) AS n_rows,
                round(CAST(SUM(dev_nano) AS DOUBLE) / 1e9
                  / CAST(COUNT(*) AS DOUBLE), 6) AS mad
         FROM dv"""
  )
}
