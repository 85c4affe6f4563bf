package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 37: operational-analytics round-out —
  * session-count sensitivity across gap thresholds, the second-digit
  * Benford forensic screen, an SCD type-2 (slowly changing dimension)
  * history build from the event stream, and the rank-biserial effect
  * size companion to the Mann-Whitney machinery.
  *
  * Scale shape: sessionization-sensitivity is one per-user lag pass
  * joined against a 4-row broadcast threshold table (no per-threshold
  * re-shuffle); Benford-2 and rank-biserial ride bounded digit/value
  * spines; the SCD2 build is a per-user ordered window (partitioned
  * by the high-cardinality user key — no global sort) emitting only
  * change rows.
  *
  * Determinism contract (SURVEY §2.13): session/threshold and SCD2
  * outputs are exact integers/timestamps; Benford-2 expected shares
  * are nano-quantized closed forms Σ log10(1+1/(10k+d)); the
  * rank-biserial statistic reuses the exact doubled-midrank fold.
  */
object Extras111 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SESSION THRESHOLD SENSITIVITY — total sessions, mean
    // sessions/user at gap thresholds {5, 15, 30, 60} minutes: one
    // per-user gap relation ⋈ broadcast thresholds. Gaps diff in
    // EXACT µs against thr*1e6 (round-12 sf0.1 knife-edge: Spark
    // unix_timestamp() truncates to whole seconds while the
    // oracle's epoch() keeps fractional µs, so a gap inside
    // (900, 901) straddled `> thr` differently — playbook rule).
    "q_evt_session_thresholds" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, d)
        .withColumn("prev", lag(col("ts"), 1).over(wU))
        .select(col("user_id"),
          (tsUs(col("ts")) - tsUs(col("prev"))).as("gap_us"))
      val thr = s.createDataFrame(Seq(
        Tuple1(300L), Tuple1(900L), Tuple1(1800L), Tuple1(3600L)))
        .toDF("thr_s")
      val users = Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("n_users"))
      gaps.crossJoin(broadcast(thr))
        .groupBy(col("thr_s"))
        .agg(sum(when(col("gap_us") > col("thr_s") * lit(1000000L), 1L)
          .otherwise(lit(0L))).as("n_breaks"))
        .crossJoin(broadcast(users))
        .select(col("thr_s"),
          (col("n_breaks") + col("n_users")).as("n_sessions"),
          r6((col("n_breaks") + col("n_users")).cast("double") /
            col("n_users").cast("double")).as("sessions_per_user"))
        .orderBy(col("thr_s"))
    }),

    // BENFORD SECOND DIGIT — observed vs expected second-digit shares
    // of order totals (cents), expected_d = Σ_{k=1..9}
    // log10(1 + 1/(10k+d)); χ² over the 10 digits with nano-quantized
    // per-digit terms.
    "q_dq_benford_digit2" -> ((s, d) => {
      val digits = Tables.orders(s, d)
        .select(substring((dec(col("o_totalprice")) * 100).cast("long")
          .cast("string"), 2, 1).cast("long").as("digit"))
        .where(col("digit").isNotNull)
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("nn"))
      val expected = (1 to 9).map(k =>
        log(lit(1.0) + lit(1.0) /
          (col("digit") + lit(10L * k)).cast("double")) /
          log(lit(10.0))).reduce(_ + _)
      digits.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          r6(col("n").cast("double") / col("nn").cast("double"))
            .as("observed"),
          r6(expected).as("expected"))
        .orderBy(col("digit"))
    }),

    // SCD TYPE-2 BUILD — per-user event_type history rows
    // (valid_from, valid_to, is_current): only change rows survive,
    // closed by the next change's timestamp.
    "q_evt_scd2" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(wU))
        .where(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val wC = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(wC))
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("valid_from_us"),
          expr("unix_micros(valid_to)").as("valid_to_us"),
          col("valid_to").isNull.cast("int").as("is_current"))
        .where(col("user_id") % 25 === 0)
        .orderBy(col("user_id"), col("valid_from_us"))
    }),

    // RANK-BISERIAL CORRELATION — the Mann-Whitney effect size
    // r = 2·p̂ − 1 with p̂ = (R̄₁ − (n₁+1)/2)/n₂ off the exact doubled
    // midranks (returned vs kept quantities).
    "q_agg_rank_biserial" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select(col("l_quantity").cast("long").as("v"),
          (col("l_returnflag") === "R").cast("long").as("g1"))
      val per = base.groupBy(col("v"))
        .agg(sum(col("g1")).as("c1"), sum(lit(1) - col("g1")).as("c0"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sp = per
        .withColumn("cb", sum(col("c1") + col("c0")).over(w)
          - col("c1") - col("c0"))
        .withColumn("m2", lit(2) * col("cb") + col("c1") + col("c0") + 1)
      val m = sp.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
        sum(col("c1").cast(Big) * col("m2").cast(Big)).as("t1"))
      val n1 = col("n1").cast("double")
      val n0 = col("n0").cast("double")
      val r1b = col("t1").cast("double") / n1 / 2
      val ph = (r1b - (n1 + 1) / 2) / n0
      m.select(col("n1").as("n_returned"), col("n0").as("n_kept"),
        r6(ph).as("p_superiority"),
        r6(ph * 2 - 1).as("rank_biserial"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_session_thresholds" ->
      """WITH gaps AS (SELECT user_id,
                    epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts, 1) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id)
                      ::TIMESTAMP) AS gap_us
                 FROM events),
            u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                    AS n_users FROM events),
            thr AS (SELECT UNNEST([300, 900, 1800, 3600]) AS thr_s),
            m AS (SELECT thr_s,
                    CAST(SUM(CASE WHEN gap_us >
                        CAST(thr_s AS BIGINT) * 1000000
                      THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_breaks
                  FROM gaps, thr GROUP BY 1)
         SELECT CAST(thr_s AS BIGINT) AS thr_s,
                n_breaks + n_users AS n_sessions,
                round(CAST(n_breaks + n_users AS DOUBLE)
                  / CAST(n_users AS DOUBLE), 6) AS sessions_per_user
         FROM m, u ORDER BY thr_s""",

    "q_dq_benford_digit2" -> {
      val expected = (1 to 9).map(k =>
        s"ln(1.0 + 1.0 / (CAST(digit + ${10 * k} AS DOUBLE))) / ln(10.0)")
        .mkString(" + ")
      s"""WITH digits AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
                 FROM (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
                          AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR),
                        2, 1) AS BIGINT) AS digit
                       FROM orders)
                 WHERE digit IS NOT NULL
                 GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM digits)
         SELECT digit, n,
                round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE), 6)
                  AS observed,
                round($expected, 6) AS expected
         FROM digits, t ORDER BY digit"""
    },

    "q_evt_scd2" ->
      """WITH ch AS (SELECT user_id, event_type, ts, event_id,
                    lag(event_type, 1) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_type
                 FROM events),
            f AS (SELECT user_id, event_type, ts, event_id
                  FROM ch WHERE prev_type IS NULL
                    OR prev_type <> event_type),
            o AS (SELECT user_id, event_type, ts AS valid_from,
                    lead(ts, 1) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to
                  FROM f)
         SELECT user_id, event_type,
                epoch_us(valid_from) AS valid_from_us,
                epoch_us(valid_to) AS valid_to_us,
                CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END
                  AS INT) AS is_current
         FROM o WHERE user_id % 25 = 0
         ORDER BY user_id, valid_from_us""",

    "q_agg_rank_biserial" ->
      """WITH per AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                      END) AS BIGINT) AS c1,
                    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0
                      END) AS BIGINT) AS c0
                 FROM lineitem WHERE l_returnflag IN ('R', 'N')
                 GROUP BY 1),
            sp AS (SELECT c1, c0,
                     2 * CAST(SUM(c1 + c0) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - c1 - c0 AS BIGINT) + c1 + c0 + 1 AS m2
                   FROM per),
            m AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                    CAST(SUM(c0) AS BIGINT) AS n0,
                    SUM(CAST(c1 AS HUGEINT) * CAST(m2 AS HUGEINT)) AS t1
                  FROM sp),
            e AS (SELECT n1, n0,
                    (CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 2
                      - (CAST(n1 AS DOUBLE) + 1) / 2)
                      / CAST(n0 AS DOUBLE) AS ph
                  FROM m)
         SELECT n1 AS n_returned, n0 AS n_kept,
                round(ph, 6) AS p_superiority,
                round(ph * 2 - 1, 6) AS rank_biserial
         FROM e"""
  )
}
