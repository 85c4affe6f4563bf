package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, FixtureCache, Tables}

/** Round-11 additions, part 59: the fixed-width text source (the
  * mainframe/COBOL interchange format the CSV family can't parse —
  * fields at fixed byte offsets, parsed by substring with an explicit
  * layout; schema inference is impossible by construction), a
  * day-of-week uniformity χ² on order counts (the seasonality TEST
  * beside q_ts_dow_hour's profile), and the delta-method standard
  * error for the revenue-per-order ratio metric (the A/B readout's
  * correct SE — a ratio of two correlated sample means needs the
  * covariance term CUPED-style tooling assumes).
  *
  * Scale shape: fixedwidth round-trips through a FixtureCache text
  * write (substring parsing is codegen'd per row — no UDF);
  * dow_chi2/delta_method are single exact-moment folds.
  *
  * Determinism contract (SURVEY §2.13): fixed-width fields are
  * left-padded to fixed widths with lpad (value-exact round trip —
  * the oracle aggregates the ORIGINAL parquet, proving the text path
  * loses nothing); χ² terms from exact counts are nano-quantized;
  * delta-method folds exact DECIMAL(38,0) cross-moments into one
  * IEEE chain.
  */
object Extras133 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FIXED-WIDTH SOURCE — orderkey(12) priority(1) cents(12), parsed
    // back by substring offsets; the priority aggregate proves the
    // round-trip exact.
    "q_source_fixedwidth" -> ((s, d) => {
      val tmp = FixtureCache.ensure("orders_fixedwidth",
        Seq(s"$d/orders.parquet"), "fw v2") { dest =>
        // Spark's lpad silently TRUNCATES inputs longer than the pad
        // width; at a scale where orderkey or cents exceeds 12 digits
        // that would corrupt the round-trip silently. Fail loudly
        // instead (round-11 advice).
        def fw12(c: org.apache.spark.sql.Column, what: String) =
          when(length(c) > 12,
            raise_error(concat(lit(s"fixedwidth $what overflows 12 chars: "),
              c))).otherwise(lpad(c, 12, "0"))
        Tables.orders(s, d)
          .select(concat(
            fw12(col("o_orderkey").cast("string"), "o_orderkey"),
            substring(col("o_orderpriority"), 1, 1),
            fw12((dec(col("o_totalprice")) * 100).cast("long")
              .cast("string"), "cents")).as("value"))
          .coalesce(2)
          .write.text(dest)
      }
      s.read.text(tmp)
        .select(
          substring(col("value"), 1, 12).cast("long").as("okey"),
          substring(col("value"), 13, 1).as("prio"),
          substring(col("value"), 14, 12).cast("long").as("cents"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(col("okey")).as("key_checksum"))
        .orderBy(col("prio"))
    }),

    // DOW χ² — are order counts uniform across the seven weekdays?
    "q_ts_dow_chi2" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .groupBy(pmod(unix_date(to_date(col("o_orderdate")))
          .cast("long"), lit(7L)).as("dow"))
        .agg(count(lit(1)).as("o"))
        .withColumn("nn", sum(col("o")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      val e = col("nn").cast("double") / lit(7.0)
      val term = (col("o").cast("double") - e) *
        (col("o").cast("double") - e) / e
      per.withColumn("term_nano", round(term * lit(1e9)).cast("long"))
        .agg(count(lit(1)).as("n_dows"), max(col("nn")).as("n_orders"),
          sum(col("term_nano")).as("sum_nano"))
        .select(col("n_dows"), col("n_orders"),
          r6(col("sum_nano").cast("double") / lit(1e9)).as("chi2_dow"))
    }),

    // DELTA METHOD — SE of revenue-per-order where both numerator
    // and denominator are per-customer sample means (correlated):
    // var(x̄/ȳ) ≈ (v_x + r²·v_y − 2r·c_xy) / (ȳ²·n).
    "q_agg_delta_method" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"),
          count(lit(1)).as("y"))
      val a = per.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"),
        sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"))
      val nD = col("n").cast("double")
      val mx = col("sx").cast("double") / nD
      val my = col("sy").cast("double") / nD
      val vx = (nD * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double")) /
        (nD * (nD - 1))
      val vy = (nD * col("syy").cast("double")
        - col("sy").cast("double") * col("sy").cast("double")) /
        (nD * (nD - 1))
      val cxy = (nD * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")) /
        (nD * (nD - 1))
      val r = mx / my
      val se = sqrt((vx + r * r * vy - lit(2.0) * r * cxy) /
        (my * my * nD))
      a.select(col("n").as("n_customers"),
        r6(r / lit(100.0)).as("rev_per_order_dollars"),
        r6(se / lit(100.0)).as("delta_se_dollars"),
        r6(r / se).as("t_ratio"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_source_fixedwidth" ->
      """SELECT substr(o_orderpriority, 1, 1) AS prio,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS cents,
                CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_ts_dow_chi2" ->
      """WITH per AS (SELECT CAST(CAST(o_orderdate AS DATE)
                      - DATE '1970-01-01' AS BIGINT) % 7 AS dow,
                    CAST(COUNT(*) AS BIGINT) AS o
                 FROM orders GROUP BY 1),
            m AS (SELECT dow, o,
                    CAST(SUM(o) OVER () AS BIGINT) AS nn
                  FROM per),
            q AS (SELECT nn,
                    CAST(round((CAST(o AS DOUBLE)
                        - CAST(nn AS DOUBLE) / 7.0)
                      * (CAST(o AS DOUBLE) - CAST(nn AS DOUBLE) / 7.0)
                      / (CAST(nn AS DOUBLE) / 7.0) * 1e9) AS BIGINT)
                      AS term_nano
                  FROM m)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_dows, MAX(nn) AS n_orders,
                round(CAST(SUM(term_nano) AS DOUBLE) / 1e9, 6)
                  AS chi2_dow
         FROM q""",

    "q_agg_delta_method" ->
      """WITH per AS (SELECT o_custkey,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS x,
                    CAST(COUNT(*) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                      AS HUGEINT) AS sxx,
                    CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                      AS HUGEINT) AS syy,
                    CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                      AS HUGEINT) AS sxy
                  FROM per),
            f AS (SELECT n, CAST(n AS DOUBLE) AS nD,
                    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                      AS vx,
                    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                      AS vy,
                    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                      AS cxy
                  FROM a),
            g AS (SELECT n, mx / my AS r,
                    sqrt((vx + (mx / my) * (mx / my) * vy
                      - 2.0 * (mx / my) * cxy) / (my * my * nD)) AS se
                  FROM f)
         SELECT n AS n_customers,
                round(r / 100.0, 6) AS rev_per_order_dollars,
                round(se / 100.0, 6) AS delta_se_dollars,
                round(r / se, 6) AS t_ratio
         FROM g"""
  )
}
