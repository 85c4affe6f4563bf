package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 7: seasonality strength, schema
  * fingerprinting, LTTB-style viz downsampling, the likelihood-ratio
  * G-test, and a power-law tail fit.
  *
  * Determinism contract (SURVEY §2.13) throughout: exact integer folds,
  * per-term quantization before order-dependent sums, one shared IEEE
  * tail per emitted float.
  */
object Extras44 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SEASONALITY STRENGTH — 1 − Var(residual)/Var(series) with the
    // weekday-mean seasonal component (the STL-style decomposition
    // statistic; ~0 for a weekday-flat series). Residuals are one
    // shared IEEE chain over exact integers, quantized to kilodollar
    // integers BEFORE the moment sums, so both variance numerators are
    // exact BIGINT folds (n·Σr² − (Σr)²). Weekday relation = 7 rows,
    // broadcast; portable epoch-day mod 7 weekday.
    "q_ts_seasonal_strength" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("dow", expr("datediff(dt, DATE'1970-01-01') % 7"))
      val byDow = daily.groupBy(col("dow").as("dw"))
        .agg(count(lit(1)).as("n_dow"), sum(col("y")).as("s_dow"))
      daily.join(broadcast(byDow), col("dow") === col("dw"))
        .withColumn("yk", expr("y div 100000"))
        .withColumn("rk", round((col("y").cast("double")
          - col("s_dow").cast("double") / col("n_dow").cast("double"))
          / 1e5).cast("long"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("yk")).as("sy"), sum(col("yk") * col("yk")).as("syy"),
          sum(col("rk")).as("sr"), sum(col("rk") * col("rk")).as("srr"))
        .select(col("n_days"),
          r6((col("n_days") * col("syy") - col("sy") * col("sy"))
            .cast("double")
            / (col("n_days") * col("n_days")).cast("double")).as("var_y"),
          r6((col("n_days") * col("srr") - col("sr") * col("sr"))
            .cast("double")
            / (col("n_days") * col("n_days")).cast("double")).as("var_r"),
          r6(lit(1.0) - (col("n_days") * col("srr") - col("sr") * col("sr"))
            .cast("double")
            / (col("n_days") * col("syy") - col("sy") * col("sy"))
            .cast("double")).as("strength"))
    }),

    // SCHEMA FINGERPRINT — a per-table column-set fingerprint, the
    // cheap schema-drift tripwire a multi-team lakehouse runs on every
    // drop (names only — physical types legitimately differ across
    // writer generations, e.g. events.ts ns vs µs). Column names sort
    // alphabetically so the fingerprint is order-insensitive; md5 runs
    // IN-ENGINE on the identical string. Driver-side input is pure
    // schema METADATA (parquet footers), never data.
    "q_dq_schema_fingerprint" -> ((s, d) => {
      import scala.jdk.CollectionConverters._
      val rows = Tables.names.map { t =>
        val cols = Tables.load(s, d, t).schema.fieldNames.sorted
        org.apache.spark.sql.Row(t, cols.length.toLong, cols.mkString(","))
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("table_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_cols",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cols_csv",
          org.apache.spark.sql.types.StringType)))
      s.createDataFrame(rows.asJava, schema)
        .select(col("table_name"), col("n_cols"), col("cols_csv"),
          substring(md5(col("cols_csv")), 1, 16).as("fingerprint"))
        .orderBy("table_name")
    }),

    // LTTB-LITE DOWNSAMPLING — per 16-day bucket, keep the point whose
    // triangle with the NEIGHBOR BUCKET CENTROIDS has maximal area (the
    // Largest-Triangle-Three-Buckets viz downsampler, with fixed
    // centroid anchors instead of the sequential previously-selected
    // point, which distributes). The doubled area times na·nb is the
    // EXACT integer |(Sxa−na·x)(Syb−nb·y) − (Sxb−nb·x)(Sya−na·y)| in
    // (day, kilodollar) units, so the per-bucket argmax never compares
    // IEEE values; ties break on dt. Bucket stats are a zone-count-
    // sized relation (the q_ts_m4 complement).
    "q_ts_lttb" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) div 100000")
          .as("y"))
        .withColumn("x", datediff(col("dt"), lit("1970-01-01")).cast("long"))
        .withColumn("rn", row_number().over(Window.orderBy(col("dt"))))
        .withColumn("wid", expr("(rn - 1) div 16"))
      val zones = daily.groupBy(col("wid").as("zw"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"))
      val withNbr = daily
        .join(broadcast(zones.select((col("zw") + 1).as("wid"),
          col("n").as("na"), col("sx").as("sxa"), col("sy").as("sya"))),
          "wid")
        .join(broadcast(zones.select((col("zw") - 1).as("wid"),
          col("n").as("nb"), col("sx").as("sxb"), col("sy").as("syb"))),
          "wid")
        .withColumn("area2", abs(
          (col("sxa") - col("na") * col("x"))
            * (col("syb") - col("nb") * col("y"))
          - (col("sxb") - col("nb") * col("x"))
            * (col("sya") - col("na") * col("y"))))
      val w = Window.partitionBy(col("wid"))
        .orderBy(col("area2").desc, col("dt"))
      withNbr.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("wid"), col("dt"), col("y").as("y_kdollar"),
          col("area2"))
        .orderBy("wid")
    }),

    // G-TEST — the likelihood-ratio sibling of q_agg_cramers_v's χ² on
    // the same returnflag × linestatus table: G = 2·Σ O·ln(O·n/(rt·ct)).
    // Each of the 6 cell terms is micro-quantized BEFORE the sum
    // (entropy discipline — ln is IEEE but the rounded term is
    // engine-agreed); the integer arguments O·n and rt·ct are exact.
    "q_agg_gtest" -> ((s, d) => {
      val cells = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("o"))
      val w = Window.partitionBy(lit(1))
      cells
        .withColumn("rt",
          sum(col("o")).over(Window.partitionBy(col("l_returnflag"))))
        .withColumn("ct",
          sum(col("o")).over(Window.partitionBy(col("l_linestatus"))))
        .withColumn("n", sum(col("o")).over(w))
        .withColumn("r", size(collect_set(col("l_returnflag")).over(w)))
        .withColumn("c", size(collect_set(col("l_linestatus")).over(w)))
        .withColumn("t_micro", round(col("o").cast("double")
          * log((col("o") * col("n")).cast("double")
            / (col("rt") * col("ct")).cast("double")) * 1e6).cast("long"))
        .groupBy(col("n"), col("r"), col("c"))
        .agg(sum(col("t_micro")).as("g_half_micro"))
        .select(col("n"), col("g_half_micro"),
          least(col("r") - 1, col("c") - 1).cast("long").as("dof"),
          r6(col("g_half_micro").cast("double") * 2.0 / 1e6).as("g"))
    }),

    // POWER-LAW TAIL FIT — the discrete MLE α̂ = 1 + n/Σ ln(x/x_min)
    // over per-user event counts with x_min = 5 (Clauset-Shalizi-Newman
    // estimator; heavy-tail check for user-activity distributions).
    // Per-user ln terms quantize to nano-units before the order-free
    // sum; the user-count relation is one fact groupBy.
    "q_evt_power_law" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
        .where(col("x") >= 5)
        .withColumn("t_nano",
          round(log(col("x").cast("double") / 5.0) * 1e9).cast("long"))
        .agg(count(lit(1)).as("n_tail"), sum(col("t_nano")).as("sum_nano"))
        .select(col("n_tail"), col("sum_nano"),
          r6(lit(1.0) + col("n_tail").cast("double")
            / (col("sum_nano").cast("double") / 1e9)).as("alpha"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_seasonal_strength" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dd AS (SELECT dt, y,
                     (dt - DATE '1970-01-01') % 7 AS dow FROM daily),
            bydow AS (SELECT dow AS dw, CAST(COUNT(*) AS BIGINT) AS n_dow,
                             CAST(SUM(y) AS BIGINT) AS s_dow
                      FROM dd GROUP BY 1),
            t AS (SELECT y // 100000 AS yk,
                    CAST(round((CAST(y AS DOUBLE)
                      - CAST(s_dow AS DOUBLE) / CAST(n_dow AS DOUBLE))
                      / 1e5) AS BIGINT) AS rk
                  FROM dd JOIN bydow ON dow = dw),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                         CAST(SUM(yk) AS BIGINT) AS sy,
                         CAST(SUM(yk * yk) AS BIGINT) AS syy,
                         CAST(SUM(rk) AS BIGINT) AS sr,
                         CAST(SUM(rk * rk) AS BIGINT) AS srr
                  FROM t)
         SELECT n_days,
                round(CAST(n_days * syy - sy * sy AS DOUBLE)
                  / CAST(n_days * n_days AS DOUBLE), 6) AS var_y,
                round(CAST(n_days * srr - sr * sr AS DOUBLE)
                  / CAST(n_days * n_days AS DOUBLE), 6) AS var_r,
                round(1.0 - CAST(n_days * srr - sr * sr AS DOUBLE)
                  / CAST(n_days * syy - sy * sy AS DOUBLE), 6) AS strength
         FROM m""",

    "q_dq_schema_fingerprint" ->
      """WITH c AS (
           SELECT 'region' AS table_name, column_name FROM (DESCRIBE region)
           UNION ALL SELECT 'nation', column_name FROM (DESCRIBE nation)
           UNION ALL SELECT 'customer', column_name FROM (DESCRIBE customer)
           UNION ALL SELECT 'supplier', column_name FROM (DESCRIBE supplier)
           UNION ALL SELECT 'part', column_name FROM (DESCRIBE part)
           UNION ALL SELECT 'orders', column_name FROM (DESCRIBE orders)
           UNION ALL SELECT 'lineitem', column_name FROM (DESCRIBE lineitem)
           UNION ALL SELECT 'events', column_name FROM (DESCRIBE events)
           UNION ALL SELECT 'documents', column_name
             FROM (DESCRIBE documents)
           UNION ALL SELECT 'embeddings', column_name
             FROM (DESCRIBE embeddings)),
            g AS (SELECT table_name,
                    CAST(COUNT(*) AS BIGINT) AS n_cols,
                    string_agg(column_name, ',' ORDER BY column_name)
                      AS cols_csv
                  FROM c GROUP BY 1)
         SELECT table_name, n_cols, cols_csv,
                substr(md5(cols_csv), 1, 16) AS fingerprint
         FROM g ORDER BY table_name""",

    "q_ts_lttb" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) // 100000 AS y
                 FROM orders GROUP BY 1),
            b AS (SELECT dt, y,
                    CAST(dt - DATE '1970-01-01' AS BIGINT) AS x,
                    (row_number() OVER (ORDER BY dt) - 1) // 16 AS wid
                  FROM daily),
            z AS (SELECT wid AS zw, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy
                  FROM b GROUP BY 1),
            j AS (SELECT b.wid, b.dt, b.y, b.x,
                    za.n AS na, za.sx AS sxa, za.sy AS sya,
                    zb.n AS nb, zb.sx AS sxb, zb.sy AS syb
                  FROM b
                  JOIN z za ON za.zw = b.wid - 1
                  JOIN z zb ON zb.zw = b.wid + 1),
            a AS (SELECT wid, dt, y,
                    abs((sxa - na * x) * (syb - nb * y)
                        - (sxb - nb * x) * (sya - na * y)) AS area2,
                    row_number() OVER (PARTITION BY wid ORDER BY
                      abs((sxa - na * x) * (syb - nb * y)
                          - (sxb - nb * x) * (sya - na * y)) DESC, dt)
                      AS rk
                  FROM j)
         SELECT CAST(wid AS BIGINT) AS wid, dt,
                CAST(y AS BIGINT) AS y_kdollar,
                CAST(area2 AS BIGINT) AS area2
         FROM a WHERE rk = 1 ORDER BY wid""",

    "q_agg_gtest" ->
      """WITH cells AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
                    CAST(COUNT(*) AS BIGINT) AS o
                 FROM lineitem GROUP BY 1, 2),
            rtab AS (SELECT rf, CAST(SUM(o) AS BIGINT) AS rt
                     FROM cells GROUP BY 1),
            ctab AS (SELECT ls, CAST(SUM(o) AS BIGINT) AS ct
                     FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                           COUNT(DISTINCT rf) AS r,
                           COUNT(DISTINCT ls) AS c
                    FROM cells),
            u AS (SELECT n, r, c,
                    CAST(round(CAST(o AS DOUBLE)
                      * ln(CAST(o * n AS DOUBLE)
                           / CAST(rt * ct AS DOUBLE)) * 1e6) AS BIGINT)
                      AS t_micro
                  FROM cells JOIN rtab USING (rf)
                  JOIN ctab USING (ls), tot)
         SELECT n, CAST(SUM(t_micro) AS BIGINT) AS g_half_micro,
                CAST(least(r - 1, c - 1) AS BIGINT) AS dof,
                round(CAST(SUM(t_micro) AS DOUBLE) * 2.0 / 1e6, 6) AS g
         FROM u GROUP BY n, r, c""",

    "q_evt_power_law" ->
      """WITH ux AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
                  FROM events GROUP BY 1),
            t AS (SELECT
                    CAST(round(ln(CAST(x AS DOUBLE) / 5.0) * 1e9)
                      AS BIGINT) AS t_nano
                  FROM ux WHERE x >= 5)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
                CAST(SUM(t_nano) AS BIGINT) AS sum_nano,
                round(1.0 + CAST(COUNT(*) AS DOUBLE)
                  / (CAST(SUM(t_nano) AS DOUBLE) / 1e9), 6) AS alpha
         FROM t"""
  )
}
