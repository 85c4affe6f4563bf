package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-12 additions, part 5: GROUP BY ALL and inline-VALUES derived
  * tables (two more slabs of ANSI/modern-SQL parser surface beside
  * q_sql_lateral_view), advertising adstock (geometric-decay carryover
  * — the marketing-mix transform), and a quoted-embedded-newline CSV
  * round-trip (the multiLine reader surface q_source_csv_quoted
  * doesn't exercise).
  *
  * Scale shape: the SQL keys are single-shuffle aggregates; adstock
  * joins the calendar-bounded daily spine against its own BROADCAST
  * 31-day lookback (fact work is one daily fold); csv_newlines is an
  * ingest-time fixture (prewarmed) + one linear parse.
  *
  * Determinism contract (SURVEY §2.13): adstock's decay 2^-k is
  * EXACT integer halving (shiftleft/`<<` then truncating div — both
  * engines bit-identical, no IEEE anywhere); the newline fixture
  * splits p_name at its FIRST space via substring arithmetic shared
  * by both engines; SQL keys are counts + exact decimal sums.
  */
object Extras141 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GROUP BY ALL — the modern-SQL shorthand (Spark 3.4+/DuckDB):
    // every non-aggregate select item becomes a grouping key.
    "q_sql_groupby_all" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM v_orders
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority""")
    }),

    // INLINE VALUES — a VALUES derived table as the join dimension
    // (the literal-lookup-table idiom; no physical dim table needed).
    "q_sql_values_join" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT v.seg, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS bal
        FROM v_customer
        JOIN (VALUES ('AUTOMOBILE', 'wheels'),
                     ('MACHINERY',  'metal'),
                     ('BUILDING',   'metal'),
                     ('FURNITURE',  'home'),
                     ('HOUSEHOLD',  'home')) AS v(mkt, seg)
          ON c_mktsegment = v.mkt
        GROUP BY v.seg
        ORDER BY v.seg""")
    }),

    // ADSTOCK — 31-day geometric carryover of daily revenue with
    // λ = 1/2: adstock_t = Σ_{k=0..30} y_{t−k} div 2^k. The halving
    // is exact integer arithmetic on cents.
    "q_evt_adstock" -> ((s, d) => {
      val dr = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("t", unix_date(col("dt")).cast("long"))
      val look = dr.select(col("t").as("ts"), col("y").as("ys"))
      dr.join(broadcast(look),
          col("ts") >= col("t") - 30 && col("ts") <= col("t"))
        .withColumn("term",
          expr("ys div shiftleft(CAST(1 AS BIGINT), CAST(t - ts AS INT))"))
        .groupBy(col("dt"), col("y"))
        .agg(sum(col("term")).as("adstock_cents"))
        .select(col("dt"), col("y").as("cents"), col("adstock_cents"),
          r6(col("adstock_cents").cast("double") / 100.0)
            .as("adstock_usd"))
        .orderBy("dt")
    }),

    // MULTILINE CSV — p_name split at its first space into a QUOTED
    // two-line field; the multiLine reader must reassemble records
    // across physical newlines. The aggregate proves the round-trip.
    "q_source_csv_newlines" -> ((s, d) => {
      val tmp = FixtureCache.ensure("part_csv_newlines",
        Seq(s"$d/part.parquet"), "quoted embedded-newline csv v1") {
        dest =>
          Tables.part(s, d)
            .select(col("p_partkey"),
              concat(substring_index(col("p_name"), " ", 1), lit("\n"),
                expr("substring(p_name, length(substring_index(p_name, ' ', 1)) + 2)"))
                .as("v"))
            .coalesce(2)
            .write.option("header", "true").option("quoteAll", "true")
            .csv(dest)
      }
      s.read.option("header", "true").option("multiLine", "true")
        .option("inferSchema", "false").csv(tmp)
        .select(col("p_partkey").cast("long").as("pk"), col("v"))
        .agg(count(lit(1)).as("n"), sum(col("pk")).as("key_checksum"),
          sum(length(col("v"))).as("len_sum"),
          sum((length(col("v"))
            - length(replace(col("v"), lit("\n"), lit("")))).cast("long"))
            .as("n_newlines"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_sql_groupby_all" ->
      """SELECT o_orderstatus, o_orderpriority,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM orders
         GROUP BY ALL
         ORDER BY o_orderstatus, o_orderpriority""",

    "q_sql_values_join" ->
      """SELECT v.seg, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                  AS bal
         FROM customer
         JOIN (VALUES ('AUTOMOBILE', 'wheels'),
                      ('MACHINERY',  'metal'),
                      ('BUILDING',   'metal'),
                      ('FURNITURE',  'home'),
                      ('HOUSEHOLD',  'home')) AS v(mkt, seg)
           ON c_mktsegment = v.mkt
         GROUP BY v.seg
         ORDER BY v.seg""",

    "q_evt_adstock" ->
      """WITH dr AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y,
                    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                      AS BIGINT) AS t
                 FROM orders GROUP BY 1, 3)
         SELECT a.dt, a.y AS cents,
                CAST(SUM(b.y // (CAST(1 AS BIGINT) << CAST(a.t - b.t
                  AS INT))) AS BIGINT) AS adstock_cents,
                round(CAST(SUM(b.y // (CAST(1 AS BIGINT) << CAST(a.t - b.t
                  AS INT))) AS DOUBLE) / 100.0, 6) AS adstock_usd
         FROM dr a JOIN dr b ON b.t >= a.t - 30 AND b.t <= a.t
         GROUP BY a.dt, a.y
         ORDER BY a.dt""",

    "q_source_csv_newlines" ->
      """WITH v AS (SELECT p_partkey,
                    split_part(p_name, ' ', 1) || chr(10) ||
                      substr(p_name,
                        length(split_part(p_name, ' ', 1)) + 2) AS v
                 FROM part)
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(p_partkey) AS BIGINT) AS key_checksum,
                CAST(SUM(length(v)) AS BIGINT) AS len_sum,
                CAST(SUM(length(v) - length(replace(v, chr(10), '')))
                  AS BIGINT) AS n_newlines
         FROM v"""
  )
}
