package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-7 additions, part 17: HITS hubs/authorities, GROUPING_ID
  * disambiguation, weekday-adjusted burst detection, winsorized mean,
  * quoted-CSV ingestion, and keyset pagination.
  */
object Extras27 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HITS AUTHORITIES — two mutual-reinforcement rounds over the
    // user↔event-type bipartite graph (Kleinberg's hubs/authorities
    // next to q_graph_pagerank's random walk). The iteration never
    // leaves EXACT integers: a1 = degree, h2_u = Σ a1 over u's types,
    // a2_t = Σ h2 over t's users (the 2-hop mass where mutual
    // reinforcement departs from degree). Only the EMITTED share is an
    // IEEE division (a2/max-a2, one per row, from ints < 2^53 at the
    // graded scales — normalizing INSIDE the loop would need a
    // cross-engine integer division of decimals, refused).
    "q_graph_hits" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id").as("u"), col("event_type").as("t"))
        .distinct()
      val a1 = e.groupBy(col("t")).agg(count(lit(1)).as("a1"))
      val h2 = e.join(a1, "t").groupBy(col("u"))
        .agg(sum(col("a1")).as("h2"))
      val a2 = e.join(h2, "u").groupBy(col("t"))
        .agg(sum(col("h2")).as("a2"))
      val m = a2.agg(max(col("a2")).as("m2"))
      a1.join(a2, "t").crossJoin(broadcast(m))
        .select(col("t"), col("a1"), col("a2"),
          (col("a2").cast("double") / col("m2").cast("double"))
            .as("a2_share"))
        .orderBy("t")
    }),

    // GROUPING_ID DISAMBIGUATION — the reason GROUPING()/GROUPING_ID()
    // exist: a subtotal NULL is indistinguishable from a NULL data
    // value without them. One real priority class is NULLed BEFORE the
    // grouping sets; the flags then prove which NULLs are data and
    // which are rollup — exact integer surface, explicit NULLS FIRST
    // so both engines agree on the emitted order.
    "q_sql_grouping_id" -> ((s, d) => {
      Tables.orders(s, d)
        .select(when(col("o_orderpriority") === "3-MEDIUM", null)
          .otherwise(col("o_orderpriority")).as("prio"),
          col("o_orderstatus").as("status"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        .createOrReplaceTempView("v_gid")
      s.sql("""
        SELECT prio, status,
               CAST(GROUPING(prio) AS INT) AS g_prio,
               CAST(GROUPING(status) AS INT) AS g_status,
               CAST(GROUPING_ID(prio, status) AS INT) AS gid,
               COUNT(*) AS n, SUM(cents) AS cents
        FROM v_gid
        GROUP BY GROUPING SETS ((prio, status), (prio), ())
        ORDER BY gid, prio NULLS FIRST, status NULLS FIRST""")
    }),

    // WEEKDAY-ADJUSTED BURST — q_evt_burst conditioned on the day of
    // week: a Saturday is judged against Saturdays only (the seasonal
    // baseline every on-call dashboard needs). Same squared EXACT
    // INTEGER one-sided predicate, partitioned by (type, isodow), at
    // √2·σ: the 30-day fixture gives only n≈4–5 samples per weekday
    // slot, and with a sample stdev the max attainable z is
    // (n−1)/√n ≈ 1.8 — a 2σ gate can never fire at any scale factor.
    "q_evt_burst_dow" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("t"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("c"))
        .withColumn("dow", dayofweek(col("dt")))
      val byTD = Window.partitionBy(col("t"), col("dow"))
      val stats = daily
        .withColumn("dcount", count(lit(1)).over(byTD))
        .withColumn("s1", sum(col("c")).over(byTD))
        .withColumn("s2", sum(col("c") * col("c")).over(byTD))
      val lhs = (col("dcount") * col("c") - col("s1")).cast("decimal(19,0)")
      val varNum = (col("dcount") * col("s2") - col("s1").cast("decimal(19,0)")
        * col("s1").cast("decimal(19,0)")).cast("decimal(38,0)")
      stats
        .where(col("dcount") > 1 && lhs > 0
          && lhs * lhs * (col("dcount") - 1)
            > lit(2L) * col("dcount") * varNum)
        .select(col("t"), col("dt"), col("dow"), col("c"),
          (col("s1").cast("double") / col("dcount").cast("double"))
            .as("dow_mean"))
        .orderBy("t", "dt")
    }),

    // WINSORIZED MEAN — q_agg_trimmed_mean's sibling that CLAMPS the
    // tails to the 5%/95% boundary order statistics instead of
    // dropping them (n stays constant — the variance-friendly robust
    // mean). Boundary values are exact order statistics by rank; the
    // clamped sum is exact cents; one IEEE division.
    "q_agg_winsorized_mean" -> ((s, d) => {
      val v = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      val byG = Window.partitionBy(col("g")).orderBy(col("cents"))
      val all = Window.partitionBy(col("g"))
      val ranked = v
        .withColumn("rn", row_number().over(byG))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("k", expr("n div 20"))
      val bounds = ranked
        .groupBy(col("g"))
        .agg(max(when(col("rn") === col("k") + 1, col("cents"))).as("lo"),
          max(when(col("rn") === col("n") - col("k"), col("cents"))).as("hi"),
          max(col("n")).as("n"), max(col("k")).as("k"))
      ranked.join(broadcast(bounds.select(col("g"), col("lo"), col("hi"))), "g")
        .select(col("g"),
          greatest(least(col("cents"), col("hi")), col("lo")).as("w"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("wsum"))
        .select(col("g"), col("n"),
          (col("wsum").cast("double") / col("n").cast("double")
            / lit(100.0)).as("winsorized_mean"))
        .orderBy("g")
    }),

    // QUOTED-CSV INGESTION — fields carrying the delimiter, the quote
    // character, and leading zeros (the classic CSV escaping torture
    // that silently corrupts naive splitters). The fixture embeds
    // "LAST, FIRST" names and "x""y" quotes; reading back with
    // quote/escape options must reproduce the exact source values —
    // the oracle recomputes the audit from the base table.
    "q_source_csv_quoted" -> ((s, d) => {
      val dir = FixtureCache.ensure("customer_csv_quoted",
        Seq(s"$d/customer.parquet"), "v1: quoted fields with delimiters") {
        dest =>
          Tables.customer(s, d)
            .select(concat(
              col("c_custkey").cast("string"), lit(","),
              lit("\""), lit("SEG, "), col("c_mktsegment"),
              lit(" \"\"Q\"\""), lit("\""), lit(","),
              dec(col("c_acctbal")).cast("string")).as("line"))
            .write.mode("overwrite").text(dest)
      }
      val schema = "k LONG, seg STRING, bal DECIMAL(18,2)"
      s.read.schema(schema)
        .option("quote", "\"").option("escape", "\"")
        .csv(dir)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum((col("bal") * 100).cast("long")).as("bal_cents"))
        .orderBy("seg")
    }),

    // KEYSET PAGINATION — page 3 of the orderkey-sorted feed fetched
    // by `WHERE key > last-key-of-page-2 LIMIT 50` (the at-scale
    // replacement for OFFSET: a pushed-down range predicate + top-k
    // instead of skip-scanning every earlier row — q_limit_offset's
    // scale-correct sibling). The page-2 boundary key is itself
    // computed by keyset steps, so the whole chain is deterministic.
    "q_scan_keyset" -> ((s, d) => {
      val page1Last = Tables.orders(s, d)
        .select(col("o_orderkey")).orderBy("o_orderkey").limit(50)
        .agg(max(col("o_orderkey")).as("k1"))
      val page2Last = Tables.orders(s, d).crossJoin(broadcast(page1Last))
        .where(col("o_orderkey") > col("k1"))
        .select(col("o_orderkey")).orderBy("o_orderkey").limit(50)
        .agg(max(col("o_orderkey")).as("k2"))
      Tables.orders(s, d).crossJoin(broadcast(page2Last))
        .where(col("o_orderkey") > col("k2"))
        .select(col("o_orderkey"), col("o_custkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        .orderBy("o_orderkey").limit(50)
    })
  )

  val oracle: Map[String, String] = Map(

    "q_graph_hits" ->
      """WITH e AS (SELECT DISTINCT user_id AS u, event_type AS t
                    FROM events),
            a1 AS (SELECT t, COUNT(*) AS a1 FROM e GROUP BY 1),
            h2 AS (SELECT u, CAST(SUM(a1) AS BIGINT) AS h2
                   FROM e JOIN a1 USING (t) GROUP BY 1),
            a2 AS (SELECT t, CAST(SUM(h2) AS BIGINT) AS a2
                   FROM e JOIN h2 USING (u) GROUP BY 1),
            m AS (SELECT MAX(a2) AS m2 FROM a2)
         SELECT a1.t, a1.a1, a2.a2,
                CAST(a2.a2 AS DOUBLE) / CAST(m.m2 AS DOUBLE) AS a2_share
         FROM a1 JOIN a2 ON a1.t = a2.t CROSS JOIN m
         ORDER BY a1.t""",

    "q_sql_grouping_id" ->
      """WITH v AS (SELECT CASE WHEN o_orderpriority = '3-MEDIUM'
                          THEN NULL ELSE o_orderpriority END AS prio,
                    o_orderstatus AS status,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents
                 FROM orders)
         SELECT prio, status,
                CAST(GROUPING(prio) AS INT) AS g_prio,
                CAST(GROUPING(status) AS INT) AS g_status,
                CAST(GROUPING_ID(prio, status) AS INT) AS gid,
                COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
         FROM v
         GROUP BY GROUPING SETS ((prio, status), (prio), ())
         ORDER BY gid, prio NULLS FIRST, status NULLS FIRST""",

    "q_evt_burst_dow" ->
      """WITH daily AS (SELECT event_type AS t, CAST(ts AS DATE) AS dt,
                    COUNT(*) AS c
                 FROM events GROUP BY 1, 2),
            dw AS (SELECT t, dt, c,
                     CAST(isodow(dt) % 7 + 1 AS INT) AS dow
                   FROM daily),
            st AS (SELECT t, dt, dow, c,
                     COUNT(*) OVER (PARTITION BY t, dow) AS dcount,
                     SUM(c) OVER (PARTITION BY t, dow) AS s1,
                     SUM(c * c) OVER (PARTITION BY t, dow) AS s2
                   FROM dw),
            f AS (SELECT t, dt, dow, c, dcount, s1,
                    CAST(dcount * c - s1 AS DECIMAL(19,0)) AS lhs,
                    CAST(dcount * s2 - CAST(s1 AS DECIMAL(19,0))
                         * CAST(s1 AS DECIMAL(19,0)) AS DECIMAL(38,0))
                      AS var_num
                  FROM st)
         SELECT t, dt, dow, c,
                CAST(s1 AS DOUBLE) / CAST(dcount AS DOUBLE) AS dow_mean
         FROM f
         WHERE dcount > 1 AND lhs > 0
           AND lhs * lhs * (dcount - 1) > 2 * dcount * var_num
         ORDER BY t, dt""",

    "q_agg_winsorized_mean" ->
      """WITH v AS (SELECT l_returnflag AS g,
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents
                 FROM lineitem),
            r AS (SELECT g, cents,
                    row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
                    COUNT(*) OVER (PARTITION BY g) AS n
                  FROM v),
            k AS (SELECT g, cents, rn, n, n // 20 AS k FROM r),
            b AS (SELECT g,
                    MAX(CASE WHEN rn = k + 1 THEN cents END) AS lo,
                    MAX(CASE WHEN rn = n - k THEN cents END) AS hi
                  FROM k GROUP BY g),
            w AS (SELECT k.g,
                    greatest(least(cents, hi), lo) AS w
                  FROM k JOIN b ON k.g = b.g)
         SELECT g, COUNT(*) AS n,
                CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  / CAST(100 AS DOUBLE) AS winsorized_mean
         FROM w GROUP BY g ORDER BY g""",

    "q_source_csv_quoted" ->
      """SELECT 'SEG, ' || c_mktsegment || ' "Q"' AS seg,
                COUNT(*) AS n,
                CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS bal_cents
         FROM customer GROUP BY 1 ORDER BY 1""",

    "q_scan_keyset" ->
      """WITH p1 AS (SELECT MAX(o_orderkey) AS k1 FROM
                     (SELECT o_orderkey FROM orders
                      ORDER BY o_orderkey LIMIT 50)),
            p2 AS (SELECT MAX(o_orderkey) AS k2 FROM
                     (SELECT o_orderkey FROM orders CROSS JOIN p1
                      WHERE o_orderkey > k1
                      ORDER BY o_orderkey LIMIT 50))
         SELECT o_orderkey, o_custkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
         FROM orders CROSS JOIN p2
         WHERE o_orderkey > k2
         ORDER BY o_orderkey LIMIT 50"""
  )
}
