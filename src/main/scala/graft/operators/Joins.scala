package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.3 joins.
  *
  * Scale notes (100 TB): dimension joins broadcast (explicit `broadcast()`
  * or Catalyst auto under the threshold); fact-fact joins shuffle on their
  * equi-keys and sort-merge; the as-of join deliberately avoids a range
  * join entirely — it is a union + running `last(ignoreNulls)` window,
  * which is one shuffle on (user_id) and linear per partition, the only
  * shape that survives billions of events. AQE handles skew splits.
  */
object Joins {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Equi inner join; customer is small → Catalyst broadcasts it.
    "q_join_inner_hash" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"),
          col("c_mktsegment"))
        .orderBy("o_orderkey")),

    // Large-large equi join → sort-merge at scale.
    "q_join_sortmerge" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("o_orderstatus"),
          tsUs(col("o_orderdate")).as("o_date_us"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Explicit broadcast of the dimension side.
    "q_join_broadcast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("p_brand")),

    // Left outer: every customer, with order stats (0 for order-less ones).
    "q_join_left" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spent"))
        .orderBy("c_custkey")),

    // Full outer join of two per-nation profiles with non-overlapping
    // coverage (high-balance suppliers vs low-balance customers).
    "q_join_full" -> ((s, d) => {
      val sup = Tables.supplier(s, d).where(col("s_acctbal") > 5000.0)
        .groupBy(col("s_nationkey").as("nk1")).agg(count(lit(1)).as("n_supp"))
      val cust = Tables.customer(s, d).where(col("c_acctbal") < 1000.0)
        .groupBy(col("c_nationkey").as("nk2")).agg(count(lit(1)).as("n_cust"))
      sup.join(cust, col("nk1") === col("nk2"), "full")
        .select(coalesce(col("nk1"), col("nk2")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("nationkey")
    }),

    // Existence joins: semi = EXISTS, anti = NOT EXISTS.
    "q_join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 200000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    "q_join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey")),

    // Pure theta (non-equi) join: nation pairs within the same region.
    "q_join_theta_range" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("k1"), col("n_name").as("name1"),
          col("n_regionkey").as("rk1"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("k2"), col("n_name").as("name2"),
          col("n_regionkey").as("rk2"))
      n1.join(n2, col("rk1") === col("rk2") && col("k1") < col("k2"))
        .select(col("rk1").as("regionkey"), col("k1"), col("name1"),
          col("k2"), col("name2"))
        .orderBy("regionkey", "k1", "k2")
    }),

    // As-of join: for each purchase, the latest click of the same user at
    // ts <= purchase ts (ties included — mirrors DuckDB `ASOF ... >=`).
    // Implemented as union + running last(ignoreNulls): ONE shuffle on
    // user_id, linear scan per partition — no range join, no O(n²).
    "q_join_asof" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("click_id"), lit(0).as("tag"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast("long").as("click_id"), lit(1).as("tag"))
      // Clicks sort before purchases at equal ts (tag), so an equal-ts
      // click is visible to the purchase — the `>=` tie rule.
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("prev_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .where(col("tag") === 1)
        .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
          col("prev_click_id"))
        .orderBy("event_id")
    }),

    // Interval join: lineitems shipped within [orderdate, orderdate+60d].
    "q_join_interval" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_in_window"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderkey")),

    // Star 3+-table join (fact → dims), revenue per region.
    "q_join_multiway" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("r_name"))
  )

  val oracle: Map[String, String] = Map(
    "q_join_inner_hash" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_join_sortmerge" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderstatus,
         epoch_us(o_orderdate) AS o_date_us
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber""",
    "q_join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         coalesce(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_full" ->
      """WITH sup AS (SELECT s_nationkey AS nk1, COUNT(*) AS n_supp
                      FROM supplier WHERE s_acctbal > 5000.0 GROUP BY s_nationkey),
            cust AS (SELECT c_nationkey AS nk2, COUNT(*) AS n_cust
                      FROM customer WHERE c_acctbal < 1000.0 GROUP BY c_nationkey)
         SELECT coalesce(nk1, nk2) AS nationkey,
                coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
         FROM sup FULL JOIN cust ON nk1 = nk2
         ORDER BY nationkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 300000.0)
         ORDER BY c_custkey""",
    "q_join_theta_range" ->
      """SELECT n1.n_regionkey AS regionkey,
                n1.n_nationkey AS k1, n1.n_name AS name1,
                n2.n_nationkey AS k2, n2.n_name AS name2
         FROM nation n1 JOIN nation n2
           ON n1.n_regionkey = n2.n_regionkey
          AND n1.n_nationkey < n2.n_nationkey
         ORDER BY regionkey, k1, k2""",
    "q_join_asof" ->
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
                    FROM events),
            p AS (SELECT * FROM e WHERE event_type = 'purchase'),
            c AS (SELECT * FROM e WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
                c.event_id AS prev_click_id
         FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",
    "q_join_interval" ->
      """SELECT o_orderkey, COUNT(*) AS n_in_window,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem JOIN orders
           ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "q_join_multiway" ->
      """SELECT r_name, COUNT(*) AS n_items,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name"""
  )
}
