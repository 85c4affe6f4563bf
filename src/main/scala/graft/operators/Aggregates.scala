package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.4 aggregations. All float measures run through exact DECIMAL space
  * (Det.dsum/davg) so partial/final aggregation order — and the DuckDB
  * oracle's own order — cannot change the hash (§2.13 rule 1).
  *
  * Scale: HashAggregateExec does map-side partial aggregation before the
  * shuffle, so each of these moves only |groups|×|partitions| rows — the
  * pattern that survives 100 TB. Nothing here collects to the driver.
  */
object Aggregates {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** Flagship: TPC-H Q1-shaped pricing summary (scan → filter → decimal
    * group agg → sort). Also wired as SparkEntry.entry. */
  def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> (q1 _),

    // Ungrouped aggregate: count / sum / min / max / avg in one pass.
    "q_agg_global" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        countDistinct(col("l_suppkey")).as("n_supp"))),

    // Hash group-by on a different key shape than the flagship.
    "q_agg_group" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          davg(col("o_totalprice")).as("avg_price"))
        .orderBy("o_orderpriority")),

    // COUNT(DISTINCT) — expand + two-phase aggregation.
    "q_agg_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")),

    // ROLLUP hierarchy: (region, nation) → (region) → ().
    // Group labels coalesced to sentinel strings so NULL ordering can't
    // differ across engines; g = grouping level for a total order.
    "q_agg_rollup" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d)
      sup.join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("sum_bal"),
          grouping_id().as("g"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
          coalesce(col("n_name"), lit("ALL")).as("n_name"),
          col("n_supp"), col("sum_bal"), col("g"))
        .orderBy("g", "r_name", "n_name")
    }),

    // CUBE over two independent dims.
    "q_agg_cube" -> ((s, d) =>
      Tables.events(s, d)
        .cube(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"),
          grouping_id().as("g"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("user_id"), lit(-1)).as("user_id"),
          col("n"), col("sum_v"), col("g"))
        .orderBy("g", "event_type", "user_id")),

    // GROUPING SETS ((status, priority), (status), (priority)).
    "q_agg_gsets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gsets")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS st,
                  coalesce(o_orderpriority, 'ALL') AS pri,
                  count(1) AS n,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                  grouping_id() AS g
           FROM orders_gsets
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderstatus), (o_orderpriority))
           ORDER BY g, st, pri""")
    }),

    // Conditional aggregation (FILTER-clause semantics).
    "q_agg_filtered" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "click", 1)).as("n_click"),
          sum(when(col("event_type") === "purchase", dec(col("value")))
            .otherwise(lit(0).cast(D2))).cast("double").as("purchase_value"))
        .orderBy("user_id")),

    // Grouped collect: set of event types per user, sorted then joined to
    // a string so the output is a scalar (no cross-engine list-hash risk).
    "q_agg_collect" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(concat_ws(",", array_sort(collect_set(col("event_type"))))
          .as("types"))
        .orderBy("user_id"))
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q_agg_global" ->
      """SELECT COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
         COUNT(DISTINCT l_suppkey) AS n_supp
         FROM lineitem""",
    "q_agg_group" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_agg_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
         COUNT(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_agg_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name,
                coalesce(n_name, 'ALL') AS n_name,
                COUNT(*) AS n_supp,
                CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
                GROUPING(r_name, n_name) AS g
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY g, r_name, n_name""",
    "q_agg_cube" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
                coalesce(user_id, -1) AS user_id,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
                GROUPING(event_type, user_id) AS g
         FROM events
         GROUP BY CUBE (event_type, user_id)
         ORDER BY g, event_type, user_id""",
    "q_agg_gsets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
                coalesce(o_orderpriority, 'ALL') AS pri,
                COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                GROUPING(o_orderstatus, o_orderpriority) AS g
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                 (o_orderstatus), (o_orderpriority))
         ORDER BY g, st, pri""",
    "q_agg_filtered" ->
      """SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           AS purchase_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_agg_collect" ->
      """SELECT user_id,
         array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
         FROM events GROUP BY user_id ORDER BY user_id"""
  )
}
