package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Subqueries, PIVOT, and the typed-UDAF surface (SURVEY §2.11).
  *
  * Scale: scalar subqueries become broadcast one-row joins; correlated
  * aggregates become window functions over the correlation key (one
  * shuffle, no per-row re-execution); pivot with an explicit value list
  * is a single hash aggregate with N conditional counters.
  */
object Misc {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** Typed Aggregator: exact discounted revenue in integer 1e-4-dollar
    * units (2-dp inputs make the scaling exact) — the UDAF analog of the
    * decimal-sum rule, registered and used through the typed Dataset API. */
  case class LineSlim(l_returnflag: String, l_extendedprice: Double, l_discount: Double)
  object RevenueAgg extends Aggregator[LineSlim, Long, Double] {
    def zero: Long = 0L
    def reduce(b: Long, a: LineSlim): Long =
      b + math.round(a.l_extendedprice * 100) * (100L - math.round(a.l_discount * 100))
    def merge(x: Long, y: Long): Long = x + y
    def finish(r: Long): Double = r / 1e4
    def bufferEncoder = Encoders.scalaLong
    def outputEncoder = Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    // Scalar subquery: orders above the (exact decimal) global mean.
    "q_subquery_scalar" -> ((s, d) => {
      val avgRow = Tables.orders(s, d)
        .agg((dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      Tables.orders(s, d).crossJoin(broadcast(avgRow))
        .where(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // IN-subquery: customers from nations in two named regions.
    "q_subquery_in" -> ((s, d) => {
      val keys = Tables.nation(s, d)
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name").isin("ASIA", "EUROPE"))
        .select(col("n_nationkey"))
      Tables.customer(s, d)
        .join(keys, col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // Correlated aggregate subquery: orders 1.5x above the SAME
    // customer's average — decorrelated to a window aggregate.
    "q_subquery_correlated" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, d)
        .withColumn("cust_avg",
          sum(dec(col("o_totalprice"))).over(w).cast("double")
            / count(lit(1)).over(w))
        .where(col("o_totalprice") > col("cust_avg") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // PIVOT with an explicit (deterministic) value list.
    "q_agg_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")),

    // Typed-Aggregator UDAF through the Dataset API.
    "q_agg_typed_udaf" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"))
        .as[LineSlim]
        .groupByKey(_.l_returnflag)
        .agg(RevenueAgg.toColumn.name("revenue"))
        .toDF("l_returnflag", "revenue")
        .orderBy("l_returnflag")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice >
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) FROM orders)
         ORDER BY o_orderkey""",
    "q_subquery_in" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
         WHERE c_nationkey IN
           (SELECT n_nationkey FROM nation
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('ASIA', 'EUROPE'))
         ORDER BY c_custkey""",
    "q_subquery_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         WHERE o_totalprice > 1.5 *
           (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*)
            FROM orders i WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",
    "q_agg_pivot" ->
      """SELECT user_id,
                COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_agg_typed_udaf" ->
      """SELECT l_returnflag,
                CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS DOUBLE) / 1e4 AS revenue
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
