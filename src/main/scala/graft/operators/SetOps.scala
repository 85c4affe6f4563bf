package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.7 set operations. All inputs are projected to the same schema before
  * the set op (unionByName — positional union bugs don't survive renames),
  * and results carry a total order for hash determinism. */
object SetOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // UNION (distinct): nation keys present among customers or suppliers.
    "q_set_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .unionByName(
          Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")),

    // UNION ALL (bag semantics): duplicates preserved.
    "q_set_union_all" -> ((s, d) =>
      Tables.events(s, d).where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"))
        .unionByName(
          Tables.events(s, d).where(col("value") > 150.0)
            .select(col("event_id"), col("user_id")))
        .orderBy("event_id")),

    // INTERSECT: users who both clicked and purchased.
    "q_set_intersect" -> ((s, d) =>
      Tables.events(s, d).where(col("event_type") === "click")
        .select(col("user_id"))
        .intersect(
          Tables.events(s, d).where(col("event_type") === "purchase")
            .select(col("user_id")))
        .orderBy("user_id")),

    // EXCEPT: (user, day) pairs with a view but no error that day.
    "q_set_except" -> ((s, d) => {
      def slice(t: String) = Tables.events(s, d)
        .where(col("event_type") === t)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      slice("view").except(slice("error")).orderBy("user_id", "day")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION
         SELECT s_nationkey FROM supplier
         ORDER BY nationkey""",
    "q_set_union_all" ->
      """SELECT event_id, user_id FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT event_id, user_id FROM events WHERE value > 150.0
         ORDER BY event_id""",
    "q_set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id""",
    "q_set_except" ->
      """SELECT user_id,
                CAST(CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS VARCHAR) AS day
         FROM events WHERE event_type = 'view'
         EXCEPT
         SELECT user_id,
                CAST(CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS VARCHAR) AS day
         FROM events WHERE event_type = 'error'
         ORDER BY user_id, day"""
  )
}
