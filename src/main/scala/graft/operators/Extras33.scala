package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{FixtureCache, Tables}

/** Round-7 additions, part 23: monthly churn, parquet snapshot diff,
  * Theil–Sen robust slope, referential-integrity audit, and the
  * duplicated-n-gram memorization audit.
  */
object Extras33 {
  import graft.Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WEEKLY CHURN — per week (except the last, which has no successor
    // to retain into): users active that week, how many were also active
    // the NEXT week, churned = the difference. Week indexes are EXACT
    // integers from a fixed pre-data Monday epoch ((date − 2020-01-06)
    // div 7 — the q_evt_retention rule; engines disagree on native week
    // truncation), re-grained from calendar months in round 8 when the
    // regenerated testdata collapsed to a single month. The exact
    // distributed form: dedup to (user, week) grain first — one shuffle
    // on a key whose cardinality is users×weeks, NOT raw events — then a
    // self-equi-join on (user, week+1). Complements q_evt_retention
    // (first-touch cohorts): this is the period-over-period operating
    // metric a growth dashboard tracks.
    "q_evt_churn" -> ((s, d) => {
      val am = Tables.events(s, d)
        .select(col("user_id"),
          expr("datediff(to_date(ts), DATE '2020-01-06') div 7").as("wk"))
        .distinct()
      val span = am.agg(max(col("wk")).as("wmax"))
      val next = am.select(col("user_id").as("uid2"), col("wk").as("wk_next"))
      am.join(next,
          col("uid2") === col("user_id") &&
            col("wk_next") === col("wk") + 1, "left")
        .crossJoin(broadcast(span))
        .where(col("wk") < col("wmax"))
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("wk_next").isNotNull, 1L).otherwise(0L))
            .as("n_retained"))
        .select(date_add(lit("2020-01-06").cast("date"),
            (col("wk") * 7).cast("int")).as("week_start"),
          col("n_active"), col("n_retained"),
          (col("n_active") - col("n_retained")).as("n_churned"),
          ((col("n_active") - col("n_retained")).cast("double")
            / col("n_active").cast("double")).as("churn_rate"))
        .orderBy("week_start")
    }),

    // SNAPSHOT DIFF — the lakehouse table-version audit: two parquet
    // snapshots of the orders table (v2 = v1 with one partition's rows
    // repriced, a slice deleted, and a batch of new keys appended) are
    // materialized through FixtureCache, then diffed by a single full
    // outer join on the key, classifying every key as added / removed /
    // changed / unchanged with the exact cents delta per class. At
    // 100 TB this is the same plan — one co-partitioned full join on
    // the snapshot key; no driver-side listing, no row-by-row compare.
    // The oracle reconstructs both versions as CTEs and runs the
    // identical FULL JOIN logically.
    "q_snapshot_diff" -> ((s, d) => {
      val dir = FixtureCache.ensure("orders_snapshots",
        Seq(s"$d/orders.parquet"),
        "v1: base; v2: P repriced 2x, F%97 deleted, %101+1e9 appended") {
        dest =>
          val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
            (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
            col("o_orderstatus").as("status"))
          base.write.parquet(s"$dest/v1")
          base.where(!(col("status") === "F" && col("k") % 97 === 0))
            .withColumn("cents",
              when(col("status") === "P", col("cents") * 2)
                .otherwise(col("cents")))
            .unionByName(base.where(col("k") % 101 === 0)
              .withColumn("k", col("k") + 1000000000L))
            .write.parquet(s"$dest/v2")
      }
      val v1 = s.read.parquet(s"$dir/v1").select(col("k").as("k1"),
        col("cents").as("c1"))
      val v2 = s.read.parquet(s"$dir/v2").select(col("k").as("k2"),
        col("cents").as("c2"))
      v1.join(v2, col("k1") === col("k2"), "full")
        .select(
          when(col("k1").isNull, "added")
            .when(col("k2").isNull, "removed")
            .when(col("c1") =!= col("c2"), "changed")
            .otherwise("unchanged").as("class"),
          (coalesce(col("c2"), lit(0L)) - coalesce(col("c1"), lit(0L)))
            .as("delta"))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n"), sum(col("delta")).as("cents_delta"))
        .orderBy("class")
    }),

    // THEIL–SEN ROBUST SLOPE — per event type: the median of all
    // pairwise (day_i, day_j) slopes of the daily cents series. The
    // estimator a single outlier day cannot drag (unlike the OLS slope
    // of q_win_slope / q_agg_regr). Day-grain totals are exact cents,
    // so each pairwise slope is ONE shared IEEE division; the pair
    // count grows with days² (calendar-bounded), never with raw data
    // volume — the day-grain pre-aggregation is what makes this safe
    // at 100 TB. Median ties follow the engines' shared two-middle
    // interpolation; output rounded at 6 dp (§2.13 rule 2).
    "q_ts_theil_sen" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("t"), to_date(col("ts")).as("day"))
        .agg(sum((dec(col("value")) * 100).cast("long")).as("cents"))
        .select(col("t"),
          datediff(col("day"), to_date(lit("1970-01-01"))).cast("long")
            .as("x"),
          col("cents"))
      val a = daily.select(col("t"), col("x").as("x1"), col("cents").as("y1"))
      val b = daily.select(col("t"), col("x").as("x2"), col("cents").as("y2"))
      a.join(b, Seq("t"))
        .where(col("x2") > col("x1"))
        .select(col("t"),
          ((col("y2") - col("y1")).cast("double")
            / (col("x2") - col("x1")).cast("double")).as("slope"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_pairs"),
          r6(median(col("slope"))).as("theil_sen"))
        .orderBy("t")
    }),

    // REFERENTIAL-INTEGRITY AUDIT — orphan counts for every foreign-key
    // edge of the star schema in one result: child rows whose non-null
    // FK has no parent. Each relation is a broadcast/hash LEFT ANTI join
    // (the dims broadcast; the two lineitem fact edges share one scan
    // shape Catalyst prunes to the key column). This is the cross-table
    // sibling of q_dq_constraints (which audits single-table invariants).
    "q_dq_referential" -> ((s, d) => {
      def edge(name: String, child: DataFrame, fk: String,
               parent: DataFrame, pk: String): DataFrame = {
        val keyed = child.select(col(fk).as("fk")).where(col("fk").isNotNull)
        val orphans = keyed.join(parent.select(col(pk).as("fk")),
          Seq("fk"), "left_anti")
        keyed.agg(count(lit(1)).as("n_rows"))
          .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
          .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"),
            (col("n_orphans").cast("double") / col("n_rows").cast("double"))
              .as("orphan_rate"))
      }
      val li = Tables.lineitem(s, d)
      edge("customer.c_nationkey->nation", Tables.customer(s, d),
          "c_nationkey", Tables.nation(s, d), "n_nationkey")
        .unionByName(edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          Tables.orders(s, d), "o_orderkey"))
        .unionByName(edge("lineitem.l_partkey->part", li, "l_partkey",
          Tables.part(s, d), "p_partkey"))
        .unionByName(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"))
        .unionByName(edge("orders.o_custkey->customer", Tables.orders(s, d),
          "o_custkey", Tables.customer(s, d), "c_custkey"))
        .orderBy("relation")
    }),

    // DUPLICATED-N-GRAM AUDIT — the memorization-risk probe: the top-20
    // 5-gram word sequences that occur more than once in the corpus,
    // with occurrence and document-spread counts. Complements
    // q_llm_novelty (per-doc share of first-seen 3-grams): this surfaces
    // WHICH sequences repeat — boilerplate headers, license blocks,
    // templated spam — the strings a trained model would regurgitate.
    // One explode + one groupBy; the vocab-bounded top-k sort is pinned
    // by (count desc, gram) so the cutoff is deterministic.
    "q_llm_dup_ngrams" -> ((s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        .where(size(col("ws")) >= 5)
      w.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 4)," +
            " i -> array_join(slice(ws, i, 5), ' '))")).as("g"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"))
        .where(col("n_occ") > 1)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("n_occ").desc, col("g"))))
        .where(col("rank") <= 20)
        .select(col("rank"), col("g"), col("n_occ"), col("n_docs"))
        .orderBy("rank")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_churn" ->
      """WITH am AS (SELECT DISTINCT user_id,
                       (CAST(ts AS DATE) - DATE '2020-01-06') // 7 AS wk
                     FROM events),
            span AS (SELECT MAX(wk) AS wmax FROM am)
         SELECT DATE '2020-01-06' + CAST(a.wk * 7 AS INT) AS week_start,
                COUNT(*) AS n_active,
                CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_retained,
                CAST(COUNT(*) - SUM(CASE WHEN b.user_id IS NOT NULL
                                         THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_churned,
                CAST(COUNT(*) - SUM(CASE WHEN b.user_id IS NOT NULL
                                         THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS churn_rate
         FROM am a
         LEFT JOIN am b ON b.user_id = a.user_id AND b.wk = a.wk + 1
         CROSS JOIN span
         WHERE a.wk < span.wmax
         GROUP BY a.wk ORDER BY week_start""",

    "q_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey AS k,
                         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT) AS cents,
                         o_orderstatus AS status
                       FROM orders),
            v1 AS (SELECT k, cents FROM base),
            v2 AS (SELECT k, CASE WHEN status = 'P' THEN cents * 2
                                  ELSE cents END AS cents
                   FROM base WHERE NOT (status = 'F' AND k % 97 = 0)
                   UNION ALL
                   SELECT k + 1000000000, cents FROM base
                   WHERE k % 101 = 0)
         SELECT CASE WHEN v1.k IS NULL THEN 'added'
                     WHEN v2.k IS NULL THEN 'removed'
                     WHEN v1.cents <> v2.cents THEN 'changed'
                     ELSE 'unchanged' END AS class,
                COUNT(*) AS n,
                CAST(SUM(COALESCE(v2.cents, 0) - COALESCE(v1.cents, 0))
                     AS BIGINT) AS cents_delta
         FROM v1 FULL JOIN v2 ON v1.k = v2.k
         GROUP BY 1 ORDER BY 1""",

    "q_ts_theil_sen" ->
      """WITH daily AS (SELECT event_type AS t,
                          CAST(ts AS DATE) AS day,
                          CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                        AS BIGINT)) AS BIGINT) AS cents
                        FROM events GROUP BY 1, 2),
            pts AS (SELECT t, CAST(day - DATE '1970-01-01' AS BIGINT) AS x,
                      cents FROM daily)
         SELECT a.t, COUNT(*) AS n_pairs,
                round(median(CAST(b.cents - a.cents AS DOUBLE)
                             / CAST(b.x - a.x AS DOUBLE)), 6) AS theil_sen
         FROM pts a JOIN pts b ON a.t = b.t AND b.x > a.x
         GROUP BY a.t ORDER BY a.t""",

    "q_dq_referential" ->
      """WITH t(relation, n_rows, n_orphans) AS (
           SELECT 'customer.c_nationkey->nation' AS relation,
                  (SELECT COUNT(*) FROM customer
                   WHERE c_nationkey IS NOT NULL) AS n_rows,
                  (SELECT COUNT(*) FROM customer
                   WHERE c_nationkey IS NOT NULL
                     AND c_nationkey NOT IN
                         (SELECT n_nationkey FROM nation)) AS n_orphans
           UNION ALL
           SELECT 'lineitem.l_orderkey->orders',
                  (SELECT COUNT(*) FROM lineitem
                   WHERE l_orderkey IS NOT NULL),
                  (SELECT COUNT(*) FROM lineitem
                   WHERE l_orderkey IS NOT NULL
                     AND l_orderkey NOT IN
                         (SELECT o_orderkey FROM orders))
           UNION ALL
           SELECT 'lineitem.l_partkey->part',
                  (SELECT COUNT(*) FROM lineitem
                   WHERE l_partkey IS NOT NULL),
                  (SELECT COUNT(*) FROM lineitem
                   WHERE l_partkey IS NOT NULL
                     AND l_partkey NOT IN (SELECT p_partkey FROM part))
           UNION ALL
           SELECT 'lineitem.l_suppkey->supplier',
                  (SELECT COUNT(*) FROM lineitem
                   WHERE l_suppkey IS NOT NULL),
                  (SELECT COUNT(*) FROM lineitem
                   WHERE l_suppkey IS NOT NULL
                     AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
           UNION ALL
           SELECT 'orders.o_custkey->customer',
                  (SELECT COUNT(*) FROM orders
                   WHERE o_custkey IS NOT NULL),
                  (SELECT COUNT(*) FROM orders
                   WHERE o_custkey IS NOT NULL
                     AND o_custkey NOT IN (SELECT c_custkey FROM customer))
         )
         SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_orphans AS BIGINT) AS n_orphans,
                CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE)
                  AS orphan_rate
         FROM t ORDER BY relation""",

    "q_llm_dup_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents
                    WHERE len(string_split(text, ' ')) >= 5),
            x AS (SELECT doc_id, ws,
                    unnest(generate_series(1, len(ws) - 4)) AS i FROM w),
            g AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g
                  FROM x),
            c AS (SELECT g, COUNT(*) AS n_occ,
                    COUNT(DISTINCT doc_id) AS n_docs
                  FROM g GROUP BY 1 HAVING COUNT(*) > 1),
            rk AS (SELECT g, n_occ, n_docs,
                     CAST(row_number() OVER (ORDER BY n_occ DESC, g)
                          AS INT) AS rank
                   FROM c)
         SELECT rank, g, n_occ, n_docs FROM rk
         WHERE rank <= 20 ORDER BY rank"""
  )
}
