package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-7 additions, part 18: rolling cross-series correlation,
  * functional-dependency audit, transition reciprocity, a per-language
  * dataset card, QUALIFY-style window filtering, and ALL-subquery
  * comparison.
  */
object Extras28 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROLLING CROSS-CORRELATION — 7-day rolling Pearson r between the
    // click and view daily series (q_ts_xcorr's global lagged r made
    // LOCAL in time: the drift monitor that catches two metrics
    // decoupling). All six window sums are EXACT integers over the
    // daily spine; num/d1/d2 are emitted as exact BIGINTs and r is a
    // per-row IEEE tail — num/(√d1·√d2), two correctly-rounded sqrts
    // and one division both engines share. Full-window rows only.
    "q_ts_rolling_corr" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cx"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("cy"))
      // ~30-row daily spine: the single-partition window is bounded by
      // the calendar, not the fact table (the agg above is the shuffle).
      val w = Window.orderBy(col("dt")).rowsBetween(-6, 0)
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val d1 = col("n") * col("sxx") - col("sx") * col("sx")
      val d2 = col("n") * col("syy") - col("sy") * col("sy")
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("cx")).over(w))
        .withColumn("sy", sum(col("cy")).over(w))
        .withColumn("sxx", sum(col("cx") * col("cx")).over(w))
        .withColumn("syy", sum(col("cy") * col("cy")).over(w))
        .withColumn("sxy", sum(col("cx") * col("cy")).over(w))
        .where(col("n") === 7)
        .select(col("dt"), col("cx"), col("cy"),
          num.as("num"), d1.as("d1"), d2.as("d2"),
          when(d1 > 0 && d2 > 0,
            num.cast("double") / (sqrt(d1.cast("double"))
              * sqrt(d2.cast("double")))).as("r"))
        .orderBy("dt")
    }),

    // FUNCTIONAL-DEPENDENCY AUDIT — does X determine Y? The schema-
    // inference / data-quality primitive: per candidate FD, count
    // determinant values and how many map to >1 distinct dependent.
    // md5(text)→n_chars HOLDS (n_chars really is a function of the
    // text — 0 violations is the interesting assertion); the other
    // three are plausible-looking FDs the data refutes. Exact integer
    // counts; determinants stringified onto one union spine.
    "q_dq_fd_check" -> ((s, d) => {
      def fd(name: String, grouped: DataFrame): DataFrame =
        grouped.select(lit(name).as("fd"), col("det"), col("nd"))
      val checks = Seq(
        fd("doc_hash->n_chars",
          Tables.documents(s, d)
            .groupBy(md5(col("text").cast("binary")).as("det"))
            .agg(countDistinct(col("n_chars")).as("nd"))),
        fd("p_type->p_brand",
          Tables.part(s, d).groupBy(col("p_type").as("det"))
            .agg(countDistinct(col("p_brand")).as("nd"))),
        fd("c_nationkey->c_mktsegment",
          Tables.customer(s, d)
            .groupBy(col("c_nationkey").cast("string").as("det"))
            .agg(countDistinct(col("c_mktsegment")).as("nd"))),
        fd("o_custkey->o_orderpriority",
          Tables.orders(s, d)
            .groupBy(col("o_custkey").cast("string").as("det"))
            .agg(countDistinct(col("o_orderpriority")).as("nd"))))
      checks.reduce(_ unionAll _)
        .groupBy(col("fd"))
        .agg(count(lit(1)).as("n_det"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"))
        .orderBy("fd")
    }),

    // TRANSITION RECIPROCITY — for each unordered event-type pair, how
    // often does a→b traffic come back as b→a? Directed edges are the
    // per-user consecutive transitions (q_evt_markov's edge set); the
    // reciprocated mass is min(n_ab, n_ba) — a directed-graph health
    // metric next to assortativity/modularity. Exact counts, one IEEE
    // ratio per constant-bounded pair row.
    "q_graph_reciprocity" -> ((s, d) => {
      val nxt = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("a"))
        .withColumn("b", lead(col("a"), 1).over(nxt))
        .where(col("b").isNotNull && col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      val x = e.select(col("a"), col("b"), col("n").as("n_ab"))
      val y = e.select(col("b").as("a"), col("a").as("b"),
        col("n").as("n_ba"))
      x.join(y, Seq("a", "b"), "left")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"), col("n_ab"),
          coalesce(col("n_ba"), lit(0L)).as("n_ba"),
          least(col("n_ab"), coalesce(col("n_ba"), lit(0L)))
            .as("reciprocated"),
          (least(col("n_ab"), coalesce(col("n_ba"), lit(0L)))
            .cast("double") / col("n_ab").cast("double")).as("ratio"))
        .orderBy("a", "b")
    }),

    // DATASET CARD — the per-language summary block every corpus
    // release ships: docs, chars, distinct sources, exact-duplicate
    // mass (docs minus distinct text hashes — the md5 both engines
    // share), mean length. ONE pass over the corpus; the two ratios
    // are per-row IEEE tails from exact integers.
    "q_llm_dataset_card" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("docs"),
          sum(col("n_chars")).as("chars"),
          countDistinct(col("source")).as("sources"),
          (count(lit(1)) - countDistinct(md5(col("text").cast("binary"))))
            .as("dup_docs"))
        .select(col("lang"), col("docs"), col("chars"), col("sources"),
          col("dup_docs"),
          (col("chars").cast("double") / col("docs").cast("double"))
            .as("mean_chars"),
          (col("dup_docs").cast("double") / col("docs").cast("double"))
            .as("dup_rate"))
        .orderBy("lang")
    }),

    // QUALIFY-STYLE WINDOW FILTER — top-2 orders per customer emitted
    // straight from a ranked scan: the DuckDB oracle says QUALIFY (the
    // SQL surface Spark lacks); the Spark plan is the same window +
    // post-filter Catalyst compiles it to. Rank over EXACT cents with
    // the orderkey tiebreak — a total order, so top-2 is deterministic.
    "q_sql_qualify" -> ((s, d) => {
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("cents").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(byCust))
        .where(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("cents"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ALL-COMPARISON SUBQUERY — orders pricier than EVERY order in a
    // reference cohort (status F, custkey ≤ 10). Spark has no >ALL
    // surface; the plan is the textbook rewrite — broadcast the
    // cohort's scalar MAX and compare once per row (exactly what a
    // decorrelator emits, and the only formulation that scales: one
    // tiny aggregate instead of a quadratic nested loop). Exact cents.
    "q_subquery_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
          col("o_orderstatus"))
      val cohortMax = o
        .where(col("o_orderstatus") === "F" && col("o_custkey") <= 10)
        .agg(max(col("cents")).as("cmax"))
      o.crossJoin(broadcast(cohortMax))
        .where(col("cents") > col("cmax"))
        .select(col("o_orderkey"), col("o_custkey"), col("cents"))
        .orderBy("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_rolling_corr" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS dt,
                  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS cx,
                  CAST(SUM(CASE WHEN event_type='view'  THEN 1 ELSE 0 END)
                       AS BIGINT) AS cy
           FROM events GROUP BY 1),
         w AS (
           SELECT dt, cx, cy,
             COUNT(*)   OVER win AS n,
             SUM(cx)    OVER win AS sx,  SUM(cy)    OVER win AS sy,
             SUM(cx*cx) OVER win AS sxx, SUM(cy*cy) OVER win AS syy,
             SUM(cx*cy) OVER win AS sxy
           FROM daily
           WINDOW win AS (ORDER BY dt ROWS BETWEEN 6 PRECEDING
                          AND CURRENT ROW))
         SELECT dt, cx, cy,
                CAST(n*sxy - sx*sy AS BIGINT) AS num,
                CAST(n*sxx - sx*sx AS BIGINT) AS d1,
                CAST(n*syy - sy*sy AS BIGINT) AS d2,
                CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                     THEN CAST(n*sxy - sx*sy AS DOUBLE)
                          / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                             * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
                END AS r
         FROM w WHERE n = 7 ORDER BY dt""",

    "q_dq_fd_check" ->
      """SELECT fd, COUNT(*) AS n_det,
                CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_violating
         FROM (
           SELECT 'doc_hash->n_chars' AS fd, md5(text) AS det,
                  COUNT(DISTINCT n_chars) AS nd
           FROM documents GROUP BY 1, 2
           UNION ALL
           SELECT 'p_type->p_brand', p_type, COUNT(DISTINCT p_brand)
           FROM part GROUP BY 1, 2
           UNION ALL
           SELECT 'c_nationkey->c_mktsegment', CAST(c_nationkey AS VARCHAR),
                  COUNT(DISTINCT c_mktsegment)
           FROM customer GROUP BY 1, 2
           UNION ALL
           SELECT 'o_custkey->o_orderpriority', CAST(o_custkey AS VARCHAR),
                  COUNT(DISTINCT o_orderpriority)
           FROM orders GROUP BY 1, 2)
         GROUP BY fd ORDER BY fd""",

    "q_graph_reciprocity" ->
      """WITH seq AS (
           SELECT user_id, event_type AS a,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS b
           FROM events),
         e AS (SELECT a, b, COUNT(*) AS n FROM seq
               WHERE b IS NOT NULL AND a <> b GROUP BY 1, 2)
         SELECT x.a, x.b, x.n AS n_ab, COALESCE(y.n, 0) AS n_ba,
                LEAST(x.n, COALESCE(y.n, 0)) AS reciprocated,
                CAST(LEAST(x.n, COALESCE(y.n, 0)) AS DOUBLE)
                  / CAST(x.n AS DOUBLE) AS ratio
         FROM e x LEFT JOIN e y ON x.a = y.b AND x.b = y.a
         WHERE x.a < x.b ORDER BY x.a, x.b""",

    "q_llm_dataset_card" ->
      """SELECT lang, COUNT(*) AS docs,
                CAST(SUM(n_chars) AS BIGINT) AS chars,
                COUNT(DISTINCT source) AS sources,
                COUNT(*) - COUNT(DISTINCT md5(text)) AS dup_docs,
                CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  AS mean_chars,
                CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS dup_rate
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_sql_qualify" ->
      """SELECT o_custkey, o_orderkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
         FROM orders
         QUALIFY row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) DESC, o_orderkey) <= 2
         ORDER BY o_custkey, o_orderkey""",

    "q_subquery_all" ->
      """SELECT o_orderkey, o_custkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
         FROM orders
         WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               > ALL (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                  AS BIGINT)
                      FROM orders
                      WHERE o_orderstatus = 'F' AND o_custkey <= 10)
         ORDER BY o_orderkey"""
  )
}
