package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 9: accounting round-out — the near-dup
  * cluster-size distribution (the histogram q_llm_dedup_card's surplus
  * numbers summarize), robust revenue-anomaly days (the daily analog
  * of q_llm_length_outliers' integer MAD gate), the token-length
  * histogram, and the day-N retention curve.
  *
  * Determinism contract (SURVEY §2.13): cluster labels come from the
  * shared min-label components kernel; median/MAD are exact
  * lower-median order statistics with the cross-multiplied integer
  * gate; retention counts are exact (user, day)-grain integers; each
  * emitted rate is one shared IEEE chain.
  */
object Extras83 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CLUSTER-SIZE DISTRIBUTION — the shape of the near-dup graph's
    // components: (size, n_clusters) plus per-row surplus accounting
    // (size−1 docs removable per cluster). Rides q_llm_dedup_clusters'
    // min-label kernel unchanged.
    "q_llm_cluster_size_dist" -> ((s, d) => {
      LlmOps.queries("q_llm_dedup_clusters")(s, d)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
        .select(col("size"), col("n_clusters"),
          ((col("size") - 1) * col("n_clusters")).as("removable_docs"))
        .orderBy("size")
    }),

    // REVENUE ANOMALY DAYS — the robust daily outlier list: days whose
    // revenue deviates from the calendar median by more than 3×MAD,
    // via the exact-integer gate |y − med|·10 > 30·MAD (never an IEEE
    // compare). Emits the anomalous days with their deviation sign —
    // the monitoring feed a revenue dashboard alerts on.
    "q_evt_anomaly_days" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("y"), col("dt"))
      val med = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("y").as("med"))
      val dev = daily.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("y") - col("med")))
      val wDev = org.apache.spark.sql.expressions.Window
        .orderBy(col("dev"), col("dt"))
      val mad = dev
        .withColumn("rn", row_number().over(wDev))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("dev").as("mad"))
      dev.crossJoin(broadcast(mad))
        .where(col("dev") * 10 > col("mad") * 30)
        .select(col("dt"), col("y"), col("med"), col("mad"),
          when(col("y") > col("med"), lit("high")).otherwise(lit("low"))
            .as("direction"))
        .orderBy("dt")
    }),

    // TOKEN-LENGTH HISTOGRAM — characters per whitespace token across
    // the corpus, capped at 15+ (the tokenizer-sanity profile: a
    // secondary mode at high lengths means unsplit garbage).
    "q_llm_token_len_hist" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .select(least(length(col("tok")), lit(15)).cast("long").as("len"))
        .groupBy(col("len")).agg(count(lit(1)).as("n_tokens"))
        .orderBy("len")),

    // DAY-N RETENTION CURVE — of each user's FIRST active day, the
    // share active again exactly N days later (N = 1, 3, 7, 14): two
    // (user, day)-grain relations + one broadcast offset spine — the
    // canonical product-analytics curve beside the weekly
    // q_evt_retention grid.
    "q_evt_retention_curve" -> ((s, d) => {
      import s.implicits._
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("dt")).distinct()
      val first = ud.groupBy(col("user_id")).agg(min(col("dt")).as("d0"))
      val curve = first
        .crossJoin(broadcast(Seq(1, 3, 7, 14).toDF("n")))
        .join(ud.select(col("user_id"),
          col("dt").as("dn")).as("a"),
          Seq("user_id"), "left")
      curve
        .groupBy(col("n"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("dn") === date_add(col("d0"), col("n")),
            col("user_id"))).as("n_retained"))
        .select(col("n").cast("long").as("day_n"), col("n_users"),
          col("n_retained"),
          r6(col("n_retained").cast("double")
            / col("n_users").cast("double")).as("retention"))
        .orderBy("day_n")
    })
  )

  /** Shared daily-revenue + robust-stats CTE prefix. */
  private val robustCte =
    """daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
       med AS (SELECT y AS med
               FROM (SELECT y,
                       row_number() OVER (ORDER BY y, dt) AS rn,
                       COUNT(*) OVER () AS n
                     FROM daily)
               WHERE rn = (n + 1) // 2),
       dv AS (SELECT d.dt, d.y, m.med, abs(d.y - m.med) AS dev
              FROM daily d, med m),
       mad AS (SELECT dev AS mad
               FROM (SELECT dev,
                       row_number() OVER (ORDER BY dev, dt) AS rn,
                       COUNT(*) OVER () AS n
                     FROM dv)
               WHERE rn = (n + 1) // 2)"""

  val oracle: Map[String, String] = Map(

    "q_llm_cluster_size_dist" ->
      """WITH RECURSIVE
            w AS (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM x),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
            pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             COUNT(*) AS inter
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            nd AS (SELECT doc_a, doc_b FROM pairs
                   JOIN cnt ca ON ca.doc_id = doc_a
                   JOIN cnt cb ON cb.doc_id = doc_b
                   WHERE CAST(inter AS DOUBLE)
                     / (ca.nsh + cb.nsh - inter) >= 0.6),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM nd
                      UNION ALL SELECT doc_b, doc_a FROM nd),
            reach(n, l) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.n),
            comp AS (SELECT n AS doc_id, MIN(l) AS cluster_id
                     FROM reach GROUP BY n),
            cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
                   FROM comp GROUP BY 1)
         SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
                CAST((size - 1) * COUNT(*) AS BIGINT) AS removable_docs
         FROM cs GROUP BY size ORDER BY size""",

    "q_evt_anomaly_days" ->
      s"""WITH $robustCte
         SELECT dv.dt, dv.y, dv.med, mad.mad,
                CASE WHEN dv.y > dv.med THEN 'high' ELSE 'low' END
                  AS direction
         FROM dv, mad
         WHERE dv.dev * 10 > mad.mad * 30
         ORDER BY dv.dt""",

    "q_llm_token_len_hist" ->
      """WITH t AS (SELECT least(length(tok), 15) AS len
                    FROM (SELECT UNNEST(string_split(text, ' ')) AS tok
                          FROM documents))
         SELECT CAST(len AS BIGINT) AS len,
                CAST(COUNT(*) AS BIGINT) AS n_tokens
         FROM t GROUP BY 1 ORDER BY 1""",

    "q_evt_retention_curve" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
                  FROM events),
            f AS (SELECT user_id, MIN(dt) AS d0 FROM ud GROUP BY 1),
            win AS (SELECT UNNEST([1, 3, 7, 14]) AS n)
         SELECT CAST(win.n AS BIGINT) AS day_n,
                CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
                CAST(COUNT(DISTINCT CASE WHEN ud.dt = f.d0
                        + CAST(win.n AS INT) THEN f.user_id END)
                  AS BIGINT) AS n_retained,
                round(CAST(COUNT(DISTINCT CASE WHEN ud.dt = f.d0
                        + CAST(win.n AS INT) THEN f.user_id END)
                    AS DOUBLE)
                  / CAST(COUNT(DISTINCT f.user_id) AS DOUBLE), 6)
                  AS retention
         FROM f CROSS JOIN win
         LEFT JOIN ud ON ud.user_id = f.user_id
         GROUP BY win.n ORDER BY day_n"""
  )
}
