package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-7 additions, part 12: hierarchy contribution shares,
  * least-squares changepoint detection, tokenizer vocabulary coverage,
  * community modularity, corrupt-record CSV ingestion, and a
  * two-proportion A/B z-test.
  */
object Extras22 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HIERARCHY CONTRIBUTION SHARES — revenue per nation with its share
    // of the parent region and of the global total (the ratio-to-parent
    // OLAP staple). Facts aggregate ONCE to the nation grain (one
    // shuffle); region/global totals are windows over the 25-row nation
    // table; each share is one IEEE division of agreed exact cents.
    "q_agg_share_hierarchy" -> ((s, d) => {
      val nat = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
      val reg = Window.partitionBy(col("r_name"))
      val all = Window.partitionBy(lit(1))
      nat
        .withColumn("share_region",
          col("cents").cast("double")
            / sum(col("cents")).over(reg).cast("double"))
        .withColumn("share_global",
          col("cents").cast("double")
            / sum(col("cents")).over(all).cast("double"))
        .orderBy("r_name", "n_name")
    }),

    // LEAST-SQUARES CHANGEPOINT — the break date that minimizes the
    // two-segment mean-model SSE over the daily revenue series (the
    // simplest rigorous changepoint detector). Prefix sums S1/S2 are
    // EXACT (cents and cents² in DECIMAL(38,0)) from two passes of one
    // calendar window; each candidate's SSE = (S2−S1²/n)_left +
    // (S2−S1²/n)_right is the identical IEEE tail in both engines, so
    // the argmin (tie → earliest date) is engine-exact. O(days)
    // candidates, not O(days²) recomputation.
    "q_ts_changepoint" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val ord = Window.orderBy(col("dt"))
      val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
      val seq = daily
        .withColumn("t", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("s1l", sum(col("y")).over(pre).cast("decimal(38,0)"))
        .withColumn("s2l", sum(col("y").cast("decimal(38,0)")
          * col("y").cast("decimal(38,0)")).over(pre).cast("decimal(38,0)"))
        .withColumn("s1t", sum(col("y")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("decimal(38,0)"))
        .withColumn("s2t", sum(col("y").cast("decimal(38,0)")
          * col("y").cast("decimal(38,0)")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("decimal(38,0)"))
        .where(col("t") > 1) // left segment must be non-empty
      val nl = (col("t") - 1).cast("double")
      val nr = (col("n") - col("t") + 1).cast("double")
      val s1l = col("s1l").cast("double")
      val s2l = col("s2l").cast("double")
      val s1r = (col("s1t") - col("s1l")).cast("double")
      val s2r = (col("s2t") - col("s2l")).cast("double")
      seq
        .withColumn("sse",
          (s2l - s1l * s1l / nl) + (s2r - s1r * s1r / nr))
        .withColumn("mu_left", s1l / nl / lit(100.0))
        .withColumn("mu_right", s1r / nr / lit(100.0))
        .orderBy(col("sse"), col("dt"))
        .limit(1)
        .select(col("dt").as("break_dt"), col("sse"),
          col("mu_left"), col("mu_right"))
    }),

    // TOKENIZER VOCABULARY COVERAGE — what share of the corpus do the
    // top-k vocabulary entries cover (the truncated-vocab OOV metric
    // every tokenizer design starts from). Token counts from one
    // explode+groupBy; the top-100 cut is a TOTAL order (n desc,
    // token); coverage per rank is an exact-integer running share —
    // emitted at ranks 10/50/100 as a bounded 3-row curve.
    "q_llm_vocab_coverage" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val total = toks.agg(sum(col("n")).as("tot"))
      val ranked = toks
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("tok"))).cast("long"))
        .where(col("rank") <= 100)
        .withColumn("cum", sum(col("n")).over(
          Window.orderBy(col("rank"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ranked.where(col("rank").isin(10L, 50L, 100L))
        .crossJoin(broadcast(total))
        .select(col("rank").as("k"), col("cum").as("top_tokens"),
          col("tot").as("total_tokens"),
          (col("cum").cast("double") / col("tot").cast("double"))
            .as("coverage"))
        .orderBy("k")
    }),

    // COMMUNITY MODULARITY — per-community contribution to Newman's Q
    // over the connected components already computed by the shared
    // Components kernel: q_c = L_c/m − (d_c/2m)². Intra-edges and
    // degree masses are exact integers (one semi-annotated edge pass +
    // one degree agg); each contribution is the identical IEEE tail.
    // The TOTAL Q is deliberately not emitted — summing the per-
    // community doubles is accumulation-order-dependent across engines
    // (the chi2 rule); consumers sum the audited contributions.
    "q_graph_modularity" -> ((s, d) => {
      val und = Extras11.undirectedEdges(s, d).duckCkpt()
      val comp = Components.minLabel(und)
        .select(col("id").as("u"), col("lbl").as("component"))
      val m = und.agg(count(lit(1)).as("m"))
      val intra = und
        .join(comp.as("ca"), col("a") === col("ca.u"))
        .join(comp.as("cb"), col("b") === col("cb.u"))
        .where(col("ca.component") === col("cb.component"))
        .groupBy(col("ca.component").as("component"))
        .agg(count(lit(1)).as("l_c"))
      val e = und.select(col("a").as("v")).unionByName(und.select(col("b").as("v")))
      val dmass = e.join(comp, col("v") === col("u"))
        .groupBy(col("component")).agg(count(lit(1)).as("d_c"))
      dmass.join(intra, Seq("component"), "left")
        .select(col("component"),
          coalesce(col("l_c"), lit(0L)).as("l_c"), col("d_c"))
        .crossJoin(broadcast(m))
        .withColumn("q_c",
          col("l_c").cast("double") / col("m").cast("double")
            - (col("d_c").cast("double")
                / (lit(2.0) * col("m").cast("double")))
              * (col("d_c").cast("double")
                / (lit(2.0) * col("m").cast("double"))))
        .select(col("component"), col("l_c"), col("d_c"), col("q_c"))
        .orderBy("component")
    }),

    // CORRUPT-RECORD CSV INGESTION — PERMISSIVE-mode reading of a feed
    // with malformed lines (the ingestion reality every robust pipeline
    // handles): good rows parse, bad rows land whole in the
    // _corrupt_record column instead of failing the job. The fixture
    // (FixtureCache, built once per snapshot) is the orders table as
    // CSV plus 7 planted malformed lines; the result audits good/bad
    // counts and proves the good rows' cents total survived intact.
    "q_source_csv_corrupt" -> ((s, d) => {
      val dir = FixtureCache.ensure("orders_csv_corrupt",
        Seq(s"$d/orders.parquet"), "v1: header-less csv + 7 bad lines") {
        dest =>
          import s.implicits._
          val rows = Tables.orders(s, d)
            .select(concat_ws(",", col("o_orderkey"), col("o_custkey"),
              col("o_orderstatus"), dec(col("o_totalprice")),
              date_format(col("o_orderdate"), "yyyy-MM-dd"),
              col("o_orderpriority")).as("line"))
          val bad = (1 to 7)
            .map(i => s"corrupt line $i,,,not-a-number").toDF("line")
          rows.unionByName(bad).coalesce(1).write.text(dest)
      }
      val schema = "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
        "o_totalprice DECIMAL(18,2), o_orderdate DATE, " +
        "o_orderpriority STRING, _corrupt_record STRING"
      val df = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir)
        .cache() // required by Spark for _corrupt_record queries
      val out = df.agg(count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull,
          (col("o_totalprice") * 100).cast("long"))).as("good_cents"))
      val materialized = out.duckCkpt()
      df.unpersist()
      materialized
    }),

    // TWO-PROPORTION A/B Z-TEST — users split into deterministic arms
    // (user_id parity), conversion = "has a purchase event"; the z
    // statistic for conversion-rate difference. All counts are exact
    // integers from two user-grain aggregates; z is one shared IEEE
    // tail (sqrt correctly rounded). The experiment-analysis primitive
    // next to q_agg_ttest's mean test.
    "q_evt_ab_test" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
      val arms = users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("x"))
      val a0 = arms.where(col("arm") === 0)
        .select(col("n").as("n0"), col("x").as("x0"))
      val a1 = arms.where(col("arm") === 1)
        .select(col("n").as("n1"), col("x").as("x1"))
      val n0 = col("n0").cast("double")
      val n1 = col("n1").cast("double")
      val p0 = col("x0").cast("double") / n0
      val p1 = col("x1").cast("double") / n1
      val pp = ((col("x0") + col("x1")).cast("double")
        / (col("n0") + col("n1")).cast("double"))
      a0.crossJoin(broadcast(a1))
        // a degenerate pool (0% or 100% conversion) has no defined z —
        // both engines emit NULL instead of an ANSI error / IEEE Inf
        .select(col("n0"), col("x0"), col("n1"), col("x1"),
          when(col("x0") + col("x1") > 0
              && col("x0") + col("x1") < col("n0") + col("n1"),
            (p0 - p1) / sqrt(pp * (lit(1.0) - pp)
              * (lit(1.0) / n0 + lit(1.0) / n1))).as("z"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_share_hierarchy" ->
      """WITH nat AS (SELECT r_name, n_name,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
                 FROM orders
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation ON c_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
                 GROUP BY 1, 2)
         SELECT r_name, n_name, cents,
                CAST(cents AS DOUBLE)
                  / CAST(CAST(SUM(cents) OVER (PARTITION BY r_name)
                         AS BIGINT) AS DOUBLE) AS share_region,
                CAST(cents AS DOUBLE)
                  / CAST(CAST(SUM(cents) OVER () AS BIGINT) AS DOUBLE)
                  AS share_global
         FROM nat ORDER BY r_name, n_name""",

    "q_ts_changepoint" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            seq AS (SELECT dt, y,
                      CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t,
                      COUNT(*) OVER () AS n,
                      CAST(COALESCE(SUM(y) OVER (ORDER BY dt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS DECIMAL(38,0)) AS s1l,
                      CAST(COALESCE(SUM(CAST(y AS DECIMAL(38,0))
                          * CAST(y AS DECIMAL(38,0))) OVER (ORDER BY dt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS DECIMAL(38,0)) AS s2l,
                      CAST(SUM(y) OVER () AS DECIMAL(38,0)) AS s1t,
                      CAST(SUM(CAST(y AS DECIMAL(38,0))
                          * CAST(y AS DECIMAL(38,0))) OVER ()
                        AS DECIMAL(38,0)) AS s2t
                    FROM daily),
            c AS (SELECT dt,
                    CAST(t - 1 AS DOUBLE) AS nl,
                    CAST(n - t + 1 AS DOUBLE) AS nr,
                    CAST(s1l AS DOUBLE) AS s1l, CAST(s2l AS DOUBLE) AS s2l,
                    CAST(s1t - s1l AS DOUBLE) AS s1r,
                    CAST(s2t - s2l AS DOUBLE) AS s2r
                  FROM seq WHERE t > 1)
         SELECT dt AS break_dt,
                (s2l - s1l * s1l / nl) + (s2r - s1r * s1r / nr) AS sse,
                s1l / nl / 100.0 AS mu_left,
                s1r / nr / 100.0 AS mu_right
         FROM c
         ORDER BY sse, break_dt LIMIT 1""",

    "q_llm_vocab_coverage" ->
      """WITH toks AS (SELECT t AS tok, COUNT(*) AS n
                       FROM (SELECT unnest(string_split(text, ' ')) AS t
                             FROM documents)
                       WHERE len(t) > 0 GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM toks),
            ranked AS (SELECT n,
                         CAST(row_number() OVER (ORDER BY n DESC, tok)
                              AS BIGINT) AS rank
                       FROM toks QUALIFY rank <= 100),
            cum AS (SELECT rank,
                      CAST(SUM(n) OVER (ORDER BY rank
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                    FROM ranked)
         SELECT rank AS k, cum AS top_tokens, tot AS total_tokens,
                CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS coverage
         FROM cum CROSS JOIN tot
         WHERE rank IN (10, 50, 100)
         ORDER BY k""",

    "q_graph_modularity" ->
      s"""WITH RECURSIVE ${Extras11.GraphSql},
            r(u, lbl) AS (
              SELECT DISTINCT src, src FROM e
              UNION
              SELECT e.dst, r.lbl FROM r JOIN e ON e.src = r.u
              WHERE r.lbl < e.dst),
            comp AS (SELECT u, MIN(lbl) AS component FROM r GROUP BY u),
            m AS (SELECT COUNT(*) AS m FROM und),
            intra AS (SELECT ca.component, COUNT(*) AS l_c
                      FROM und
                      JOIN comp ca ON und.a = ca.u
                      JOIN comp cb ON und.b = cb.u
                      WHERE ca.component = cb.component
                      GROUP BY 1),
            dmass AS (SELECT c.component, COUNT(*) AS d_c
                      FROM (SELECT a AS v FROM und
                            UNION ALL SELECT b FROM und) x
                      JOIN comp c ON x.v = c.u
                      GROUP BY 1)
         SELECT d.component, COALESCE(i.l_c, 0) AS l_c, d.d_c,
                CAST(COALESCE(i.l_c, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
                  - (CAST(d.d_c AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
                    * (CAST(d.d_c AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
                  AS q_c
         FROM dmass d LEFT JOIN intra i ON d.component = i.component
         CROSS JOIN m
         ORDER BY d.component""",

    "q_source_csv_corrupt" ->
      """SELECT COUNT(*) + 7 AS n_rows, CAST(7 AS BIGINT) AS n_corrupt,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS good_cents
         FROM orders""",

    "q_evt_ab_test" ->
      """WITH users AS (SELECT user_id,
                    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
                             ELSE 0 END) AS BIGINT) AS converted
                 FROM events GROUP BY 1),
            arms AS (SELECT user_id % 2 AS arm, COUNT(*) AS n,
                            CAST(SUM(converted) AS BIGINT) AS x
                     FROM users GROUP BY 1),
            w AS (SELECT
                    (SELECT n FROM arms WHERE arm = 0) AS n0,
                    (SELECT x FROM arms WHERE arm = 0) AS x0,
                    (SELECT n FROM arms WHERE arm = 1) AS n1,
                    (SELECT x FROM arms WHERE arm = 1) AS x1)
         SELECT n0, x0, n1, x1,
                CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1 THEN
                  (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                    - CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                  / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 - CAST(x0 + x1 AS DOUBLE)
                          / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 / CAST(n0 AS DOUBLE)
                        + 1.0 / CAST(n1 AS DOUBLE)))
                END AS z
         FROM w"""
  )
}
