package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{FixtureCache, Tables}

/** Round-13 additions, part 9: the privacy-release triad completed
  * (l-diversity and t-closeness join q_dq_k_anonymity), DeLong
  * confidence intervals for ROC AUC, and the Spark-4-native XML file
  * source.
  *
  * Scale shape: both privacy keys group the fact side once onto the
  * bounded quasi-identifier class grid (the k-anonymity fixture) —
  * one orders shuffle each; the priority spine is 5 values so every
  * per-class distribution is a ≤5-row fold. DeLong folds the fact
  * table into the ≤11-value discount spine like all Extras108
  * metrics. The XML key round-trips a dimension projection through
  * files (FixtureCache'd, one-time build).
  *
  * Determinism contract (SURVEY §2.13): l counts and EMD numerators
  * are exact integers (|cumc·N − cumg·N_c| ≈ 1.2e12 at the 8× probe,
  * far inside BIGINT); DeLong's placement moments are exact
  * DECIMAL(38,0) sums of doubled placements (HUGEINT on the DuckDB
  * side — internal only, the 128-bit OUTPUT fence stands); every
  * emitted float is one shared IEEE tree + r6; XML reads under a
  * PINNED schema (inference nondeterminism fenced out).
  */
object Extras155 {
  import graft.Det._

  private val Big = DecimalType(38, 0)

  /** Quasi-identifier class per customer — the k-anonymity grid
    * (mktsegment, nationkey, acctbal-thousand-bucket). */
  private def qiClasses(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " div 100000").as("bal_k"))

  private val QiSql =
    """qi AS (SELECT c_custkey, c_mktsegment, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           // 100000 AS bal_k
       FROM customer)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // L-DIVERSITY — distinct-l per quasi-identifier class, sensitive
    // attribute = the order priorities of the class's members (a
    // class whose members all share one priority leaks it). Emits the
    // l histogram plus the release verdict columns (min l, share of
    // classes below l=3). Classes with orderless members count l=0.
    "q_dq_l_diversity" -> ((s, d) => {
      val ldiv = qiClasses(s, d)
        .join(Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderpriority")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_k"))
        .agg(countDistinct(col("o_orderpriority")).as("l"))
      // Round 17 (§1.2 don't-recompute): the summary used to re-run the
      // whole customer⋈orders join+distinct-agg a second time; both the
      // verdict columns fold EXACTLY off the l histogram itself —
      // min(l) over classes = min(l) over histogram rows, and
      // share = Σ n_classes[l<3] / Σ n_classes is the same integer
      // division count(l<3)/count(*) was. One fact pass, a ≤|l|-row pin.
      val hist = ldiv.groupBy(col("l")).agg(count(lit(1)).as("n_classes"))
        .duckCkpt() // read twice: summary fold + output rows
      val summ = hist.agg(min(col("l")).as("l_min"),
        (sum(when(col("l") < 3, col("n_classes")).otherwise(0L))
          .cast("double")
          / sum(col("n_classes")).cast("double")).as("sh"))
      hist
        .crossJoin(broadcast(summ))
        .select(col("l"), col("n_classes"), col("l_min"),
          r6(col("sh")).as("share_below3"))
        .orderBy(col("l"))
    }),

    // T-CLOSENESS — ordered-attribute EMD between each class's
    // priority distribution and the global one:
    // t = Σ_i |cumP_i − cumQ_i| / (m−1), cumulative differences kept
    // as exact integer numerators |cumc_i·N − cumg_i·N_c| over the
    // dense (class × priority) grid. Emits the 3 worst classes.
    "q_dq_t_closeness" -> ((s, d) => {
      val ck = Seq(col("c_mktsegment"), col("c_nationkey"), col("bal_k"))
      val fact = qiClasses(s, d)
        .join(Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderpriority").as("pri")),
          col("c_custkey") === col("o_custkey"))
        .select(ck :+ col("pri"): _*)
      // Round 17 (§1.2 don't-recompute): pris/glob/classes/tot each
      // re-ran the customer⋈orders join — FIVE fact passes for one
      // key. Every one of them is a fold of the (class × pri) count
      // grid: distinct pri of fact = distinct pri of cnt, the global
      // distribution is Σc per pri, the class list is cnt's key set,
      // and N = Σc. One fact pass, one ≤|classes|·|pris|-row pin.
      val cnt = fact.groupBy(ck :+ col("pri"): _*)
        .agg(count(lit(1)).as("c"))
        .duckCkpt() // every downstream relation derives from this grid
      val pris = cnt.select(col("pri")).distinct()
      val glob = cnt.groupBy(col("pri")).agg(sum(col("c")).as("g"))
      val classes = cnt.select(ck: _*).distinct()
      // dense grid so the cumulative sums see the zero cells
      val grid = classes.crossJoin(broadcast(pris))
        .join(cnt, Seq("c_mktsegment", "c_nationkey", "bal_k", "pri"),
          "left")
        .join(broadcast(glob), "pri")
        .select(col("c_mktsegment"), col("c_nationkey"), col("bal_k"),
          col("pri"), coalesce(col("c"), lit(0L)).as("c"), col("g"))
      val wc = Window.partitionBy(ck: _*).orderBy(col("pri"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(ck: _*)
      val tot = cnt.agg(sum(col("c")).as("nn"))
      val mrow = pris.agg(count(lit(1)).as("m"))
      val t = grid
        .withColumn("cumc", sum(col("c")).over(wc))
        .withColumn("cumg", sum(col("g")).over(wc))
        .withColumn("nc", sum(col("c")).over(wAll))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(mrow))
        .groupBy(ck: _*)
        .agg(sum(abs(col("cumc") * col("nn") - col("cumg") * col("nc")))
            .as("s"),
          max(col("nc")).as("nc"), max(col("nn")).as("nn"),
          max(col("m")).as("m"))
        .select(col("c_mktsegment"), col("c_nationkey"), col("bal_k"),
          col("nc").as("n_class"),
          (col("s").cast("double")
            / (col("nc").cast("double") * col("nn").cast("double")
              * (col("m") - 1).cast("double"))).as("traw"))
      t.withColumn("rk", row_number().over(Window.orderBy(
          col("traw").desc, col("c_mktsegment"), col("c_nationkey"),
          col("bal_k"))))
        .where(col("rk") <= 3)
        .select(col("rk").cast("long").as("rk"), col("c_mktsegment"),
          col("c_nationkey"), col("bal_k"), col("n_class"),
          r6(col("traw")).as("t"))
        .orderBy(col("rk"))
    }),

    // DELONG AUC CI — the DeLong/DeLong/Clarke-Pearson variance of
    // the tie-aware AUC from placement values. Doubled placements
    // (2·cb0+c0 for positives, 2·(n1−cb1)−c1 for negatives) stay
    // exact integers on the spine; their first/second moments are
    // exact DECIMAL(38,0)/HUGEINT sums; var/se/CI is one shared IEEE
    // tree at the end.
    "q_ml_auc_delong" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select((dec(col("l_discount")) * 100).cast("long").as("v"),
          (col("l_returnflag") === "R").cast("long").as("y"))
        .groupBy(col("v"))
        .agg(sum(col("y")).as("c1"), sum(lit(1) - col("y")).as("c0"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sp = per
        .withColumn("cb1", sum(col("c1")).over(w) - col("c1"))
        .withColumn("cb0", sum(col("c0")).over(w) - col("c0"))
      val tots = sp.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
      val m = sp.crossJoin(broadcast(tots))
        .select(col("c1"), col("c0"), col("n1"), col("n0"),
          (lit(2) * col("cb0") + col("c0")).as("d"),
          (lit(2) * (col("n1") - col("cb1")) - col("c1")).as("e"))
        .groupBy(col("n1"), col("n0"))
        .agg(sum(col("c1").cast(Big) * col("d").cast(Big)).as("s1p"),
          sum(col("c1").cast(Big) * col("d").cast(Big)
            * col("d").cast(Big)).as("s2p"),
          sum(col("c0").cast(Big) * col("e").cast(Big)
            * col("e").cast(Big)).as("s2n"))
      val n1d = col("n1").cast("double")
      val n0d = col("n0").cast("double")
      val auc = col("s1p").cast("double") / (lit(2.0) * n0d * n1d)
      val s10 = (col("s2p").cast("double") / (lit(4.0) * n0d * n0d)
        - n1d * auc * auc) / (n1d - 1)
      val s01 = (col("s2n").cast("double") / (lit(4.0) * n1d * n1d)
        - n0d * auc * auc) / (n0d - 1)
      val se = sqrt(s10 / n1d + s01 / n0d)
      m.select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        r6(auc).as("auc"), r6(se).as("se"),
        r6(auc - lit(1.959964) * se).as("ci_lo"),
        r6(auc + lit(1.959964) * se).as("ci_hi"))
    }),

    // XML FILE SOURCE — Spark 4's built-in XML datasource (rowTag
    // records): round-trip a customer projection through XML files
    // and read it back under a pinned schema; the oracle reads the
    // parquet original, so the check proves write+read value parity.
    "q_source_xml" -> ((s, d) => {
      val tmp = FixtureCache.ensure("customer_xml",
        Seq(s"$d/customer.parquet"), "select 4 cols v1") { dest =>
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"),
            col("c_nationkey").cast("long").as("c_nationkey"),
            col("c_mktsegment"))
          .write.format("xml").option("rowTag", "customer").save(dest)
      }
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", LongType),
        StructField("c_mktsegment", StringType)))
      s.read.format("xml").option("rowTag", "customer")
        .schema(schema).load(tmp)
        .orderBy(col("c_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_dq_l_diversity" ->
      s"""WITH $QiSql,
            ldiv AS (SELECT qi.c_mktsegment, qi.c_nationkey, qi.bal_k,
                       COUNT(DISTINCT o.o_orderpriority) AS l
                     FROM qi LEFT JOIN orders o
                       ON o.o_custkey = qi.c_custkey
                     GROUP BY 1, 2, 3),
            summ AS (SELECT MIN(l) AS l_min,
                       CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END)
                         AS DOUBLE) / COUNT(*) AS sh
                     FROM ldiv)
         SELECT CAST(l AS BIGINT) AS l,
                CAST(COUNT(*) AS BIGINT) AS n_classes,
                CAST(l_min AS BIGINT) AS l_min,
                round(sh, 6) AS share_below3
         FROM ldiv, summ GROUP BY 1, 3, 4 ORDER BY l""",

    "q_dq_t_closeness" ->
      s"""WITH $QiSql,
            fact AS (SELECT qi.c_mktsegment, qi.c_nationkey, qi.bal_k,
                       o.o_orderpriority AS pri
                     FROM qi JOIN orders o
                       ON o.o_custkey = qi.c_custkey),
            cnt AS (SELECT c_mktsegment, c_nationkey, bal_k, pri,
                      COUNT(*) AS c
                    FROM fact GROUP BY 1, 2, 3, 4),
            pris AS (SELECT DISTINCT pri FROM fact),
            gdist AS (SELECT pri, COUNT(*) AS g FROM fact GROUP BY 1),
            classes AS (SELECT DISTINCT c_mktsegment, c_nationkey, bal_k
                        FROM cnt),
            grid AS (SELECT cl.c_mktsegment, cl.c_nationkey, cl.bal_k,
                       p.pri, COALESCE(cnt.c, 0) AS c, gdist.g
                     FROM classes cl CROSS JOIN pris p
                     LEFT JOIN cnt ON cnt.c_mktsegment = cl.c_mktsegment
                       AND cnt.c_nationkey = cl.c_nationkey
                       AND cnt.bal_k = cl.bal_k AND cnt.pri = p.pri
                     JOIN gdist ON gdist.pri = p.pri),
            tot AS (SELECT COUNT(*) AS nn FROM fact),
            mm AS (SELECT COUNT(*) AS m FROM pris),
            stepped AS (SELECT c_mktsegment, c_nationkey, bal_k,
                      SUM(c) OVER (PARTITION BY c_mktsegment,
                        c_nationkey, bal_k ORDER BY pri
                        ROWS UNBOUNDED PRECEDING) AS cumc,
                      SUM(g) OVER (PARTITION BY c_mktsegment,
                        c_nationkey, bal_k ORDER BY pri
                        ROWS UNBOUNDED PRECEDING) AS cumg,
                      SUM(c) OVER (PARTITION BY c_mktsegment,
                        c_nationkey, bal_k) AS nc
                    FROM grid),
            t AS (SELECT c_mktsegment, c_nationkey, bal_k,
                    MAX(nc) AS n_class,
                    CAST(SUM(abs(cumc * nn - cumg * nc)) AS DOUBLE)
                      / (CAST(MAX(nc) AS DOUBLE)
                         * CAST(MAX(nn) AS DOUBLE)
                         * CAST(MAX(m) - 1 AS DOUBLE)) AS traw
                  FROM stepped, tot, mm
                  GROUP BY 1, 2, 3)
         SELECT CAST(rk AS BIGINT) AS rk, c_mktsegment, c_nationkey,
                bal_k, CAST(n_class AS BIGINT) AS n_class,
                round(traw, 6) AS t
         FROM (SELECT *, row_number() OVER (ORDER BY traw DESC,
                 c_mktsegment, c_nationkey, bal_k) AS rk FROM t) z
         WHERE rk <= 3 ORDER BY rk""",

    "q_ml_auc_delong" ->
      """WITH per AS (SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v,
                      SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS c1,
                      SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
                        AS c0
                    FROM lineitem WHERE l_returnflag IN ('R','N')
                    GROUP BY 1),
            sp AS (SELECT c1, c0,
                     SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       - c1 AS cb1,
                     SUM(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       - c0 AS cb0
                   FROM per),
            tots AS (SELECT SUM(c1) AS n1, SUM(c0) AS n0 FROM sp),
            m AS (SELECT MAX(n1) AS n1, MAX(n0) AS n0,
                    SUM(CAST(c1 AS HUGEINT) * (2 * cb0 + c0)) AS s1p,
                    SUM(CAST(c1 AS HUGEINT) * (2 * cb0 + c0)
                      * (2 * cb0 + c0)) AS s2p,
                    SUM(CAST(c0 AS HUGEINT) * (2 * (n1 - cb1) - c1)
                      * (2 * (n1 - cb1) - c1)) AS s2n
                  FROM sp, tots)
         SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
                round(auc, 6) AS auc, round(se, 6) AS se,
                round(auc - 1.959964 * se, 6) AS ci_lo,
                round(auc + 1.959964 * se, 6) AS ci_hi
         FROM (SELECT n1, n0, auc,
                 sqrt(((CAST(s2p AS DOUBLE) / (4 * n0 * n0)
                        - n1 * auc * auc) / (n1 - 1)) / n1
                      + ((CAST(s2n AS DOUBLE) / (4 * n1 * n1)
                        - n0 * auc * auc) / (n0 - 1)) / n0) AS se
               FROM (SELECT n1, n0,
                       CAST(s1p AS DOUBLE)
                         / (2 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
                         AS auc, s2p, s2n
                     FROM m) a) b""",

    "q_source_xml" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT)
                  AS c_nationkey, c_mktsegment
         FROM customer ORDER BY c_custkey"""
  )
}
