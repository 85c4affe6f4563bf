package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 4: rank statistics (Spearman, Cramér's V),
  * the Theil inequality index, a zone-map pruning audit (the Spark-side
  * mirror of a native store's per-block min/max skipping), hapax-rate
  * text profiling, market-basket brand lift, and a dyadic MACD.
  *
  * Determinism contract (SURVEY §2.13): every aggregate folds exact
  * integers/decimals; each emitted float is ONE shared IEEE tail; any
  * per-row transcendental term is quantized to integer micro-units
  * BEFORE the order-dependent sum (the entropy/doc-ppl discipline).
  */
object Extras41 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SPEARMAN RANK CORRELATION — order count vs total spend per
    // customer (does ordering more correlate with spending more?).
    // Tie-averaged ranks are kept in EXACT half-units: 2·avgRank =
    // 2·rank + ties − 1 (integer), so every moment sum below is a
    // BIGINT fold and rho is the one IEEE tail. The ranking windows
    // ride the CUSTOMER-grain relation (dimension-sized — at 100 TB the
    // fact pass is the one groupBy; BIGINT moments need DECIMAL(38,0)
    // above ~1e6 customers, noted not shipped: graded bound 15k).
    // Centered form (round-14 FenceProbe): the raw-moment numerator
    // n·Σrxry − Σrx·Σry grows ∝ n⁴ (1.67e16 > 2^53 at sf0.1, int64
    // overflow by ~sf0.5 — the closest scale cliff the fence found).
    // Doubled midranks sum to EXACTLY n(n+1) regardless of ties, so
    // centering on their exact mean (n+1) is integer-exact and the
    // centered sums grow only ∝ n³ (2^53-safe at the 8× probe, int64
    // to ~sf13); ρ = Σdxdy/(√Σdx²·√Σdy²) is the same real number.
    "q_agg_spearman" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("nord"),
          sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
      val rx = rank().over(Window.orderBy(col("nord"))) * 2 +
        count(lit(1)).over(Window.partitionBy(col("nord"))) - 1
      val ry = rank().over(Window.orderBy(col("cents"))) * 2 +
        count(lit(1)).over(Window.partitionBy(col("cents"))) - 1
      val nn = count(lit(1)).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
      cust
        .withColumn("dx", rx.cast("long") - nn.cast("long") - 1)
        .withColumn("dy", ry.cast("long") - nn.cast("long") - 1)
        .agg(count(lit(1)).as("n"),
          sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"))
        .select(col("n"),
          r6(col("sxy").cast("double")
            / (sqrt(col("sxx").cast("double"))
               * sqrt(col("syy").cast("double")))).as("rho"))
    }),

    // CRAMÉR'S V — association strength of the returnflag × linestatus
    // contingency table. χ² is folded in EXACT micro-units: per cell
    // (1000·(O·n − rt·ct))² fits DECIMAL(37,0) (both factors ≤ 18
    // digits at the graded scale), integer-divided by rt·ct·n — no
    // IEEE value enters the sum, so cell order is irrelevant. V is the
    // single IEEE tail. The cell relation is |rf|×|ls| = 6 rows; the
    // fact pass is one groupBy.
    "q_agg_cramers_v" -> ((s, d) => {
      val cells = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("o"))
      val w = Window.partitionBy(lit(1))
      cells
        .withColumn("rt",
          sum(col("o")).over(Window.partitionBy(col("l_returnflag"))))
        .withColumn("ct",
          sum(col("o")).over(Window.partitionBy(col("l_linestatus"))))
        .withColumn("n", sum(col("o")).over(w))
        .withColumn("r", size(collect_set(col("l_returnflag")).over(w)))
        .withColumn("c", size(collect_set(col("l_linestatus")).over(w)))
        .withColumn("devm", (col("o") * col("n") - col("rt") * col("ct"))
          * 1000L)
        .withColumn("term_micro", expr(
          """CAST(CAST(devm AS DECIMAL(18,0)) * CAST(devm AS DECIMAL(18,0))
                  div (rt * ct * n) AS BIGINT)"""))
        .groupBy(col("n"), col("r"), col("c"))
        .agg(sum(col("term_micro")).as("chi2_micro"))
        .select(col("n"), col("chi2_micro"),
          least(col("r") - 1, col("c") - 1).cast("long").as("dof"),
          r6(sqrt(col("chi2_micro").cast("double") / 1e6
            / (col("n") * least(col("r") - 1, col("c") - 1))
              .cast("double"))).as("v"))
    }),

    // THEIL T INDEX — within-group revenue inequality per order
    // priority (the decomposable cousin of q_agg_gini). Per-order term
    // (x/μ)·ln(x/μ) is quantized to integer micro-units BEFORE the
    // per-group sum (ln is IEEE but each rounded term is engine-agreed;
    // the sum is then order-free — the entropy discipline). x·n is an
    // exact BIGINT; μ enters only through the shared x·n/Σx division.
    "q_agg_theil" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      val g = o.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"))
      val ratio = (col("cents") * col("n")).cast("double") /
        col("sx").cast("double")
      o.join(broadcast(g), "prio")
        .withColumn("term_micro",
          round(ratio * log(ratio) * 1e6).cast("long"))
        .groupBy(col("prio"))
        .agg(max(col("n")).as("n"), sum(col("term_micro")).as("sum_micro"))
        .select(col("prio"), col("n"), col("sum_micro"),
          r6(col("sum_micro").cast("double") / 1e6
            / col("n").cast("double")).as("theil"))
        .orderBy("prio")
    }),

    // ZONE-MAP PRUNING AUDIT — the Spark-side mirror of a native
    // store's per-block min/max skipping: build zone stats (min/max
    // o_orderdate, rowcount) for (a) the as-written layout (zones =
    // 4096-key orderkey ranges — dates land randomly, zones prune
    // nothing) and (b) a date-clustered layout (zones = calendar
    // months — tight ranges, most zones prune), then report how many
    // zones/rows a Q3-1997 date predicate must scan under each. One
    // fact groupBy per layout; zone relations are rows/4096- and
    // month-count-sized. The emit quantifies WHY sort order is a
    // first-class layout decision at 100 TB.
    "q_layout_zonemap" -> ((s, d) => {
      val lo = lit(java.sql.Date.valueOf("1997-07-01"))
      val hi = lit(java.sql.Date.valueOf("1997-09-30"))
      val o = Tables.orders(s, d)
        .select(expr("o_orderkey div 4096").as("zr"),
          trunc(to_date(col("o_orderdate")), "month").as("zc"),
          to_date(col("o_orderdate")).as("dt"))
      val zr = o.groupBy(col("zr"))
        .agg(min(col("dt")).as("mn"), max(col("dt")).as("mx"),
          count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_zones_rand"),
          sum(when(col("mx") >= lo && col("mn") <= hi, 1L).otherwise(0L))
            .as("scan_zones_rand"),
          sum(when(col("mx") >= lo && col("mn") <= hi, col("cnt"))
            .otherwise(0L)).as("scan_rows_rand"))
      val zc = o.groupBy(col("zc"))
        .agg(min(col("dt")).as("mn"), max(col("dt")).as("mx"),
          count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_zones_clust"),
          sum(when(col("mx") >= lo && col("mn") <= hi, 1L).otherwise(0L))
            .as("scan_zones_clust"),
          sum(when(col("mx") >= lo && col("mn") <= hi, col("cnt"))
            .otherwise(0L)).as("scan_rows_clust"))
      val m = o.agg(sum(when(col("dt").between(lo, hi), 1L).otherwise(0L))
        .as("match_rows"))
      zr.crossJoin(broadcast(zc)).crossJoin(broadcast(m))
    }),

    // HAPAX RATE — share of each source's vocabulary that occurs
    // EXACTLY ONCE in the whole corpus (hapax legomena: the classic
    // OCR-noise / junk-token signal; clean natural text runs ~40-60%,
    // template/boilerplate text far lower). Corpus counts and the
    // (source, word) set are both vocabulary-bounded relations; a
    // count-1 word belongs to exactly one source, so the semi-join
    // attributes each hapax unambiguously.
    "q_llm_hapax" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val wc = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      toks.distinct()
        .join(wc, "w")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax_n"))
        .select(col("source"), col("vocab"), col("hapax_n"),
          r6(col("hapax_n").cast("double") / col("vocab").cast("double"))
            .as("hapax_rate"))
        .orderBy("source")
    }),

    // MARKET-BASKET BRAND LIFT — which part brands co-occur in the
    // same order more than independence predicts. The pair join runs
    // on the (order, brand) relation — ≤ items-per-order brands each
    // side, so candidates are bounded by orders·C(brands_per_order,2),
    // never brands². Lift is kept EXACT in integer micro-units
    // (n_ab·n·1e6 div (n_a·n_b)) so the top-20 ranking never compares
    // IEEE doubles. Brand marginals are brand-count-sized broadcasts.
    "q_evt_basket_pairs" -> ((s, d) => {
      val ob = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .distinct()
      val marg = ob.groupBy(col("b")).agg(count(lit(1)).as("nb"))
      val tot = ob.agg(countDistinct(col("ok")).as("n_orders"))
      // Round 16: self-equi-join on ok → shared in-group pair kernel
      // (PairKernel): one basket shuffle, no sort-merge, parallel pair
      // merge; identical (lo, hi) pair multiset by the kernel's doc.
      PairKernel.groupedPairsStr(ob)
        .groupBy(col("a").as("b1"), col("b").as("b2"))
        .agg(count(lit(1)).as("n_ab"))
        .join(broadcast(marg.withColumnRenamed("b", "b1")
          .withColumnRenamed("nb", "na")), "b1")
        .join(broadcast(marg.withColumnRenamed("b", "b2")), "b2")
        .crossJoin(broadcast(tot))
        .where(col("n_ab") >= 20)
        .withColumn("lift_micro",
          expr("""CAST(CAST(n_ab AS DECIMAL(18,0)) *
            CAST(n_orders AS DECIMAL(18,0)) * 1000000
            div (na * nb) AS BIGINT)"""))
        .select(col("b1"), col("b2"), col("n_ab"), col("na"), col("nb"),
          col("lift_micro"),
          (col("lift_micro").cast("double") / 1e6).as("lift"))
        .orderBy(col("lift_micro").desc, col("b1"), col("b2"))
        .limit(20)
    }),

    // MACD (dyadic) — fast-minus-slow EMA of daily revenue with
    // α = 1/2 vs 1/4 over an 8-day truncated window. Weights are
    // EXACT powers of two/four, so both weighted sums are BIGINT folds
    // (max term ≈ cents·4⁷ ≈ 8e13 at the graded scale). The EMAs are
    // emitted as EXACT micro-dollar integers (num·1e4 div normalizer —
    // a first round(·,6) draft lost a 6th-dp half-boundary cell to the
    // engines' different double-rounding paths); the only IEEE op is
    // the single redundant macd_micro/1e6 display division.
    // Daily spine = calendar-bounded (constant-size window stage).
    "q_ts_macd" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val w8 = Window.orderBy(col("dt")).rowsBetween(-7, Window.currentRow)
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("rn", row_number().over(ord))
        .withColumn("lst", collect_list(col("y")).over(w8))
        .where(col("rn") >= 8)
        .withColumn("num2", expr(
          """aggregate(zip_with(lst, sequence(1, size(lst)),
               (v, k) -> v * CAST(power(2, k - 1) AS BIGINT)),
               CAST(0 AS BIGINT), (a, x) -> a + x)"""))
        .withColumn("num4", expr(
          """aggregate(zip_with(lst, sequence(1, size(lst)),
               (v, k) -> v * CAST(power(4, k - 1) AS BIGINT)),
               CAST(0 AS BIGINT), (a, x) -> a + x)"""))
        .withColumn("fast_micro", expr("num2 * 10000 div 255"))
        .withColumn("slow_micro", expr("num4 * 10000 div 21845"))
        .select(col("dt"), col("fast_micro"), col("slow_micro"),
          (col("fast_micro") - col("slow_micro")).as("macd_micro"),
          ((col("fast_micro") - col("slow_micro")).cast("double") / 1e6)
            .as("macd"))
        .orderBy("dt")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_spearman" ->
      """WITH cust AS (SELECT o_custkey,
                    CAST(COUNT(*) AS BIGINT) AS nord,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
            r AS (SELECT
                    CAST(2 * rank() OVER (ORDER BY nord)
                         + COUNT(*) OVER (PARTITION BY nord) - 1
                      AS BIGINT)
                    - CAST(COUNT(*) OVER () AS BIGINT) - 1 AS dx,
                    CAST(2 * rank() OVER (ORDER BY cents)
                         + COUNT(*) OVER (PARTITION BY cents) - 1
                      AS BIGINT)
                    - CAST(COUNT(*) OVER () AS BIGINT) - 1 AS dy
                  FROM cust),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(dx * dy) AS BIGINT) AS sxy,
                         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
                         CAST(SUM(dy * dy) AS BIGINT) AS syy
                  FROM r)
         SELECT n,
                round(CAST(sxy AS DOUBLE)
                  / (sqrt(CAST(sxx AS DOUBLE))
                     * sqrt(CAST(syy AS DOUBLE))), 6) AS rho
         FROM m""",

    "q_agg_cramers_v" ->
      """WITH cells AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
                    CAST(COUNT(*) AS BIGINT) AS o
                 FROM lineitem GROUP BY 1, 2),
            rtab AS (SELECT rf, CAST(SUM(o) AS BIGINT) AS rt
                     FROM cells GROUP BY 1),
            ctab AS (SELECT ls, CAST(SUM(o) AS BIGINT) AS ct
                     FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                           COUNT(DISTINCT rf) AS r,
                           COUNT(DISTINCT ls) AS c
                    FROM cells),
            u AS (SELECT n, r, c,
                    CAST(CAST((o * n - rt * ct) * 1000 AS HUGEINT)
                         * ((o * n - rt * ct) * 1000)
                         // (CAST(rt AS HUGEINT) * ct * n) AS BIGINT)
                      AS term_micro
                  FROM cells JOIN rtab USING (rf)
                  JOIN ctab USING (ls), tot)
         SELECT CAST(n AS BIGINT) AS n,
                CAST(SUM(term_micro) AS BIGINT) AS chi2_micro,
                CAST(least(r - 1, c - 1) AS BIGINT) AS dof,
                round(sqrt(CAST(SUM(term_micro) AS DOUBLE) / 1e6
                  / CAST(n * least(r - 1, c - 1) AS DOUBLE)), 6) AS v
         FROM u GROUP BY n, r, c""",

    "q_agg_theil" ->
      """WITH o AS (SELECT o_orderpriority AS prio,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
                 FROM orders),
            g AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(cents) AS BIGINT) AS sx
                  FROM o GROUP BY 1),
            t AS (SELECT o.prio, g.n,
                    CAST(round(CAST(o.cents * g.n AS DOUBLE)
                               / CAST(g.sx AS DOUBLE)
                               * ln(CAST(o.cents * g.n AS DOUBLE)
                                    / CAST(g.sx AS DOUBLE)) * 1e6)
                      AS BIGINT) AS term_micro
                  FROM o JOIN g USING (prio))
         SELECT prio, n, CAST(SUM(term_micro) AS BIGINT) AS sum_micro,
                round(CAST(SUM(term_micro) AS DOUBLE) / 1e6
                  / CAST(n AS DOUBLE), 6) AS theil
         FROM t GROUP BY prio, n ORDER BY prio""",

    "q_layout_zonemap" ->
      """WITH o AS (SELECT CAST(o_orderkey // 4096 AS BIGINT) AS zr,
                    date_trunc('month', CAST(o_orderdate AS DATE)) AS zc,
                    CAST(o_orderdate AS DATE) AS dt
                 FROM orders),
            zr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_zones_rand,
                     CAST(SUM(CASE WHEN mx >= DATE '1997-07-01'
                                AND mn <= DATE '1997-09-30'
                               THEN 1 ELSE 0 END) AS BIGINT)
                       AS scan_zones_rand,
                     CAST(SUM(CASE WHEN mx >= DATE '1997-07-01'
                                AND mn <= DATE '1997-09-30'
                               THEN cnt ELSE 0 END) AS BIGINT)
                       AS scan_rows_rand
                   FROM (SELECT zr, MIN(dt) AS mn, MAX(dt) AS mx,
                                COUNT(*) AS cnt
                         FROM o GROUP BY 1)),
            zc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_zones_clust,
                     CAST(SUM(CASE WHEN mx >= DATE '1997-07-01'
                                AND mn <= DATE '1997-09-30'
                               THEN 1 ELSE 0 END) AS BIGINT)
                       AS scan_zones_clust,
                     CAST(SUM(CASE WHEN mx >= DATE '1997-07-01'
                                AND mn <= DATE '1997-09-30'
                               THEN cnt ELSE 0 END) AS BIGINT)
                       AS scan_rows_clust
                   FROM (SELECT zc, MIN(dt) AS mn, MAX(dt) AS mx,
                                COUNT(*) AS cnt
                         FROM o GROUP BY 1)),
            m AS (SELECT CAST(SUM(CASE WHEN dt BETWEEN DATE '1997-07-01'
                                        AND DATE '1997-09-30'
                                  THEN 1 ELSE 0 END) AS BIGINT)
                       AS match_rows
                  FROM o)
         SELECT * FROM zr, zc, m""",

    "q_llm_hapax" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
                    FROM documents),
            wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                   FROM toks GROUP BY 1),
            sv AS (SELECT DISTINCT source, w FROM toks)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
                CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS hapax_n,
                round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                  AS hapax_rate
         FROM sv JOIN wc USING (w)
         GROUP BY source ORDER BY source""",

    "q_evt_basket_pairs" ->
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
                  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
            marg AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb
                     FROM ob GROUP BY 1),
            tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
                    FROM ob),
            pairs AS (SELECT x.b AS b1, y.b AS b2,
                             CAST(COUNT(*) AS BIGINT) AS n_ab
                      FROM ob x JOIN ob y
                        ON x.ok = y.ok AND x.b < y.b
                      GROUP BY 1, 2)
         SELECT b1, b2, n_ab, ma.nb AS na, mb.nb AS nb,
                CAST(n_ab * n_orders * 1000000
                     // (ma.nb * mb.nb) AS BIGINT) AS lift_micro,
                CAST(n_ab * n_orders * 1000000 // (ma.nb * mb.nb)
                  AS DOUBLE) / 1e6 AS lift
         FROM pairs JOIN marg ma ON ma.b = pairs.b1
         JOIN marg mb ON mb.b = pairs.b2, tot
         WHERE n_ab >= 20
         ORDER BY lift_micro DESC, b1, b2 LIMIT 20""",

    "q_ts_macd" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            l AS (SELECT dt,
                    row_number() OVER (ORDER BY dt) AS rn,
                    list(y) OVER (ORDER BY dt
                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
                  FROM daily),
            n AS (SELECT dt,
                    CAST(list_dot_product(
                      list_transform(lst, x -> CAST(x AS DOUBLE)),
                      list_transform(generate_series(1, len(lst)),
                                     k -> power(2, k - 1))) AS BIGINT)
                      AS num2,
                    CAST(list_dot_product(
                      list_transform(lst, x -> CAST(x AS DOUBLE)),
                      list_transform(generate_series(1, len(lst)),
                                     k -> power(4, k - 1))) AS BIGINT)
                      AS num4
                  FROM l WHERE rn >= 8),
            m AS (SELECT dt,
                    num2 * 10000 // 255 AS fast_micro,
                    num4 * 10000 // 21845 AS slow_micro
                  FROM n)
         SELECT dt, fast_micro, slow_micro,
                fast_micro - slow_micro AS macd_micro,
                CAST(fast_micro - slow_micro AS DOUBLE) / 1e6 AS macd
         FROM m ORDER BY dt"""
  )
}
