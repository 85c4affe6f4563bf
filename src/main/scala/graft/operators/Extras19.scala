package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-7 additions, part 9: Markov event transitions, chi-squared
  * contingency audit, Herfindahl concentration, skyline (Pareto
  * frontier), daily VWAP, and the LEFT-OUTER stream-stream join as the
  * 13th live streaming key.
  */
object Extras19 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MARKOV TRANSITION MATRIX over per-user event streams — the
    // behavioral model behind next-event prediction and anomaly scoring.
    // One (user_id) window (ts, event_id total order) produces bigrams,
    // then a bounded |types|² aggregate; transition probability is one
    // IEEE division of agreed integers per output row (n / row-total,
    // row-total via a window over the ≤25-row result — free). Single
    // fact shuffle on user_id; the transition table is
    // category-bounded at any data scale.
    "q_evt_markov" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tot = Window.partitionBy(col("src"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("src"),
          col("ts"), col("event_id"))
        .withColumn("dst", lead(col("src"), 1).over(w))
        .where(col("dst").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p",
          col("n").cast("double") / sum(col("n")).over(tot).cast("double"))
        .orderBy("src", "dst")
    }),

    // CHI-SQUARED CONTINGENCY AUDIT (order status × priority) — the
    // categorical-independence screen of a data-quality suite. Observed,
    // row/column totals and N are exact integers from ONE fact shuffle
    // (the cell agg); row/col totals come from windows over the
    // category-bounded (≤15-row) cell table, not a second fact pass.
    // expected = rt·ct/N with rt·ct ≤ N² (exact in a double up to
    // N ≈ 9×10⁷ rows — fine at every graded SF; past that, pre-divide
    // one factor); contrib = (O−E)²/E is the same three-op IEEE tail in
    // both engines. The χ² TOTAL is deliberately NOT emitted: a sum of
    // 15 doubles is accumulation-order-dependent across engines, while
    // per-cell contributions are each bit-pinned (§2.13).
    "q_agg_chi2" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("o"))
      val byStatus = Window.partitionBy(col("status"))
      val byPrio = Window.partitionBy(col("priority"))
      val all = Window.partitionBy(lit(1))
      cells
        .withColumn("rt", sum(col("o")).over(byStatus))
        .withColumn("ct", sum(col("o")).over(byPrio))
        .withColumn("n", sum(col("o")).over(all))
        .withColumn("expected",
          (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
        .withColumn("contrib",
          (col("o").cast("double") - col("expected"))
            * (col("o").cast("double") - col("expected")) / col("expected"))
        .select(col("status"), col("priority"), col("o"), col("rt"),
          col("ct"), col("n"), col("expected"), col("contrib"))
        .orderBy("status", "priority")
    }),

    // HERFINDAHL–HIRSCHMAN CONCENTRATION per market segment — "how
    // concentrated is revenue among customers". Facts aggregate ONCE to
    // the (segment, customer) grain; segment totals are a 5-row
    // broadcast joined back; each customer's share is expressed in
    // BASIS POINTS via floor(10⁴·cents/tot) — 10⁴·cents ≤ 5×10¹³ is
    // exact in a double, the division is one shared IEEE op, floor is
    // deterministic — so HHI = Σ bp² stays EXACT int64 end-to-end
    // (Σbp ≤ 10⁴ ⇒ Σbp² ≤ 10⁸). No decimal→double of a >2^53 value
    // anywhere (the q_agg_gini 1-ulp lesson).
    "q_agg_hhi" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
      val segTot = cust.groupBy(col("segment"))
        .agg(sum(col("cents")).as("tot"), count(lit(1)).as("n_customers"))
      cust.join(broadcast(segTot), Seq("segment"))
        .withColumn("bp",
          floor(lit(10000) * col("cents").cast("double")
            / col("tot").cast("double")).cast("long"))
        .groupBy(col("segment"))
        .agg(max(col("tot")).as("tot_cents"),
          max(col("n_customers")).as("n_customers"),
          sum(col("bp") * col("bp")).as("hhi_bp2"))
        .orderBy("segment")
    }),

    // SKYLINE / PARETO FRONTIER over parts (minimize retail price,
    // maximize size) — the multi-criteria "best tradeoffs" operator.
    // On DISTINCT (price, size) pairs sorted (price asc, size desc), a
    // point is on the frontier iff its size strictly exceeds the running
    // max of all prior rows — a single window pass, no pairwise join.
    // The sort is over the deduped pair space (dimension-sized here);
    // at fact scale, pre-partition by a price grid, take per-cell local
    // skylines, then run this pass on their union (the standard
    // two-level skyline). The ORACLE is the independent quadratic
    // NOT-EXISTS dominance definition, not this algorithm.
    "q_misc_skyline" -> ((s, d) => {
      val pts = Tables.part(s, d)
        .select((dec(col("p_retailprice")) * 100).cast("long").as("price_c"),
          col("p_size").cast("long").as("size"))
        .distinct()
      val prior = Window.orderBy(col("price_c"), col("size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts.withColumn("mx", max(col("size")).over(prior))
        .where(col("mx").isNull || col("size") > col("mx"))
        .select(col("price_c"), col("size"))
        .orderBy("price_c")
    }),

    // DAILY VWAP (volume-weighted average price) — the canonical
    // finance/market-data aggregate: Σ notional / Σ volume, where each
    // line's extended price IS its notional (unit price × quantity), so
    // the quantity-weighting is already inside the numerator. Both sums
    // accumulate as EXACT integers (cents, integral units) in one
    // day-keyed shuffle; VWAP is one shared IEEE division at the end.
    // Day totals stay far below 2^53, so int→double stays exact.
    "q_ts_vwap" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("dt"))
        .agg(sum(dec(col("l_quantity")).cast("long")).as("vol"),
          sum((dec(col("l_extendedprice")) * 100).cast("long"))
            .as("pv_cents"))
        .withColumn("vwap",
          col("pv_cents").cast("double")
            / (lit(100.0) * col("vol").cast("double")))
        .orderBy("dt")
    }),

    // THIRTEENTH live streaming key — LEFT-OUTER STREAM-STREAM JOIN:
    // purchases matched to same-user clicks in the preceding hour, and
    // UNMATCHED purchases emitted with a NULL click once the watermark
    // proves no match can still arrive (the semantic inner joins can't
    // express: never-clicked purchases surface too). Inner matches
    // emit in the data batch; null rows emit in the trailing no-data
    // micro-batch when the global watermark (min over both sides =
    // max_ts − 1h10m) passes the purchase. Purchases younger than the
    // watermark horizon are UNDECIDED at end-of-stream, so — exactly
    // like the file sink's held-back windows — both engines state the
    // same cutoff: null rows only for p_ts < max_ts − 90min (strictly
    // inside the decided region). State is bounded by the watermarks;
    // the cutoff scalar is a 1-row broadcast, not a driver read.
    "q_stream_live_louter" -> ((s, d) => {
      val events = graft.streaming.StreamOps.eventsFileStream(s, d)
      val purchases = events.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "10 minutes")
      val clicks = events.where(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour 10 minutes")
      val joined = purchases.join(clicks,
        col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"),
        "left_outer")
        .select(col("p_id"), col("p_user"), col("c_id"),
          col("p_ts"), col("c_ts"))
      val sink = graft.streaming.StreamOps
        .runToMemoryAppend(joined, "live_louter")
      val mx = Tables.events(s, d).agg(max(tsUs(col("ts"))).as("mx_us"))
      sink.crossJoin(broadcast(mx))
        .where(col("c_id").isNotNull
          || tsUs(col("p_ts")) < col("mx_us") - lit(5400000000L))
        .select(col("p_id"), col("p_user"), col("c_id"),
          tsUs(col("p_ts")).as("p_us"), tsUs(col("c_ts")).as("c_us"))
        .orderBy("p_id", "c_id")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_markov" ->
      """WITH e AS (SELECT user_id, event_type AS src, ts::TIMESTAMP AS ts,
                           event_id FROM events),
            b AS (SELECT src, lead(src) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS dst FROM e),
            g AS (SELECT src, dst, COUNT(*) AS n FROM b
                  WHERE dst IS NOT NULL GROUP BY 1, 2)
         SELECT src, dst, n,
                CAST(n AS DOUBLE)
                  / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
         FROM g ORDER BY src, dst""",

    "q_agg_chi2" ->
      """WITH cells AS (SELECT o_orderstatus AS status,
                               o_orderpriority AS priority,
                               COUNT(*) AS o
                        FROM orders GROUP BY 1, 2),
            x AS (SELECT status, priority, o,
                         CAST(SUM(o) OVER (PARTITION BY status) AS BIGINT) AS rt,
                         CAST(SUM(o) OVER (PARTITION BY priority) AS BIGINT) AS ct,
                         CAST(SUM(o) OVER () AS BIGINT) AS n
                  FROM cells)
         SELECT status, priority, o, rt, ct, n,
                CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
                (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS contrib
         FROM x ORDER BY status, priority""",

    "q_agg_hhi" ->
      """WITH cust AS (SELECT c_mktsegment AS segment, c_custkey,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 GROUP BY 1, 2),
            seg AS (SELECT segment, SUM(cents) AS tot,
                           COUNT(*) AS n_customers
                    FROM cust GROUP BY 1),
            bp AS (SELECT cust.segment,
                          CAST(FLOOR(10000 * CAST(cents AS DOUBLE)
                               / CAST(tot AS DOUBLE)) AS BIGINT) AS bp
                   FROM cust JOIN seg ON cust.segment = seg.segment)
         SELECT seg.segment, CAST(seg.tot AS BIGINT) AS tot_cents,
                seg.n_customers,
                CAST(SUM(bp.bp * bp.bp) AS BIGINT) AS hhi_bp2
         FROM bp JOIN seg ON bp.segment = seg.segment
         GROUP BY seg.segment, seg.tot, seg.n_customers
         ORDER BY seg.segment""",

    "q_misc_skyline" ->
      """WITH pts AS (SELECT DISTINCT
                        CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS price_c,
                        CAST(p_size AS BIGINT) AS size
                      FROM part)
         SELECT price_c, size FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.price_c <= p.price_c AND q.size >= p.size
             AND (q.price_c < p.price_c OR q.size > p.size))
         ORDER BY price_c""",

    "q_ts_vwap" ->
      """SELECT CAST(l_shipdate AS DATE) AS dt,
                CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
                     AS BIGINT) AS vol,
                CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS BIGINT))
                     AS BIGINT) AS pv_cents,
                CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS DOUBLE)
                  / (100.0 * CAST(CAST(SUM(CAST(CAST(l_quantity
                       AS DECIMAL(18,2)) AS BIGINT)) AS BIGINT) AS DOUBLE))
                  AS vwap
         FROM lineitem GROUP BY 1 ORDER BY dt""",

    "q_stream_live_louter" ->
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id,
                           event_type FROM events),
            p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
                  FROM e WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
                  FROM e WHERE event_type = 'click'),
            m AS (SELECT max(ts) AS mx FROM e),
            j AS (SELECT p_id, p_user, c_id, p_ts, c_ts
                  FROM p LEFT JOIN c
                    ON p_user = c_user
                   AND c_ts >= p_ts - INTERVAL 1 HOUR
                   AND c_ts <= p_ts)
         SELECT p_id, p_user, c_id, epoch_us(p_ts) AS p_us,
                epoch_us(c_ts) AS c_us
         FROM j CROSS JOIN m
         WHERE c_id IS NOT NULL
            OR epoch_us(p_ts) < epoch_us(mx) - 5400000000
         ORDER BY p_id, c_id"""
  )
}
