package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{FixtureCache, Tables}

/** Round-8 additions, part 4: the persisted minhash signature store,
  * equi-depth histograms, and the forward as-of join.
  */
object Extras37 {
  import graft.Det._

  /** The persisted 16-hash MinHash signature store (doc_id, mh0..mh15):
    * the dedup family's ingest artifact (see q_llm_sig_store's contract
    * note — built once per corpus snapshot, content-stamped, every
    * downstream near-dup query reads signatures instead of re-shingling).
    * Shared since round 16 by the banding studies (q_llm_lsh_eval,
    * q_llm_banding_tradeoff), which previously re-derived the identical
    * signature table inline per key: same universal family, same md5-60
    * hash, so the fixture bytes are bit-identical to the inline build
    * (the q_llm_sig_store oracle recomputes the mins from raw text —
    * a stale or corrupted store fails its hash compare loudly). */
  private[operators] def minhashSigs(s: SparkSession, d: String): DataFrame = {
    val dir = FixtureCache.ensure("minhash_sigs",
      Seq(s"$d/documents.parquet"),
      "16-min universal family ((2j+1)h + 12345j) mod p over md5-60 v1") {
      dest =>
        val p = 2147483647L
        val hm = LlmOps.shingleTrips(s, d)
          .select(col("doc_id"), (md5long(col("s0")) % p).as("h"))
        val minCols = (0 until 16).map(j =>
          min((lit(2L * j + 1) * col("h") + lit(12345L * j)) % p)
            .as(s"mh$j"))
        hm.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
          .write.parquet(dest)
    }
    s.read.parquet(dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MINHASH SIGNATURE STORE — the dedup family's ingest artifact made
    // explicit and GRADED: per-doc 16-hash signatures built once per
    // corpus snapshot (FixtureCache, content-stamped) and served from
    // the store. This is the "build once, merge anywhere" contract a
    // production dedup service runs on — a daily batch lands, its
    // signatures append, every downstream near-dup query reads
    // signatures instead of re-shingling 100 TB. The oracle recomputes
    // the identical universal-family mins from raw text, so a stale or
    // corrupted store FAILS the hash compare.
    "q_llm_sig_store" -> ((s, d) =>
      minhashSigs(s, d).orderBy("doc_id")),

    // EQUI-DEPTH HISTOGRAM — decile boundaries of the price distribution
    // with exact integer ranks ((k·n+9) div 10 — the len_quantiles
    // rule): per decile, the boundary value and the cumulative count at
    // it. The optimizer-statistics shape (DB histograms are equi-depth
    // for selectivity) computed over the per-value histogram, so the
    // sort is value-dimension-sized; a 10-row spine joins the ranks in.
    "q_agg_histogram_eqdepth" -> ((s, d) => {
      val hist = Tables.lineitem(s, d)
        .select((dec(col("l_extendedprice")) * 100).cast("long").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      val wcum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(wcum))
      val tot = hist.agg(sum(col("c")).as("n"))
      val spine = s.range(1, 11).select(col("id").as("k"))
      cum.crossJoin(broadcast(tot))
        .join(broadcast(spine), col("cum") >= expr("(k * n + 9) div 10"))
        .groupBy(col("k"))
        .agg(max(col("n")).as("n"),
          min(col("v")).as("boundary_cents"))
        .select(col("k"), col("n"), col("boundary_cents"))
        .orderBy("k")
    }),

    // FORWARD AS-OF JOIN — for each purchase, the EARLIEST click of the
    // same user at ts >= the purchase (post-conversion engagement; the
    // mirror of q_join_asof's backward lookup). Same union + window
    // shape — first(ignoreNulls) over a CURRENT→FOLLOWING frame, ONE
    // shuffle on user_id, linear per partition. Purchases sort before
    // clicks at equal ts so an equal-ts click is visible (the `<=` tie
    // rule, mirroring DuckDB ASOF). Emits the matched click's ts (not
    // its id) so equal-ts tie-break ambiguity cannot reach the output.
    "q_join_asof_fwd" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          tsUs(col("ts")).as("click_us"), lit(1).as("tag"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast("long").as("click_us"), lit(0).as("tag"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      purchases.unionByName(clicks)
        .withColumn("next_click_us",
          first(col("click_us"), ignoreNulls = true).over(w))
        .where(col("tag") === 0)
        .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
          col("next_click_us"),
          (col("next_click_us") - tsUs(col("ts"))).as("lag_us"))
        .orderBy("event_id")
    })
  )

  private val SigSql: String = {
    val mins = (0 until 16).map(j =>
      s"MIN(((${2 * j + 1} * h) + ${12345 * j}) % 2147483647) AS mh$j")
      .mkString(",\n                ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents WHERE len(string_split(text, ' ')) >= 3),
        xsh AS (SELECT doc_id, ws,
                       unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(ws[i:i+2], ' ') AS s FROM xsh),
        hm AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                        % 2147483647 AS h
               FROM sh),
        sig AS (SELECT doc_id,
                $mins
                FROM hm GROUP BY doc_id)"""
  }

  val oracle: Map[String, String] = Map(

    "q_llm_sig_store" -> s"""
      WITH $SigSql
      SELECT * FROM sig ORDER BY doc_id""",

    "q_agg_histogram_eqdepth" ->
      """WITH hist AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                              * 100 AS BIGINT) AS v, COUNT(*) AS c
                       FROM lineitem GROUP BY 1),
            cum AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum
                    FROM hist),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
            spine AS (SELECT unnest(generate_series(1, 10)) AS k)
         SELECT CAST(s.k AS BIGINT) AS k, MAX(t.n) AS n,
                MIN(c.v) AS boundary_cents
         FROM cum c CROSS JOIN tot t
         JOIN spine s ON c.cum >= (s.k * t.n + 9) // 10
         GROUP BY s.k ORDER BY k""",

    "q_join_asof_fwd" ->
      """WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts::TIMESTAMP AS ts
                  FROM events WHERE event_type = 'click')
         SELECT p.event_id, p.user_id,
                epoch_us(p.ts) AS ts_us,
                epoch_us(c.ts) AS next_click_us,
                epoch_us(c.ts) - epoch_us(p.ts) AS lag_us
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts <= c.ts
         ORDER BY p.event_id"""
  )
}
