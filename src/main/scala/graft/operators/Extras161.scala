package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 additions, part 2: the MAN-labelled triad census and the
  * watermarked stream-stream LEFT-SEMI join — round-13 verdict items
  * 5 and 7.
  *
  *   (a) q_graph_triad_census_man: the q_graph_triad_census canonical
  *       codes mapped to the 16 Holland-Leinhardt MAN classes
  *       (003 … 300). The code → class table below was derived from
  *       first principles (enumerate all 64 six-bit triads, classify
  *       each by its (mutual, asym, null) dyad signature with the
  *       standard D/U/C/T disambiguation: D = distinguished node is
  *       the common source / arcs point down from it, U = common
  *       target, C = chain/cycle, T = transitive) and cross-checked
  *       against the published Batagelj-Mrvar 64-entry lookup — all
  *       64 agree. Emits ALL 16 classes (0 for absent ones) via a
  *       16-row literal spine.
  *   (b) q_stream_live_semi: purchases ⋉ clicks within the 1-hour
  *       lookback — "purchases with at least one click in the
  *       interval", the dedup-by-presence shape. Semi joins emit a
  *       left row at most once on first match and never emit
  *       null-extended rows, so the only decided-region question is
  *       left-side completeness: a purchase's match window is
  *       [p_ts − 1 h, p_ts], entirely ≤ p_ts, so the row is decided
  *       once the global watermark passes p_ts. wm = min(max p_ts −
  *       10 min, max c_ts − 70 min) (per-side maxima — the
  *       router/fouter rule); strict cutoff wm − 20 min margin,
  *       stated identically in the oracle.
  *
  * Scale shape: the census mapping is a 16-row broadcast spine joined
  * onto the already-Σdeg²-bounded census; the semi join keeps only
  * keyed state within the watermark horizon on both sides (no
  * unmatched-row buffers — semi state is strictly smaller than the
  * outer variants').
  *
  * Determinism contract (SURVEY §2.13): the class labels are a pure
  * function of the exact canonical code; counts are integer; the semi
  * output is integer µs with the per-side-maxima cutoff fixed on both
  * engines; every ORDER BY is on a unique key (man_class / p_id).
  */
object Extras161 {
  import graft.Det._

  /** Canonical 6-bit triad code → Holland-Leinhardt MAN class, for
    * the Extras156 bit convention (b0=x→y, b1=y→x, b2=x→z, b3=z→x,
    * b4=y→z, b5=z→y; canon = min over the 6 relabelings). */
  val manClasses: Seq[(Long, String)] = Seq(
    0L -> "003", 1L -> "012", 3L -> "102", 5L -> "021D",
    6L -> "021C", 7L -> "111U", 10L -> "021U", 11L -> "111D",
    15L -> "201", 21L -> "030T", 23L -> "120U", 25L -> "030C",
    27L -> "120C", 30L -> "120D", 31L -> "210", 63L -> "300")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MAN-LABELLED TRIAD CENSUS — the 16-class Holland-Leinhardt
    // spectrum with its standard names, complete (absent classes
    // emit 0). Rides the census's wedge-bounded enumeration.
    "q_graph_triad_census_man" -> ((s, d) => {
      import s.implicits._
      val census = Extras156.queries("q_graph_triad_census")(s, d)
      val spine = manClasses.toDF("code", "man_class")
      broadcast(spine)
        .join(census.select(col("code"), col("n_triads")),
          Seq("code"), "left")
        .select(col("man_class"),
          coalesce(col("n_triads"), lit(0L)).as("n_triads"))
        .orderBy(col("man_class"))
    }),

    // STREAM-STREAM LEFT-SEMI JOIN — existence within the interval:
    // purchases with ≥1 same-user click in [p_ts − 1 h, p_ts],
    // restricted to the watermark-decided region (see scaladoc).
    "q_stream_live_semi" -> ((s, d) => {
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
        "left_semi")
      val sink = graft.streaming.StreamOps
        .runToMemoryAppend(joined, "live_semi")
      val wm = Tables.events(s, d).agg(least(
        max(when(col("event_type") === "purchase", tsUs(col("ts"))))
          - lit(600000000L),
        max(when(col("event_type") === "click", tsUs(col("ts"))))
          - lit(4200000000L)).as("wm_us"))
      sink.crossJoin(broadcast(wm))
        .where(tsUs(col("p_ts")) < col("wm_us") - lit(1200000000L))
        .select(col("p_id"), col("p_user").as("u"),
          tsUs(col("p_ts")).as("p_us"))
        .orderBy(col("p_id"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_graph_triad_census_man" -> {
      val spineRows = manClasses
        .map { case (c, n) => s"($c, '$n')" }.mkString(", ")
      s"""WITH census AS (${Extras156.oracle("q_graph_triad_census")}),
            spine(code, man_class) AS (VALUES $spineRows)
         SELECT spine.man_class,
                COALESCE(census.n_triads, 0) AS n_triads
         FROM spine LEFT JOIN census USING (code)
         ORDER BY man_class"""
    },

    "q_stream_live_semi" ->
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id,
                           event_type FROM events),
            m AS (SELECT least(
                    max(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) - 600000000,
                    max(CASE WHEN event_type = 'click'
                        THEN epoch_us(ts) END) - 4200000000) AS wm_us
                  FROM e)
         SELECT p.event_id AS p_id, p.user_id AS u,
                epoch_us(p.ts) AS p_us
         FROM e p CROSS JOIN m
         WHERE p.event_type = 'purchase'
           AND epoch_us(p.ts) < m.wm_us - 1200000000
           AND EXISTS (SELECT 1 FROM e c
                 WHERE c.event_type = 'click'
                   AND c.user_id = p.user_id
                   AND c.ts >= p.ts - INTERVAL 1 HOUR
                   AND c.ts <= p.ts)
         ORDER BY p_id"""
  )
}
