package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 33: attribution + volatility round-out —
  * exact Shapley-value channel attribution over the four non-purchase
  * event types, damped-trend Holt smoothing of the per-type daily
  * series (the Extras75 recurrence discipline, φ=9/10).
  *
  * Scale shape: Shapley folds users into the 16-row channel-subset
  * value table and walks a 32-row broadcast subset relation — exact
  * over the full coalition lattice because the channel alphabet is
  * bounded; Holt-damped's fact-sized stage is the (type, day) count.
  *
  * Determinism contract (SURVEY §2.13): coalition values are
  * micro-quantized conversion rates and the Shapley fold multiplies
  * them by INTEGER permutation weights (|S|!(3−|S|)!, denominator 24
  * applied once at the end); the Holt recurrence runs in exact BIGINT
  * micro-units with truncating division.
  */
object Extras107 {
  import Det._

  private val Big = DecimalType(38, 0)
  private val Channels = Seq("click", "error", "signup", "view")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SHAPLEY CHANNEL ATTRIBUTION — v(S) = conversion rate of users
    // whose exposure set is exactly S; φᵢ exact over all 2⁴
    // coalitions: φᵢ = Σ_{S∌i} |S|!(3−|S|)!·(v(S∪i)−v(S)) / 24.
    "q_evt_attribution_shapley" -> ((s, d) => {
      val bits = Channels.zipWithIndex.map { case (t, i) =>
        max(when(col("event_type") === t, 1L << i).otherwise(0L))
          .as(s"b$i")
      }
      val aggs = bits :+
        max((col("event_type") === "purchase").cast("long")).as("conv")
      val per = Tables.events(s, d).groupBy(col("user_id"))
        .agg(aggs.head, aggs.tail: _*)
        .select((col("b0") + col("b1") + col("b2") + col("b3")).as("mask"),
          col("conv"))
      val vt = per.groupBy(col("mask"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
        .select(col("mask"),
          round(col("c").cast("double") / col("n").cast("double") * 1e6)
            .cast("long").as("v_micro"))
        .duckCkpt()
      val pairs = s.range(0, 4).toDF("ch")
        .crossJoin(broadcast(s.range(0, 16).toDF("sub")))
        .where(expr("(sub & shiftleft(1, cast(ch as int))) = 0"))
        .withColumn("pc", expr(
          "CASE bit_count(sub) WHEN 0 THEN 6 WHEN 1 THEN 2 " +
            "WHEN 2 THEN 2 ELSE 6 END"))
        .withColumn("withch", expr("sub | shiftleft(1, cast(ch as int))"))
      val joined = pairs
        .join(vt.select(col("mask"), col("v_micro").as("v1")),
          col("withch") === col("mask"), "left")
        .drop("mask")
        .join(vt.select(col("mask"), col("v_micro").as("v0")),
          col("sub") === col("mask"), "left")
        .select(col("ch"), col("pc"),
          coalesce(col("v1"), lit(0L)).as("v1"),
          coalesce(col("v0"), lit(0L)).as("v0"))
      joined.groupBy(col("ch"))
        .agg(sum(col("pc") * (col("v1") - col("v0"))).as("num"))
        .select(
          element_at(
            array(Channels.map(lit): _*), col("ch").cast("int") + 1)
            .as("channel"),
          r6(col("num").cast("double") / 24 / 1e6).as("shapley_value"))
        .orderBy(col("channel"))
    }),

    // DAMPED-TREND HOLT (α=1/2, β=1/5, φ=9/10) — per-type daily
    // counts in exact micro-units: l' = (y + (l + 9b div 10)) div 2,
    // b' = ((l'−l) + 4·(9b div 10)) div 5; forecast
    // ŷ_h = l + Σᵢ₌₁..h (b·9ⁱ) div 10ⁱ.
    "q_ts_holt_damped" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val span = ev.agg(min(to_date(col("ts"))).as("dmin"),
        max(to_date(col("ts"))).as("dmax"))
      val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("y"))
      val spine = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(sequence(col("dmin"), col("dmax"))).as("dt"))
      val ser = spine.join(daily, Seq("event_type", "dt"), "left")
        .select(col("event_type"), struct(col("dt"),
          coalesce(col("y"), lit(0L)).as("y")).as("p"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(col("event_type"), expr("transform(ps, x -> x.y)").as("ys"))
      ser.as[(String, Seq[Long])]
        .flatMap { case (tpe, ysRaw) =>
          val y = ysRaw.map(_ * 1000000L).toArray
          val n = y.length
          if (n < 3) Iterator.empty
          else {
            var l = y(0)
            var b = y(1) - y(0)
            var t = 1
            while (t < n) {
              val db = 9 * b / 10
              val lNew = (y(t) + (l + db)) / 2
              val bNew = ((lNew - l) + 4 * db) / 5
              l = lNew; b = bNew; t += 1
            }
            (1 to 7).iterator.map { h =>
              var acc = 0L
              var p9 = 1L; var p10 = 1L
              var i = 1
              while (i <= h) {
                p9 *= 9; p10 *= 10
                acc += b * p9 / p10
                i += 1
              }
              (tpe, h.toLong, l + acc, l, b)
            }
          }
        }
        .toDF("event_type", "h", "forecast_micro", "level_micro",
          "trend_micro")
        .orderBy("event_type", "h")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_attribution_shapley" ->
      """WITH per AS (SELECT user_id,
                    CAST(MAX(CASE WHEN event_type = 'click' THEN 1
                      ELSE 0 END)
                      + MAX(CASE WHEN event_type = 'error' THEN 2
                        ELSE 0 END)
                      + MAX(CASE WHEN event_type = 'signup' THEN 4
                        ELSE 0 END)
                      + MAX(CASE WHEN event_type = 'view' THEN 8
                        ELSE 0 END) AS BIGINT) AS mask,
                    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS BIGINT) AS conv
                 FROM events GROUP BY 1),
            vt AS (SELECT mask,
                     CAST(round(CAST(SUM(conv) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT)
                       AS v_micro
                   FROM per GROUP BY 1),
            pairs AS (SELECT ch, sub,
                     CASE bit_count(CAST(sub AS BIGINT))
                       WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
                       ELSE 6 END AS pc,
                     sub | (1 << ch) AS withch
                   FROM range(0, 4) c(ch), range(0, 16) s(sub)
                   WHERE (sub & (1 << ch)) = 0),
            j AS (SELECT p.ch, p.pc,
                    COALESCE(v1.v_micro, 0) AS v1,
                    COALESCE(v0.v_micro, 0) AS v0
                  FROM pairs p
                  LEFT JOIN vt v1 ON v1.mask = p.withch
                  LEFT JOIN vt v0 ON v0.mask = p.sub)
         SELECT ['click', 'error', 'signup', 'view'][CAST(ch AS INT) + 1]
                  AS channel,
                round(CAST(SUM(pc * (v1 - v0)) AS DOUBLE) / 24 / 1e6, 6)
                  AS shapley_value
         FROM j GROUP BY 1 ORDER BY 1""",

    "q_ts_holt_damped" ->
      """WITH RECURSIVE span AS (
              SELECT MIN(CAST(ts AS DATE)) AS dmin,
                     MAX(CAST(ts AS DATE)) AS dmax FROM events),
            types AS (SELECT DISTINCT event_type FROM events),
            spine AS (SELECT event_type,
                        CAST(UNNEST(generate_series(dmin, dmax,
                          INTERVAL 1 DAY)) AS DATE) AS dt
                      FROM types, span),
            daily AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                        CAST(COUNT(*) AS BIGINT) AS y
                      FROM events GROUP BY 1, 2),
            ser AS (SELECT s.event_type, s.dt,
                      COALESCE(dy.y, 0) * 1000000 AS y,
                      ROW_NUMBER() OVER (PARTITION BY s.event_type
                        ORDER BY s.dt) AS t
                    FROM spine s LEFT JOIN daily dy
                      ON dy.event_type = s.event_type AND dy.dt = s.dt),
            arr AS (SELECT event_type, list(y ORDER BY t) AS ys,
                      CAST(COUNT(*) AS BIGINT) AS n
                    FROM ser GROUP BY 1),
            r AS (
              SELECT event_type, ys, n, CAST(2 AS BIGINT) AS t,
                     (ys[2] + (ys[1] + 9 * (ys[2] - ys[1]) // 10)) // 2
                       AS l,
                     (((ys[2] + (ys[1] + 9 * (ys[2] - ys[1]) // 10)) // 2
                         - ys[1])
                       + 4 * (9 * (ys[2] - ys[1]) // 10)) // 5 AS b
              FROM arr WHERE n >= 3
              UNION ALL
              SELECT event_type, ys, n, t + 1,
                     (yt + (l0 + db)) // 2,
                     (((yt + (l0 + db)) // 2 - l0) + 4 * db) // 5
              FROM (SELECT event_type, ys, n, t, l AS l0,
                           9 * b // 10 AS db,
                           ys[CAST(t + 1 AS INT)] AS yt
                    FROM r WHERE t < n) q),
            fin AS (SELECT event_type, l, b FROM r WHERE t = n)
         SELECT f.event_type, h.h AS h,
                CAST(f.l + list_sum(list_transform(
                    range(1, CAST(h.h AS INT) + 1),
                    i -> f.b * [9,81,729,6561,59049,531441,4782969][i]
                      // [10,100,1000,10000,100000,1000000,10000000][i]))
                  AS BIGINT) AS forecast_micro,
                f.l AS level_micro, f.b AS trend_micro
         FROM fin f, (SELECT UNNEST(range(1, 8)) AS h) h
         ORDER BY 1, 2""",


  )
}
