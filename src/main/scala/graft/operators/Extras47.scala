package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 10: bloom pre-filtered incremental dedup
  * (the reference store's per-block bloom skipping applied to the
  * daily-crawl ingest path), SAX symbolization, k-means cluster purity,
  * and exact interpolated percentiles.
  *
  * Determinism contract (SURVEY §2.13) throughout. The bloom filter is
  * the HAND-ROLLED portable one (md5-positioned bits OR-ed into 63-bit
  * words — q_agg_bloom's construction, scaled to 16384 words): both
  * engines build bit-identical filters, so even the false positives
  * match exactly.
  */
object Extras47 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BLOOM-PREFILTERED CROSS-DEDUP — the ingest-side optimization a
    // 100 TB dedup service runs in front of the posting join: a ~1M-bit
    // bloom of the EXISTING corpus' shingles (built once, broadcast —
    // the Spark analog of the reference's per-block pbloom), probed by
    // every INCOMING shingle. The emit grades the prefilter itself:
    // per incoming doc, shingle count, bloom hits, TRUE hits (exact
    // semi-join ground truth) — so the false-positive rate is measured,
    // not assumed. k=2 portable md5 probes; filter relation 16384 rows.
    "q_llm_dedup_bloom_prefilter" -> ((s, d) => {
      def pos(key: org.apache.spark.sql.Column) = pmod(
        md5long(concat(col("k").cast("string"), lit("#"), key)),
        lit(1032192L)) // 16384 words × 63 bits
      val trips = LlmOps.shingleTrips(s, d)
        .select(col("doc_id"), col("s0"), col("nsh"))
      val corp = trips.where(col("doc_id") % 2 === 0)
      val inc = trips.where(col("doc_id") % 2 === 1)
      val words = corp.select(col("s0")).distinct()
        .select(col("s0"), explode(sequence(lit(0), lit(1))).as("k"))
        .select(pos(col("s0")).as("p"))
        .select(expr("p div 63").as("w"), pmod(col("p"), lit(63L)).as("bit"))
        .groupBy(col("w"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))")
          .as("word"))
      val probed = inc
        .select(col("doc_id"), col("s0"), col("nsh"),
          explode(sequence(lit(0), lit(1))).as("k"))
        .select(col("doc_id"), col("s0"), col("nsh"), pos(col("s0")).as("p"))
        .select(col("doc_id"), col("s0"), col("nsh"),
          expr("p div 63").as("w"), pmod(col("p"), lit(63L)).as("bit"))
        .join(broadcast(words), Seq("w"), "left")
        .groupBy(col("doc_id"), col("s0"), col("nsh"))
        .agg(bool_and(coalesce(
          expr("(word & shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))) != 0"),
          lit(false))).as("bloom_hit"))
      val truth = inc.select(col("doc_id"), col("s0"))
        .join(corp.select(col("s0")).distinct(), Seq("s0"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("true_hits"))
      probed
        .groupBy(col("doc_id"))
        .agg(max(col("nsh")).cast("long").as("n_shingles"),
          sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("bloom_hits"))
        .join(truth, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"), col("bloom_hits"),
          coalesce(col("true_hits"), lit(0L)).as("true_hits"),
          (col("bloom_hits") > 0).as("is_candidate"))
        .orderBy("doc_id")
        .limit(200)
    }),

    // SAX SYMBOLIZATION — Piecewise Aggregate Approximation (8-day
    // segments) of daily revenue, symbolized by RANK-based quartile
    // breakpoints (the Gaussian breakpoints of classic SAX assume a
    // z-normalized series; rank quartiles are the distribution-free,
    // engine-exact variant). Segment sums are exact kilodollar
    // integers; the symbol is ntile(4) over (sum, wid) — a total
    // order, so membership is engine-exact.
    "q_ts_sax" -> ((s, d) => {
      val seg = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) div 100000")
          .as("y"))
        .withColumn("rn", row_number().over(Window.orderBy(col("dt"))))
        .withColumn("wid", expr("(rn - 1) div 8"))
        .groupBy(col("wid"))
        .agg(count(lit(1)).as("n_days"), sum(col("y")).as("seg_sum"),
          min(col("dt")).as("seg_start"))
        .where(col("n_days") === 8)
      seg.withColumn("sym_n",
          ntile(4).over(Window.orderBy(col("seg_sum"), col("wid"))))
        .select(col("wid"), col("seg_start"), col("seg_sum"),
          // a..d by quartile — chr(96 + n)
          chr(col("sym_n") + 96).as("sym"))
        .orderBy("wid")
    }),

    // CLUSTER PURITY — the k-means evaluation matrix: assignments from
    // the q_llm_kmeans kernel (4 seed centroids, exact decimal
    // distances) crossed with the TRUE labels the embeddings carry.
    // Per cluster: size, majority label, purity (= majority share, one
    // IEEE division of exact counts). The confusion relation is
    // clusters × labels — constant-sized.
    "q_llm_cluster_purity" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .toDF("vec_id", "label", "pos", "x")
        .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"),
          round(col("x").cast("double"), 6).cast(DecimalType(18, 6)).as("q"))
      val c = e.where(col("vec_id") < 4)
        .select(col("vec_id").as("c"), col("dim"), col("q").as("cv"))
      val diff = (col("q") - col("cv")).cast(DecimalType(7, 6))
      val assign = e.join(broadcast(c), "dim")
        .groupBy(col("vec_id"), col("label"), col("c"))
        .agg(sum(diff * diff).as("dist"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
          .orderBy(col("dist"), col("c"))))
        .where(col("rn") === 1)
      val cm = assign.groupBy(col("c").as("cluster"), col("label"))
        .agg(count(lit(1)).as("n"))
      cm.withColumn("rk", row_number().over(
          Window.partitionBy(col("cluster"))
            .orderBy(col("n").desc, col("label"))))
        .withColumn("size",
          sum(col("n")).over(Window.partitionBy(col("cluster"))))
        .where(col("rk") === 1)
        .select(col("cluster"), col("size"),
          col("label").as("majority_label"), col("n").as("majority_n"),
          r6(col("n").cast("double") / col("size").cast("double"))
            .as("purity"))
        .orderBy("cluster")
    }),

    // INTERPOLATED PERCENTILES — exact percentile_cont quartiles per
    // order priority: h = (n−1)·q is a dyadic rational, so the
    // interpolated value lives EXACTLY in quarter-cents —
    // 4·v_lo + (v_hi − v_lo)·frac4 is a BIGINT, and the ranking picks
    // cells by row_number with a unique tie-break. No IEEE op decides
    // anything; the display doubles divide by 4 at emit.
    "q_agg_percentile_cont" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("prio"))
        .orderBy(col("cents"), col("o_orderkey"))
      def quartile(num: Int): Seq[org.apache.spark.sql.Column] = {
        // h = num·(n−1)/4; lo row = floor(h)+1; frac4 = (num·(n−1)) mod 4
        val lo = expr(s"($num * (n - 1)) div 4 + 1")
        val f4 = expr(s"($num * (n - 1)) % 4")
        Seq(
          max(when(col("rn") === lo, col("cents"))).as(s"lo$num"),
          max(when(col("rn") === lo + 1, col("cents"))).as(s"hi$num"),
          max(f4).as(s"f$num"))
      }
      o.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("prio"))))
        .groupBy(col("prio"), col("n"))
        .agg((quartile(1) ++ quartile(2) ++ quartile(3)).head,
          (quartile(1) ++ quartile(2) ++ quartile(3)).tail: _*)
        .select(col("prio"), col("n"),
          (col("lo1") * 4 + (coalesce(col("hi1"), col("lo1")) - col("lo1"))
            * col("f1")).as("q25_quarter_cents"),
          (col("lo2") * 4 + (coalesce(col("hi2"), col("lo2")) - col("lo2"))
            * col("f2")).as("q50_quarter_cents"),
          (col("lo3") * 4 + (coalesce(col("hi3"), col("lo3")) - col("lo3"))
            * col("f3")).as("q75_quarter_cents"))
        .withColumn("q25", col("q25_quarter_cents").cast("double") / 4.0)
        .withColumn("q50", col("q50_quarter_cents").cast("double") / 4.0)
        .withColumn("q75", col("q75_quarter_cents").cast("double") / 4.0)
        .orderBy("prio")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_dedup_bloom_prefilter" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM x),
            cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh
                    FROM sh GROUP BY doc_id),
            corp AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
            inc AS (SELECT doc_id, s FROM sh WHERE doc_id % 2 = 1),
            kk AS (SELECT unnest([0, 1]) AS k),
            pos AS (SELECT s,
                      CAST(('0x' || substr(md5(CAST(k AS VARCHAR)
                           || '#' || s), 1, 15)) AS BIGINT) % 1032192 AS p
                    FROM corp, kk),
            words AS (SELECT p // 63 AS w,
                        bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT))
                          AS word
                      FROM pos GROUP BY 1),
            ppos AS (SELECT doc_id, s,
                       CAST(('0x' || substr(md5(CAST(k AS VARCHAR)
                            || '#' || s), 1, 15)) AS BIGINT) % 1032192 AS p
                     FROM inc, kk),
            probe AS (SELECT doc_id, s,
                        bool_and(coalesce(
                          (word & (CAST(1 AS BIGINT)
                                   << CAST(p % 63 AS INT))) != 0, FALSE))
                          AS bloom_hit
                      FROM ppos LEFT JOIN words ON words.w = p // 63
                      GROUP BY doc_id, s),
            agg AS (SELECT doc_id,
                      CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END)
                        AS BIGINT) AS bloom_hits
                    FROM probe GROUP BY doc_id),
            tr AS (SELECT i.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS true_hits
                   FROM inc i JOIN corp c ON i.s = c.s
                   GROUP BY i.doc_id)
         SELECT a.doc_id, cnt.nsh AS n_shingles, a.bloom_hits,
                coalesce(tr.true_hits, 0) AS true_hits,
                a.bloom_hits > 0 AS is_candidate
         FROM agg a JOIN cnt ON cnt.doc_id = a.doc_id
         LEFT JOIN tr ON tr.doc_id = a.doc_id
         ORDER BY a.doc_id LIMIT 200""",

    "q_ts_sax" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) // 100000 AS y
                 FROM orders GROUP BY 1),
            b AS (SELECT dt, y,
                    (row_number() OVER (ORDER BY dt) - 1) // 8 AS wid
                  FROM daily),
            seg AS (SELECT wid, CAST(COUNT(*) AS BIGINT) AS n_days,
                      CAST(SUM(y) AS BIGINT) AS seg_sum,
                      MIN(dt) AS seg_start
                    FROM b GROUP BY 1 HAVING COUNT(*) = 8),
            t AS (SELECT wid, seg_start, seg_sum,
                    ntile(4) OVER (ORDER BY seg_sum, wid) AS sym_n
                  FROM seg)
         SELECT CAST(wid AS BIGINT) AS wid, seg_start, seg_sum,
                chr(CAST(96 + sym_n AS INTEGER)) AS sym
         FROM t ORDER BY wid""",

    "q_llm_cluster_purity" ->
      """WITH x AS (SELECT vec_id, label, embedding,
                           unnest(generate_series(1, len(embedding))) AS dim
                 FROM embeddings),
            e AS (SELECT vec_id, label, CAST(dim AS BIGINT) AS dim,
                    CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                      AS DECIMAL(18,6)) AS q
                  FROM x),
            c AS (SELECT vec_id AS c, dim, q AS cv FROM e WHERE vec_id < 4),
            dist AS (SELECT e.vec_id, e.label, c.c,
                       SUM(CAST(e.q - c.cv AS DECIMAL(7,6))
                           * CAST(e.q - c.cv AS DECIMAL(7,6))) AS dist
                     FROM e JOIN c USING (dim)
                     GROUP BY e.vec_id, e.label, c.c),
            a AS (SELECT vec_id, label, c,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY dist, c) AS rn
                  FROM dist),
            cm AS (SELECT c AS cluster, label, CAST(COUNT(*) AS BIGINT) AS n
                   FROM a WHERE rn = 1 GROUP BY 1, 2),
            r AS (SELECT cluster, label, n,
                    row_number() OVER (PARTITION BY cluster
                      ORDER BY n DESC, label) AS rk,
                    CAST(SUM(n) OVER (PARTITION BY cluster) AS BIGINT)
                      AS size
                  FROM cm)
         SELECT cluster, size, CAST(label AS INT) AS majority_label,
                n AS majority_n,
                round(CAST(n AS DOUBLE) / CAST(size AS DOUBLE), 6)
                  AS purity
         FROM r WHERE rk = 1 ORDER BY cluster""",

    "q_agg_percentile_cont" ->
      """WITH o AS (SELECT o_orderpriority AS prio, o_orderkey,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
                 FROM orders),
            r AS (SELECT prio, cents,
                    row_number() OVER (PARTITION BY prio
                      ORDER BY cents, o_orderkey) AS rn,
                    COUNT(*) OVER (PARTITION BY prio) AS n
                  FROM o),
            g AS (SELECT prio, CAST(n AS BIGINT) AS n,
                    MAX(CASE WHEN rn = (1 * (n - 1)) // 4 + 1
                        THEN cents END) AS lo1,
                    MAX(CASE WHEN rn = (1 * (n - 1)) // 4 + 2
                        THEN cents END) AS hi1,
                    MAX((1 * (n - 1)) % 4) AS f1,
                    MAX(CASE WHEN rn = (2 * (n - 1)) // 4 + 1
                        THEN cents END) AS lo2,
                    MAX(CASE WHEN rn = (2 * (n - 1)) // 4 + 2
                        THEN cents END) AS hi2,
                    MAX((2 * (n - 1)) % 4) AS f2,
                    MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 1
                        THEN cents END) AS lo3,
                    MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 2
                        THEN cents END) AS hi3,
                    MAX((3 * (n - 1)) % 4) AS f3
                  FROM r GROUP BY prio, n)
         SELECT prio, n,
                CAST(lo1 * 4 + (coalesce(hi1, lo1) - lo1) * f1 AS BIGINT)
                  AS q25_quarter_cents,
                CAST(lo2 * 4 + (coalesce(hi2, lo2) - lo2) * f2 AS BIGINT)
                  AS q50_quarter_cents,
                CAST(lo3 * 4 + (coalesce(hi3, lo3) - lo3) * f3 AS BIGINT)
                  AS q75_quarter_cents,
                CAST(lo1 * 4 + (coalesce(hi1, lo1) - lo1) * f1 AS DOUBLE)
                  / 4.0 AS q25,
                CAST(lo2 * 4 + (coalesce(hi2, lo2) - lo2) * f2 AS DOUBLE)
                  / 4.0 AS q50,
                CAST(lo3 * 4 + (coalesce(hi3, lo3) - lo3) * f3 AS DOUBLE)
                  / 4.0 AS q75
         FROM g ORDER BY prio"""
  )
}
