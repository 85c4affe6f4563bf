package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, FixtureCache, Tables}

/** Round-12 additions, part 1: the composed IVF-PQ ANN index
  * (round-11 verdict item 3 — coarse cell prune, then in-cell ADC
  * scan, then exact rerank: the deployment ANN shape at 100 TB),
  * incremental dedup against a PERSISTED minhash signature store
  * (verdict item 4 — the production ingest-dedup shape: new batch vs
  * signature parquet, banded equi-join + exact verify), LATERAL VIEW
  * explode SQL-parser surface, and windowed listagg (both queued in
  * SURVEY §8.0-r11 item 4).
  *
  * Scale shape: ivfpq's encode is corpus-linear (fact × 64-codeword
  * broadcast join); the coarse assignment is fact × 8-centroid
  * broadcast; candidates are CELL-PRUNED before the ADC scan (the
  * whole point — only ~nprobe/#cells of the code table is touched
  * per query) and the exact rerank touches ≤ 4·100 rows. The
  * signature store is the amortize-once artifact: per new batch the
  * cost is batch-linear signature computation + a banded equi-join
  * against the store (never all-pairs, never a store rescan beyond
  * the band buckets hit). LATERAL VIEW and windowed listagg are
  * single-shuffle declarative plans.
  *
  * Determinism contract (SURVEY §2.13): ivfpq rides the Extras125
  * DECIMAL(18,6)/(7,6) discipline end to end — every distance is an
  * exact decimal sum, every argmin/top-k ties on an id, doubles only
  * in the two r6 output columns. Incremental dedup joins shingles on
  * RAW strings and signatures on exact integer minhashes (the
  * q_llm_dedup_minhash parity rules); jaccard is one double division
  * of exact integers. listagg orders its frame by the unique
  * (dt, o_orderkey) pair.
  */
object Extras137 {
  import Det._

  private val P = 2147483647L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF-PQ — coarse quantizer (8 centroids, full-vector dot) prunes
    // to the query's 2 best cells; the PQ code table (16 subspaces
    // × 64 anchor codewords, the Extras125 codebook convention) is
    // ADC-scanned ONLY inside those cells; the ADC top-100 per query
    // is exact-reranked to the final top-10. Non-residual IVFADC
    // (codes quantize the raw vectors, not the cell residuals) —
    // stated, so the oracle is the same closed form. Query spine is
    // vectors 0..3 (the q_llm_ann_ivf vec-0 convention — these carry
    // the corpus's directional structure; BASELINE.md records the
    // 100..103 A/B where true neighbors scatter across cells).
    "q_llm_ann_ivfpq" -> ((s, d) => {
      // localCheckpoint: the exploded (vec_id, dim, q, sub) relation
      // feeds the coarse codebook, the assignment, the PQ codebook,
      // the encode, the ADC table AND the exact rerank — without it
      // the plan re-derives the explode from the parquet scan ~25×
      // (round-12 PLANS.md; the playbook shared-subtree rule).
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .toDF("vec_id", "pos", "x")
        .select(col("vec_id"), (col("pos") + 1).as("dim"),
          round(col("x").cast("double"), 6).cast(DecimalType(18, 6))
            .as("q"))
        .withColumn("sub", expr("(dim - 1) div 4"))
        // q6 = exact integer micros of q: the 16.7M-row coarse-dot
        // and encode joins order by EXACT arithmetic either way, and
        // BIGINT products run in whole-stage codegen ~10× faster
        // than BigDecimal — values scale by exactly 1e12, so every
        // argmin/argmax picks the identical row (output unchanged).
        .withColumn("q6", (col("q") * 1000000).cast("long"))
        .duckCkpt()
      // coarse codebook: ADAPTIVE cell count (smallest c in {8, 16,
      // 32, 64} holding expected occupancy ≤ 64 — integer thresholds
      // only, the q_llm_ann_lsh_adaptive scale rule: fixed 8 cells at
      // 8× corpus decayed recall@10 0.85 → 0.45, recorded in
      // BASELINE.md), full-64-dim DOT-PRODUCT assignment — the
      // q_llm_ann_ivf convention; an L2 coarse assignment was A/B'd
      // first and scattered true neighbors across cells (recall@10
      // 0.15), because these embeddings cluster by direction.
      val nc = Tables.embeddings(s, d).agg(count(lit(1)).as("nv"))
        .select(when(col("nv") <= 512, 8L)
          .when(col("nv") <= 1024, 16L)
          .when(col("nv") <= 2048, 32L)
          .otherwise(64L).as("c"))
        // nprobe grows with the cell count (2 of 8 → 4 of ≥32) so the
        // probed fraction falls while staying recall-viable.
        .withColumn("np", when(col("c") <= 16, 2L).otherwise(4L))
      val cb8 = e.crossJoin(broadcast(nc))
        .where(col("vec_id") < col("c"))
        .select(col("vec_id").as("ccid"), col("dim"),
          col("q6").as("cq6"))
      val npCol = broadcast(nc.select(col("np")))
      val cw = Window.partitionBy(col("vec_id"))
        .orderBy(col("cdot").desc, col("ccid"))
      // cdot is the exact BIGINT micro² dot (= the decimal dot × 1e12
      // — same order). Used corpus-wide in the build, query-only in
      // the search.
      def coarseDots(v: DataFrame): DataFrame =
        v.join(broadcast(cb8), "dim")
          .groupBy(col("vec_id"), col("ccid"))
          .agg(sum(col("q6") * col("cq6")).as("cdot"))
      // PQ codebook (Extras125 shape); encode distance is the exact
      // BIGINT micro² sum — identical argmin to the decimal form
      // (scale 1e12).
      val cb = e.where(col("vec_id") < 64)
        .select(col("vec_id").as("cw"), col("dim"), col("sub"),
          col("q").as("cv"), col("q6").as("cv6"))
      val diff6 = col("q6") - col("cv6")
      // INDEX BUILD, amortized (round-13 verdict item 1): the coarse
      // assignment (the nv×64×c dot blow-up) and the PQ code table
      // (the corpus × 64-codeword encode) persist as parquet keyed by
      // the source snapshot; the graded query is SEARCH against the
      // built index — the production IVF-PQ deployment, where the
      // index is built once at ingest. Exact BIGINT artifacts
      // round-trip parquet bit-identically: results unchanged.
      val idxDir = FixtureCache.ensure("ann_ivfpq_idx",
        Seq(s"$d/embeddings.parquet"),
        "adaptive-cell coarse assign + 16x64 PQ code table, v1") {
        dest =>
          coarseDots(e)
            .withColumn("rn", row_number().over(cw))
            .where(col("rn") === 1)
            .select(col("vec_id"), col("ccid").as("cell"))
            .write.parquet(s"$dest/assign")
          e.join(broadcast(cb.select(col("cw"), col("dim"),
              col("cv6"))), "dim")
            .groupBy(col("vec_id"), col("sub"), col("cw"))
            .agg(sum(diff6 * diff6).as("dist"))
            .withColumn("rn", row_number().over(
              Window.partitionBy(col("vec_id"), col("sub"))
                .orderBy(col("dist"), col("cw"))))
            .where(col("rn") === 1)
            .select(col("vec_id"), col("sub"), col("cw").as("code"))
            .write.parquet(s"$dest/codes")
      }
      val assign = s.read.parquet(s"$idxDir/assign")
      val enc = s.read.parquet(s"$idxDir/codes")
      // query probes: the np best coarse cells per query — coarse
      // dots recomputed for the 4 query vectors only (identical rows
      // to the corpus-wide relation restricted to the qids: same
      // per-vec_id groups, same window order)
      val qprobe = coarseDots(e.where(col("vec_id").between(0, 3)))
        .withColumn("rn", row_number().over(cw))
        .crossJoin(npCol)
        .where(col("rn") <= col("np"))
        .select(col("vec_id").as("qid"), col("ccid").as("cell"))
      // ADC lookup table: query-subvector to codeword distances
      val qe = e.where(col("vec_id").between(0, 3))
        .select(col("vec_id").as("qid"), col("dim"), col("sub"),
          col("q"))
      val adc = qe.join(broadcast(cb.select(col("cw"), col("dim"),
          col("cv"))), "dim")
        .groupBy(col("qid"), col("sub"), col("cw"))
        .agg(sum(((col("q") - col("cv")).cast(DecimalType(7, 6))
          * (col("q") - col("cv")).cast(DecimalType(7, 6)))).as("d_qc"))
        .withColumnRenamed("cw", "acw")
      // cell prune THEN ADC scan — the IVF-PQ composition
      val candv = assign.join(broadcast(qprobe), "cell")
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"))
      val scored = candv.join(enc, "vec_id")
        .join(broadcast(adc), Seq("qid", "sub"))
        .where(col("code") === col("acw"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("d_qc")).as("adc_dist"))
      val cand = scored
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("adc_dist"), col("vec_id"))))
        .where(col("crank") <= 100)
        .select(col("qid"), col("vec_id"), col("adc_dist"))
      // exact rerank of the ≤ 400 survivors
      val exact = cand.join(e.select(col("vec_id"), col("dim"),
          col("q").as("qv")), "vec_id")
        .join(broadcast(qe.select(col("qid"), col("dim"),
          col("q").as("qq"))), Seq("qid", "dim"))
        .groupBy(col("qid"), col("vec_id"), col("adc_dist"))
        .agg(sum(((col("qv") - col("qq")).cast(DecimalType(7, 6))
          * (col("qv") - col("qq")).cast(DecimalType(7, 6))))
          .as("true_dist"))
      exact
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("true_dist"), col("vec_id"))).cast("long"))
        .where(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("vec_id"),
          r6(col("adc_dist").cast("double")).as("adc_dist"),
          r6(col("true_dist").cast("double")).as("true_dist"))
        .orderBy(col("qid"), col("rank"))
    }),

    // INCREMENTAL DEDUP — the production ingest shape: minhash
    // signatures of the corpus slice already ingested (doc_id%4 != 0)
    // persist as a parquet SIGNATURE STORE (amortize-once; the
    // FixtureCache write is the WritePath-append stand-in); a "new
    // batch" (doc_id%4 == 0) computes ONLY its own signatures and
    // probes the store via the banded equi-join, then exact-verifies
    // candidates on raw shingles. Output: per batch doc, the smallest
    // duplicate store doc (if any) and the keep verdict.
    "q_llm_dedup_incremental" -> ((s, d) => {
      val rows = LlmOps.shingleTrips(s, d)
      val hm = rows.select(col("doc_id"), (md5long(col("s0")) % P).as("h"))
      val minCols = (0 until 16).map(j =>
        min((lit(2L * j + 1) * col("h") + lit(12345L * j)) % P).as(s"mh$j"))
      def sigOf(df: DataFrame): DataFrame =
        df.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      val storeDir = FixtureCache.ensure("minhash_sig_store",
        Seq(s"$d/documents.parquet"),
        "16-func minhash signature store, store = doc_id%4 != 0, v1") {
        dest =>
          sigOf(hm.where(pmod(col("doc_id"), lit(4L)) =!= 0))
            .write.parquet(dest)
      }
      val store = s.read.parquet(storeDir)
      val batch = sigOf(hm.where(pmod(col("doc_id"), lit(4L)) === 0))
      def bandsOf(df: DataFrame): DataFrame = {
        val bandStructs = (0 until 4).map(b =>
          struct(lit(b).as("b"),
            concat_ws(",", (0 until 4).map(r =>
              col(s"mh${b * 4 + r}").cast("string")): _*).as("bk")))
        df.select(col("doc_id"),
            explode(array(bandStructs: _*)).as("x"))
          .select(col("doc_id"), col("x.b").as("b"), col("x.bk").as("bk"))
      }
      val cand = bandsOf(batch).as("x").join(bandsOf(store).as("y"),
          col("x.b") === col("y.b") && col("x.bk") === col("y.bk"))
        .select(col("x.doc_id").as("bdoc"), col("y.doc_id").as("sdoc"))
        .distinct()
      // exact verify on RAW shingle strings (the minhash parity rule)
      val ex = rows.select(col("doc_id"), col("s0").as("sh"), col("nsh"))
      val dup = cand
        .join(ex.as("a"), col("a.doc_id") === col("bdoc"))
        .join(ex.as("b"), col("b.doc_id") === col("sdoc")
          && col("a.sh") === col("b.sh"))
        .groupBy(col("bdoc"), col("sdoc"))
        .agg(count(lit(1)).as("inter"),
          min(col("a.nsh")).cast("long").as("na"),
          min(col("b.nsh")).cast("long").as("nb"))
        .where(col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")) >= 0.6)
        .groupBy(col("bdoc"))
        .agg(min(col("sdoc")).as("dup_of"),
          count(lit(1)).as("n_dups"))
      batch.select(col("doc_id"))
        .join(dup, col("doc_id") === col("bdoc"), "left")
        .select(col("doc_id"), col("dup_of"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("dup_of").isNull.as("keep"))
        .orderBy("doc_id")
    }),

    // LATERAL VIEW — the HiveQL generator syntax through the SQL
    // parser (SURVEY §8.0-r11 item 4's parser-surface item): explode
    // a split() array in the FROM clause, then a plain aggregate over
    // the generated rows.
    "q_sql_lateral_view" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("v_documents")
      s.sql("""
        SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        FROM v_documents
        LATERAL VIEW explode(split(text, ' ')) t AS word
        WHERE length(word) >= 3
        GROUP BY word
        HAVING COUNT(*) >= 50
        ORDER BY n DESC, word
        LIMIT 40""")
    }),

    // WINDOWED LISTAGG — the running order-priority path per customer
    // (string_agg OVER in the oracle): collect_list over an ordered
    // rows frame, joined to a string. The frame orders by the unique
    // (dt, o_orderkey) pair, so the concatenation is deterministic.
    "q_win_listagg" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("dt"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .where(pmod(col("o_custkey"), lit(50L)) === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("dt"),
          substring(col("o_orderpriority"), 1, 1).as("pr"))
        .withColumn("path", array_join(collect_list(col("pr")).over(w), ">"))
        .select(col("o_custkey"), col("o_orderkey"), col("pr"), col("path"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_ann_ivfpq" ->
      """WITH x AS (SELECT vec_id, embedding,
                      unnest(generate_series(1, len(embedding))) AS dim
                    FROM embeddings),
            e AS (SELECT vec_id, dim, (dim - 1) // 4 AS sub,
                    CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                         AS DECIMAL(18,6)) AS q
                  FROM x),
            nc AS (SELECT CASE WHEN COUNT(*) <= 512 THEN 8
                        WHEN COUNT(*) <= 1024 THEN 16
                        WHEN COUNT(*) <= 2048 THEN 32
                        ELSE 64 END AS c,
                     CASE WHEN COUNT(*) <= 1024 THEN 2 ELSE 4 END AS np
                   FROM embeddings),
            cb8 AS (SELECT vec_id AS ccid, dim, q AS cq
                    FROM e, nc WHERE vec_id < c),
            cd AS (SELECT e.vec_id, cb8.ccid,
                     SUM(CAST(e.q * cb8.cq AS DECIMAL(15,12))) AS cdot
                   FROM e JOIN cb8 ON e.dim = cb8.dim
                   GROUP BY 1, 2),
            assign AS (SELECT vec_id, ccid AS cell FROM (
                       SELECT vec_id, ccid, row_number() OVER (
                         PARTITION BY vec_id ORDER BY cdot DESC, ccid)
                         AS rn
                       FROM cd) t WHERE rn = 1),
            qprobe AS (SELECT vec_id AS qid, ccid AS cell FROM (
                       SELECT vec_id, ccid, row_number() OVER (
                         PARTITION BY vec_id ORDER BY cdot DESC, ccid)
                         AS rn
                       FROM cd WHERE vec_id BETWEEN 0 AND 3) t, nc
                       WHERE rn <= np),
            cb AS (SELECT vec_id AS cw, dim, sub, q AS cv
                   FROM e WHERE vec_id < 64),
            encd AS (SELECT vec_id, sub, cw AS code FROM (
                     SELECT e.vec_id, e.sub, cb.cw,
                       row_number() OVER (PARTITION BY e.vec_id, e.sub
                         ORDER BY SUM(CAST(e.q - cb.cv AS DECIMAL(7,6))
                           * CAST(e.q - cb.cv AS DECIMAL(7,6))), cb.cw)
                         AS rn
                     FROM e JOIN cb ON e.dim = cb.dim
                     GROUP BY e.vec_id, e.sub, cb.cw) t
                   WHERE rn = 1),
            qe AS (SELECT vec_id AS qid, dim, sub, q FROM e
                   WHERE vec_id BETWEEN 0 AND 3),
            adc AS (SELECT qe.qid, qe.sub, cb.cw,
                      SUM(CAST(qe.q - cb.cv AS DECIMAL(7,6))
                        * CAST(qe.q - cb.cv AS DECIMAL(7,6))) AS d_qc
                    FROM qe JOIN cb ON qe.dim = cb.dim
                    GROUP BY 1, 2, 3),
            candv AS (SELECT qprobe.qid, assign.vec_id
                      FROM assign JOIN qprobe USING (cell)
                      WHERE assign.vec_id <> qprobe.qid),
            scored AS (SELECT c.qid, c.vec_id,
                      SUM(adc.d_qc) AS adc_dist
                    FROM candv c
                    JOIN encd ON encd.vec_id = c.vec_id
                    JOIN adc ON adc.qid = c.qid AND adc.sub = encd.sub
                      AND adc.cw = encd.code
                    GROUP BY 1, 2),
            cand AS (SELECT qid, vec_id, adc_dist FROM (
                     SELECT qid, vec_id, adc_dist,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY adc_dist, vec_id) AS crank
                     FROM scored) t
                   WHERE crank <= 100),
            ex AS (SELECT cand.qid, cand.vec_id, cand.adc_dist,
                      SUM(CAST(ev.q - qe.q AS DECIMAL(7,6))
                        * CAST(ev.q - qe.q AS DECIMAL(7,6)))
                        AS true_dist
                    FROM cand
                    JOIN e ev ON ev.vec_id = cand.vec_id
                    JOIN qe ON qe.qid = cand.qid AND qe.dim = ev.dim
                    GROUP BY 1, 2, 3),
            rk AS (SELECT qid, vec_id, adc_dist, true_dist,
                      CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY true_dist, vec_id) AS BIGINT) AS rank
                    FROM ex)
         SELECT qid, rank, vec_id,
                round(CAST(adc_dist AS DOUBLE), 6) AS adc_dist,
                round(CAST(true_dist AS DOUBLE), 6) AS true_dist
         FROM rk WHERE rank <= 10 ORDER BY qid, rank""",

    "q_llm_dedup_incremental" -> {
      val mins = (0 until 16).map(j =>
        s"MIN(((${2 * j + 1} * h) + ${12345 * j}) % 2147483647) AS mh$j")
        .mkString(",\n                           ")
      def bandRows(src: String) = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS b, " +
          (0 until 4).map(r => s"mh${b * 4 + r}::VARCHAR")
            .mkString(" || ',' || ") +
          s" AS bk FROM $src").mkString("\n                     UNION ALL ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            xsh AS (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM xsh),
            hm AS (SELECT doc_id,
                          CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                            % 2147483647 AS h
                   FROM sh),
            sigs AS (SELECT doc_id,
                           $mins
                    FROM hm WHERE doc_id % 4 <> 0 GROUP BY doc_id),
            sigb AS (SELECT doc_id,
                           $mins
                    FROM hm WHERE doc_id % 4 = 0 GROUP BY doc_id),
            bs AS (${bandRows("sigs")}),
            bb AS (${bandRows("sigb")}),
            cand AS (SELECT DISTINCT bb.doc_id AS bdoc, bs.doc_id AS sdoc
                     FROM bb JOIN bs ON bb.b = bs.b AND bb.bk = bs.bk),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
            inter AS (SELECT bdoc, sdoc, COUNT(*) AS inter
                      FROM cand
                      JOIN sh a ON a.doc_id = bdoc
                      JOIN sh b ON b.doc_id = sdoc AND a.s = b.s
                      GROUP BY bdoc, sdoc),
            ver AS (SELECT bdoc, sdoc
                    FROM inter
                    JOIN cnt ca ON ca.doc_id = bdoc
                    JOIN cnt cb ON cb.doc_id = sdoc
                    WHERE CAST(inter AS DOUBLE)
                      / (ca.nsh + cb.nsh - inter) >= 0.6),
            dup AS (SELECT bdoc, CAST(MIN(sdoc) AS BIGINT) AS dup_of,
                      CAST(COUNT(*) AS BIGINT) AS n_dups
                    FROM ver GROUP BY bdoc)
         SELECT sigb.doc_id, dup.dup_of,
                COALESCE(dup.n_dups, 0) AS n_dups,
                dup.dup_of IS NULL AS keep
         FROM sigb LEFT JOIN dup ON dup.bdoc = sigb.doc_id
         ORDER BY sigb.doc_id"""
    },

    "q_sql_lateral_view" ->
      """SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents) t
         WHERE length(w) >= 3
         GROUP BY w
         HAVING COUNT(*) >= 50
         ORDER BY n DESC, word
         LIMIT 40""",

    "q_win_listagg" ->
      """SELECT o_custkey, o_orderkey, pr,
                string_agg(pr, '>') OVER (PARTITION BY o_custkey
                  ORDER BY dt, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS path
         FROM (SELECT o_custkey, o_orderkey,
                 CAST(o_orderdate AS DATE) AS dt,
                 substr(o_orderpriority, 1, 1) AS pr
               FROM orders WHERE o_custkey % 50 = 0) t
         ORDER BY o_custkey, o_orderkey"""
  )
}
