package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{FixtureCache, Tables}

/** Round-14 additions, part 1: the two ANN refinements named by the
  * round-13 verdict —
  *   (a) q_llm_ann_ivfpq_lloyd2: residual IVF-PQ with a 2-STEP-Lloyd
  *       trained codebook (verdict item 3): one more exact E-step /
  *       M-step round over the 1-step book of q_llm_ann_ivfpq_lloyd.
  *       Lloyd monotonically decreases quantization error, so recall
  *       must be >= the 1-step book at both scales (measured in
  *       BASELINE.md alongside the seed < 1-step ladder).
  *   (b) q_llm_ann_hnsw_bestfirst: the paper's 1-AT-A-TIME best-first
  *       layer-0 search (verdict item 4) over the SAME persisted graph
  *       as q_llm_ann_hnsw — each round expands exactly ONE node per
  *       query (the globally closest not-yet-expanded), gated by the
  *       paper's stop condition: expand only while that node is no
  *       farther than the worst of the ef=16 best found so far. The
  *       round cap (16) appears in BOTH engines, and post-termination
  *       rounds are no-ops in both, so the driver loop may early-stop
  *       via a bounded 1-row-per-query read without divergence.
  *
  * Scale shape: both ride the round-14 amortized-index convention —
  * the corpus-sized build passes (assignment, codebook training,
  * encode, graph kNN) persist via FixtureCache as parquet keyed by
  * the source snapshot, and the graded query is SEARCH: cell-pruned
  * ADC scan + bounded rerank for (a); entry scan + <= 16 single-node
  * expansions of <= 9 edges each for (b).
  *
  * Determinism contract (SURVEY §2.13): all distances are exact
  * BIGINT micro² zip-folds; both Lloyd M-steps are the exact
  * positive-shifted round-to-nearest mean ((Σ(r6+4e6) + n div 2)
  * div n − 4e6, identical truncation on both engines because the
  * numerator is forced non-negative); every argmin/top-k ties on an
  * id; emitted distances are ONE IEEE division + r6 on both engines.
  */
object Extras160 {
  import graft.Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RESIDUAL IVF-PQ + 2-step Lloyd: seed -> (E,M) -> (E,M) ->
    // final encode; empty codewords keep the previous round's entry
    // (the 1-step convention applied per round).
    "q_llm_ann_ivfpq_lloyd2" -> ((s, d) => {
      val P = s.conf.get("spark.sql.shuffle.partitions").toInt
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .toDF("vec_id", "pos", "x")
        .select(col("vec_id"), (col("pos") + 1).as("dim"),
          (round(col("x").cast("double"), 6).cast(DecimalType(18, 6))
            * 1000000).cast("long").as("q6"))
        .withColumn("sub", expr("(dim - 1) div 4"))
        .repartition(P, col("vec_id")) // 1-partition expansion trap
        .duckCkpt()             // shared-subtree rule
      val nc = Tables.embeddings(s, d).agg(count(lit(1)).as("nv"))
        .select(col("nv"), when(col("nv") <= 512, 8L)
          .when(col("nv") <= 1024, 16L)
          .when(col("nv") <= 2048, 32L)
          .otherwise(64L).as("c"))
        .withColumn("np", when(col("c") <= 16, 2L).otherwise(4L))
        .withColumn("s", greatest(lit(1L), expr("(nv - c) div 256")))
      val cent = e.crossJoin(broadcast(nc))
        .where(col("vec_id") < col("c"))
        .select(col("vec_id").as("ccid"), col("dim"), col("q6").as("c6"))
      val cw0 = Window.partitionBy(col("vec_id"))
        .orderBy(col("cdot").desc, col("ccid"))
      def coarseDots(v: DataFrame): DataFrame =
        v.join(broadcast(cent), "dim")
          .groupBy(col("vec_id"), col("ccid"))
          .agg(sum(col("q6") * col("c6")).as("cdot"))
      val centR = cent.withColumnRenamed("dim", "cdim")
      val idxDir = FixtureCache.ensure("ann_ivfpq_lloyd2_idx",
        Seq(s"$d/embeddings.parquet"),
        "residual IVF-PQ: assign + 2-step-Lloyd (nearest-mean) " +
          "codebook + codes, v2") { dest =>
        coarseDots(e).withColumn("rn", row_number().over(cw0))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("ccid").as("cell"))
          .write.parquet(s"$dest/assign")
        val assignB = s.read.parquet(s"$dest/assign")
        val resid = e.join(assignB, "vec_id")
          .join(broadcast(centR),
            col("cell") === col("ccid") && col("dim") === col("cdim"))
          .select(col("vec_id"), col("dim"), col("sub"),
            (col("q6") - col("c6")).as("r6"))
          .duckCkpt() // seed book, THREE encodes, two M-steps
        val rcb0 = resid
          .crossJoin(broadcast(nc.select(col("c"), col("s"))))
          .where(col("vec_id") >= col("c")
            && (col("vec_id") - col("c")) % col("s") === 0
            && expr("(vec_id - c) div s") < 256)
          .select(expr("(vec_id - c) div s").as("cw"), col("dim"),
            col("r6").as("rc6"))
          .duckCkpt()
        val rsub = resid.groupBy(col("vec_id"), col("sub"))
          .agg(sort_array(collect_list(struct(col("dim"), col("r6"))))
            .as("rv"))
          .repartition(P, col("vec_id")) // AQE would coalesce to 1
          .duckCkpt()
        def encodeAgainst(book: DataFrame): DataFrame = {
          val cbSub = book
            .withColumn("sub", expr("(dim - 1) div 4"))
            .groupBy(col("sub"), col("cw"))
            .agg(sort_array(collect_list(struct(col("dim"),
              col("rc6")))).as("cv"))
          rsub.join(broadcast(cbSub), "sub")
            .select(col("vec_id"), col("sub"), col("cw"), expr(
              """aggregate(zip_with(rv, cv,
                   (a, b) -> (a.r6 - b.rc6) * (a.r6 - b.rc6)),
                   CAST(0 AS BIGINT), (s, v) -> s + v)""").as("dist"))
            .groupBy(col("vec_id"), col("sub"))
            .agg(min(struct(col("dist"), col("cw"))).as("m"))
            .select(col("vec_id"), col("sub"), col("m.cw").as("code"))
        }
        // one exact (E,M) Lloyd round over a given book: encode the
        // corpus residuals, update every non-empty codeword to the
        // positive-shifted ROUND-TO-NEAREST mean of its members
        // ((S + n div 2) div n on the shifted non-negative numerator —
        // identical on both engines), keep the previous entry for
        // empty codewords. The 1-step key uses the floor mean; across
        // TWO rounds the floor bias (−0.5 micro expected per round)
        // compounds, measured: floor-floor read recall@10 0.83 at 8×
        // vs the 1-step book's 0.85 (BASELINE.md round-14 part 1).
        def lloydStep(book: DataFrame): DataFrame = {
          val encI = encodeAgainst(book)
          val updI = resid.join(encI, Seq("vec_id", "sub"))
            .groupBy(col("code").as("cw"), col("dim"))
            .agg(expr(
              "CAST((sum(r6 + 4000000) + count(1) div 2) div count(1)" +
                " - 4000000 AS BIGINT)").as("rc6t"))
          book.join(updI, Seq("cw", "dim"), "left")
            .select(col("cw"), col("dim"),
              coalesce(col("rc6t"), col("rc6")).as("rc6"))
            .duckCkpt() // next round's encode AND fallback
        }
        lloydStep(lloydStep(rcb0)).write.parquet(s"$dest/rcb2")
        encodeAgainst(s.read.parquet(s"$dest/rcb2"))
          .write.parquet(s"$dest/codes")
      }
      val assign = s.read.parquet(s"$idxDir/assign")
      val rcb2 = s.read.parquet(s"$idxDir/rcb2")
      val enc = s.read.parquet(s"$idxDir/codes")
      val qprobe = coarseDots(e.where(col("vec_id").between(0, 3)))
        .withColumn("rn", row_number().over(cw0))
        .crossJoin(broadcast(nc.select(col("np"))))
        .where(col("rn") <= col("np"))
        .select(col("vec_id").as("qid"), col("ccid").as("cell"))
      val qe = e.where(col("vec_id").between(0, 3))
        .select(col("vec_id").as("qid"), col("dim"), col("sub"),
          col("q6").as("qq6"))
      val qres = qprobe.join(qe, "qid")
        .join(broadcast(centR),
          col("cell") === col("ccid") && col("dim") === col("cdim"))
        .select(col("qid"), col("cell"), col("dim"), col("sub"),
          (col("qq6") - col("c6")).as("rq6"))
      val adc = qres.join(broadcast(rcb2), "dim")
        .groupBy(col("qid"), col("cell"), col("sub"), col("cw"))
        .agg(sum((col("rq6") - col("rc6")) * (col("rq6") - col("rc6")))
          .as("d_qc"))
      val candv = assign.join(broadcast(qprobe), "cell")
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("cell"), col("vec_id"))
      val scored = candv.join(enc, "vec_id")
        .join(broadcast(adc), Seq("qid", "cell", "sub"))
        .where(col("code") === col("cw"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("d_qc")).as("adc_i"))
      // CORPUS-PROPORTIONAL rerank shortlist (the fixed-100 depth of
      // the sibling keys is the measured 8× recall bug, not the
      // codebook: every lost true neighbor at 8× sat INSIDE a probed
      // cell at ADC rank 109-210 — shortlist-bound. nv div 128 keeps
      // the rerank a constant fraction of per-cell occupancy as the
      // corpus grows; floor 100 preserves the 1× behavior.)
      val cand = scored
        .crossJoin(broadcast(nc.select(col("nv"))))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("adc_i"), col("vec_id"))))
        .where(col("crank") <= greatest(lit(100L), expr("nv div 128")))
        .select(col("qid"), col("vec_id"), col("adc_i"))
      val exact = cand.join(e.select(col("vec_id"), col("dim"),
          col("q6").as("v6")), "vec_id")
        .join(broadcast(qe.select(col("qid"), col("dim"), col("qq6"))),
          Seq("qid", "dim"))
        .groupBy(col("qid"), col("vec_id"), col("adc_i"))
        .agg(sum((col("v6") - col("qq6")) * (col("v6") - col("qq6")))
          .as("true_i"))
      exact
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("true_i"), col("vec_id"))).cast("long"))
        .where(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("vec_id"),
          r6(col("adc_i").cast("double") / lit(1e12)).as("adc_dist"),
          r6(col("true_i").cast("double") / lit(1e12)).as("true_dist"))
        .orderBy(col("qid"), col("rank"))
    }),

    // HNSW 1-AT-A-TIME BEST-FIRST layer-0 search over the persisted
    // q_llm_ann_hnsw graph (shared fixture — one index, two search
    // algorithms: the production shape). Entry = exact nearest
    // stride-16 node; each round expands the single closest
    // unexpanded node per query IF it is within the worst of that
    // query's ef=16 best found (the paper's termination test);
    // <= 16 rounds, early-stopped when every query is done.
    "q_llm_ann_hnsw_bestfirst" -> ((s, d) =>
      // same fixture as q_llm_ann_hnsw — ONE shared build derivation
      // (round-14 ADVICE item 1: the two byte-duplicated bodies are
      // now a single helper, so the recipe cannot drift)
      hnswBestFirstSearch(s, Extras148.buildHnswIndex(s, d,
        diversify = false)))
  )

  /** The 1-at-a-time best-first layer-0 search, parametrized by the
    * built fixture so ScaleProbe can A/B it over the plain AND the
    * Alg.4-diversified graphs (round-14 verdict item 4); the graded
    * key reads the plain fixture. */
  private[graft] def hnswBestFirstSearch(s: SparkSession,
      idxDir: String, ef: Int = 16, maxRounds: Int = 16): DataFrame = {
      val P = s.conf.get("spark.sql.shuffle.partitions").toInt
      def d2(a: String, b: String) = expr(
        s"""aggregate(zip_with($a, $b,
              (x, y) -> (x.q6 - y.q6) * (x.q6 - y.q6)),
              CAST(0 AS BIGINT), (s, v) -> s + v)""")
      val vpack = s.read.parquet(s"$idxDir/vpack").duckCkpt()
      val edges = s.read.parquet(s"$idxDir/edges")
        .repartition(P, col("src"))
        .duckCkpt()
      val qp = vpack.where(col("vec_id").between(0, 3))
        .select(col("vec_id").as("qid"), col("v").as("qv"))
        .duckCkpt()
      val bw = Window.partitionBy(col("qid"))
        .orderBy(col("dd"), col("vec_id"))
      // entry = the single nearest upper-layer node per query (the
      // paper's ep; a 4-seed efSearch warm start was A/B'd and left
      // recall unchanged at both scales — BASELINE.md round-14)
      var state = qp.crossJoin(
          vpack.where(col("vec_id") % 16 === 0)
            .select(col("vec_id").as("cand"), col("v").as("vb")))
        .select(col("qid"), col("cand").as("vec_id"),
          d2("qv", "vb").as("dd"))
        .withColumn("rn", row_number().over(bw))
        .where(col("rn") === 1)
        .select(col("qid"), col("vec_id"), col("dd"),
          lit(false).as("exp"))
        .duckCkpt()
      // best-first rounds, ONE checkpoint + ONE bounded driver read
      // per round: the frontier is BY CONSTRUCTION <= 1 row per query
      // (<= 4 rows — the playbook bounded-read rule), so it collects
      // to the driver and re-enters the plan as a literal broadcast
      // relation — this halves the per-round action count vs a
      // checkpointed frontier (measured: ~0.9 -> ~0.45 s/round). The
      // round cap lives in BOTH engines, and a terminated query
      // expands nothing in both, so skipping no-op rounds cannot
      // diverge.
      import s.implicits._
      var t = 0
      var active = true
      while (t < maxRounds && active) {
        // ONE ranked pass yields both the ef-bound (16th-best found)
        // and the best unexpanded node (min struct over !exp rows —
        // no second window); the gated frontier is BY CONSTRUCTION
        // <= 1 row per query (<= 4 rows — the playbook bounded-read
        // rule), so it collects and re-enters the plan as a literal
        // broadcast relation: one driver read + one checkpoint per
        // round (a checkpointed frontier measured ~2x the wall-clock)
        val baRows = state
          .withColumn("rn", row_number().over(bw))
          .groupBy(col("qid"))
          .agg(max(when(col("rn") <= ef, col("dd"))).as("t16"),
            min(when(!col("exp"),
              struct(col("dd"), col("vec_id")))).as("bu"))
          .where(col("bu").isNotNull && col("bu.dd") <= col("t16"))
          .select(col("qid"), col("bu.vec_id").as("vec_id"))
          .collect()
        if (sys.env.contains("SPARK_GRAFT_ANN_TRACE"))
          System.err.println(
            s"[bestfirst] round $t active-queries ${baRows.length}")
        if (baRows.isEmpty) { active = false } else {
          val ba = baRows.toSeq
            .map(r => (r.getLong(0), r.getLong(1)))
            .toDF("qid", "vec_id")
          // one src per qid -> (qid, dst) is already distinct
          val cand = broadcast(ba)
            .join(edges, ba("vec_id") === edges("src"))
            .select(col("qid"), col("dst").as("vec_id"))
            .join(state.select(col("qid"), col("vec_id")),
              Seq("qid", "vec_id"), "left_anti")
          val scored = vpack.select(col("vec_id"), col("v").as("vb"))
            .join(broadcast(cand), "vec_id")
            .join(broadcast(qp), "qid")
            .select(col("qid"), col("vec_id"), d2("qv", "vb").as("dd"),
              lit(false).as("exp"))
          state = state
            .join(broadcast(ba.withColumn("f", lit(true))),
              Seq("qid", "vec_id"), "left")
            .select(col("qid"), col("vec_id"), col("dd"),
              (col("exp") || coalesce(col("f"), lit(false))).as("exp"))
            .unionByName(scored)
            .duckCkpt()
        }
        t += 1
      }
      state.where(col("vec_id") =!= col("qid"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("dd"), col("vec_id"))).cast("long"))
        .where(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("vec_id"),
          r6(col("dd").cast("double") / lit(1e12)).as("dist"))
        .orderBy(col("qid"), col("rank"))
  }

  val oracle: Map[String, String] = Map(

    "q_llm_ann_ivfpq_lloyd2" ->
      """WITH x AS (SELECT vec_id, embedding,
                      unnest(generate_series(1, len(embedding))) AS dim
                    FROM embeddings),
            e AS MATERIALIZED (
              SELECT vec_id, dim, (dim - 1) // 4 AS sub,
                CAST(CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                     AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS q6
              FROM x),
            nc AS (SELECT COUNT(*) AS nv,
                     CASE WHEN COUNT(*) <= 512 THEN 8
                        WHEN COUNT(*) <= 1024 THEN 16
                        WHEN COUNT(*) <= 2048 THEN 32
                        ELSE 64 END AS c,
                     CASE WHEN COUNT(*) <= 1024 THEN 2 ELSE 4 END AS np,
                     greatest(1, (COUNT(*)
                       - CASE WHEN COUNT(*) <= 512 THEN 8
                           WHEN COUNT(*) <= 1024 THEN 16
                           WHEN COUNT(*) <= 2048 THEN 32
                           ELSE 64 END) // 256) AS s
                   FROM embeddings),
            cent AS MATERIALIZED (
              SELECT vec_id AS ccid, dim, q6 AS c6
              FROM e, nc WHERE vec_id < c),
            cd AS MATERIALIZED (
              SELECT e.vec_id, cent.ccid,
                CAST(SUM(e.q6 * cent.c6) AS BIGINT) AS cdot
              FROM e JOIN cent ON e.dim = cent.dim
              GROUP BY 1, 2),
            assign AS MATERIALIZED (
              SELECT vec_id, ccid AS cell FROM (
                SELECT vec_id, ccid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cdot DESC, ccid) AS rn
                FROM cd) t WHERE rn = 1),
            qprobe AS (SELECT vec_id AS qid, ccid AS cell FROM (
                       SELECT vec_id, ccid, row_number() OVER (
                         PARTITION BY vec_id ORDER BY cdot DESC, ccid)
                         AS rn
                       FROM cd WHERE vec_id BETWEEN 0 AND 3) t, nc
                       WHERE rn <= np),
            resid AS MATERIALIZED (
              SELECT e.vec_id, e.dim, e.sub, e.q6 - cent.c6 AS r6
              FROM e
              JOIN assign ON assign.vec_id = e.vec_id
              JOIN cent ON cent.ccid = assign.cell
                AND cent.dim = e.dim),
            rcb0 AS MATERIALIZED (
              SELECT (vec_id - c) // s AS cw, dim, r6 AS rc6
              FROM resid, nc
              WHERE vec_id >= c AND (vec_id - c) % s = 0
                AND (vec_id - c) // s < 256),
            enc0 AS MATERIALIZED (
              SELECT vec_id, sub, cw AS code FROM (
                SELECT resid.vec_id, resid.sub, rcb0.cw,
                  row_number() OVER (
                    PARTITION BY resid.vec_id, resid.sub
                    ORDER BY SUM((resid.r6 - rcb0.rc6)
                      * (resid.r6 - rcb0.rc6)), rcb0.cw) AS rn
                FROM resid JOIN rcb0 ON resid.dim = rcb0.dim
                GROUP BY resid.vec_id, resid.sub, rcb0.cw) t
              WHERE rn = 1),
            upd0 AS (SELECT enc0.code AS cw, r.dim,
                      CAST((SUM(r.r6 + 4000000) + COUNT(*) // 2)
                        // COUNT(*) - 4000000 AS BIGINT) AS rc6t
                    FROM resid r
                    JOIN enc0 ON enc0.vec_id = r.vec_id
                      AND enc0.sub = r.sub
                    GROUP BY 1, 2),
            rcb1 AS MATERIALIZED (
              SELECT s.cw, s.dim, COALESCE(u.rc6t, s.rc6) AS rc6
              FROM rcb0 s LEFT JOIN upd0 u
                ON u.cw = s.cw AND u.dim = s.dim),
            enc1 AS MATERIALIZED (
              SELECT vec_id, sub, cw AS code FROM (
                SELECT resid.vec_id, resid.sub, rcb1.cw,
                  row_number() OVER (
                    PARTITION BY resid.vec_id, resid.sub
                    ORDER BY SUM((resid.r6 - rcb1.rc6)
                      * (resid.r6 - rcb1.rc6)), rcb1.cw) AS rn
                FROM resid JOIN rcb1 ON resid.dim = rcb1.dim
                GROUP BY resid.vec_id, resid.sub, rcb1.cw) t
              WHERE rn = 1),
            upd1 AS (SELECT enc1.code AS cw, r.dim,
                      CAST((SUM(r.r6 + 4000000) + COUNT(*) // 2)
                        // COUNT(*) - 4000000 AS BIGINT) AS rc6t
                    FROM resid r
                    JOIN enc1 ON enc1.vec_id = r.vec_id
                      AND enc1.sub = r.sub
                    GROUP BY 1, 2),
            rcb2 AS MATERIALIZED (
              SELECT s.cw, s.dim, COALESCE(u.rc6t, s.rc6) AS rc6
              FROM rcb1 s LEFT JOIN upd1 u
                ON u.cw = s.cw AND u.dim = s.dim),
            encd AS (SELECT vec_id, sub, cw AS code FROM (
                     SELECT resid.vec_id, resid.sub, rcb2.cw,
                       row_number() OVER (
                         PARTITION BY resid.vec_id, resid.sub
                         ORDER BY SUM((resid.r6 - rcb2.rc6)
                           * (resid.r6 - rcb2.rc6)), rcb2.cw) AS rn
                     FROM resid JOIN rcb2 ON resid.dim = rcb2.dim
                     GROUP BY resid.vec_id, resid.sub, rcb2.cw) t
                   WHERE rn = 1),
            qe AS (SELECT vec_id AS qid, dim, sub, q6 FROM e
                   WHERE vec_id BETWEEN 0 AND 3),
            qres AS (SELECT qprobe.qid, qprobe.cell, qe.dim, qe.sub,
                       qe.q6 - cent.c6 AS rq6
                     FROM qprobe
                     JOIN qe ON qe.qid = qprobe.qid
                     JOIN cent ON cent.ccid = qprobe.cell
                       AND cent.dim = qe.dim),
            adc AS (SELECT qres.qid, qres.cell, qres.sub, rcb2.cw,
                      CAST(SUM((qres.rq6 - rcb2.rc6)
                        * (qres.rq6 - rcb2.rc6)) AS BIGINT) AS d_qc
                    FROM qres JOIN rcb2 ON qres.dim = rcb2.dim
                    GROUP BY 1, 2, 3, 4),
            candv AS (SELECT qprobe.qid, qprobe.cell, assign.vec_id
                      FROM assign JOIN qprobe USING (cell)
                      WHERE assign.vec_id <> qprobe.qid),
            scored AS (SELECT c.qid, c.vec_id,
                      CAST(SUM(adc.d_qc) AS BIGINT) AS adc_i
                    FROM candv c
                    JOIN encd ON encd.vec_id = c.vec_id
                    JOIN adc ON adc.qid = c.qid AND adc.cell = c.cell
                      AND adc.sub = encd.sub AND adc.cw = encd.code
                    GROUP BY 1, 2),
            cand AS (SELECT qid, vec_id, adc_i FROM (
                     SELECT qid, vec_id, adc_i,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY adc_i, vec_id) AS crank
                     FROM scored) t, nc
                   WHERE crank <= greatest(100, nv // 128)),
            ex AS (SELECT cand.qid, cand.vec_id, cand.adc_i,
                      CAST(SUM((ev.q6 - qe.q6) * (ev.q6 - qe.q6))
                        AS BIGINT) AS true_i
                    FROM cand
                    JOIN e ev ON ev.vec_id = cand.vec_id
                    JOIN qe ON qe.qid = cand.qid AND qe.dim = ev.dim
                    GROUP BY 1, 2, 3),
            rk AS (SELECT qid, vec_id, adc_i, true_i,
                      CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY true_i, vec_id) AS BIGINT) AS rank
                    FROM ex)
         SELECT qid, rank, vec_id,
                round(CAST(adc_i AS DOUBLE) / 1e12, 6) AS adc_dist,
                round(CAST(true_i AS DOUBLE) / 1e12, 6) AS true_dist
         FROM rk WHERE rank <= 10 ORDER BY qid, rank""",

    "q_llm_ann_hnsw_bestfirst" -> {
      // 16 unrolled single-expansion rounds; every multi-referenced
      // CTE MATERIALIZED (the re-evaluation rule). A terminated query
      // (no unexpanded node within its 16th-best found) contributes
      // nothing to ba_t, so later rounds are exact no-ops for it.
      val rounds = (1 to 16).map { t =>
        s"""w$t AS (SELECT qid, MAX(dd) AS t16 FROM (
                  SELECT qid, dd, row_number() OVER (
                    PARTITION BY qid ORDER BY dd, vec_id) AS rn
                  FROM b${t - 1}) z WHERE rn <= 16 GROUP BY qid),
            ba$t AS MATERIALIZED (
              SELECT bb.qid, bb.vec_id FROM (
                SELECT qid, vec_id, dd, row_number() OVER (
                  PARTITION BY qid ORDER BY dd, vec_id) AS rn
                FROM b${t - 1} WHERE NOT exp) bb
              JOIN w$t w ON w.qid = bb.qid
              WHERE bb.rn = 1 AND bb.dd <= w.t16),
            nn$t AS (SELECT DISTINCT a.qid, ed.dst AS vec_id
                    FROM ba$t a JOIN edges ed ON ed.src = a.vec_id
                    WHERE NOT EXISTS (SELECT 1 FROM b${t - 1} b
                      WHERE b.qid = a.qid AND b.vec_id = ed.dst)),
            ns$t AS (SELECT c.qid, c.vec_id,
                      CAST(SUM((qd.q6 - ev.q6) * (qd.q6 - ev.q6))
                        AS BIGINT) AS dd
                    FROM nn$t c
                    JOIN e ev ON ev.vec_id = c.vec_id
                    JOIN qd ON qd.qid = c.qid AND qd.dim = ev.dim
                    GROUP BY 1, 2),
            b$t AS MATERIALIZED (
              SELECT b.qid, b.vec_id, b.dd,
                b.exp OR EXISTS (SELECT 1 FROM ba$t a
                  WHERE a.qid = b.qid AND a.vec_id = b.vec_id) AS exp
              FROM b${t - 1} b
              UNION ALL
              SELECT qid, vec_id, dd, FALSE AS exp FROM ns$t)"""
      }.mkString(",\n")
      s"""WITH x AS (SELECT vec_id, embedding,
                      unnest(generate_series(1, len(embedding))) AS dim
                    FROM embeddings),
            e AS MATERIALIZED (
              SELECT vec_id, dim,
                CAST(CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                     AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS q6
              FROM x),
            nc AS (SELECT CASE WHEN COUNT(*) <= 512 THEN 8
                        WHEN COUNT(*) <= 1024 THEN 16
                        WHEN COUNT(*) <= 2048 THEN 32
                        ELSE 64 END AS c
                   FROM embeddings),
            cent AS (SELECT vec_id AS ccid, dim, q6 AS c6
                     FROM e, nc WHERE vec_id < c),
            asg AS MATERIALIZED (
              SELECT vec_id, ccid AS cell FROM (
                SELECT e.vec_id, cent.ccid, row_number() OVER (
                  PARTITION BY e.vec_id
                  ORDER BY SUM(e.q6 * cent.c6) DESC, cent.ccid) AS rn
                FROM e JOIN cent ON e.dim = cent.dim
                GROUP BY e.vec_id, cent.ccid) t
              WHERE rn = 1),
            ee AS MATERIALIZED (
              SELECT e.vec_id, e.dim, e.q6, asg.cell
              FROM e JOIN asg USING (vec_id)),
            knn AS (SELECT src, dst FROM (
                    SELECT a.vec_id AS src, b.vec_id AS dst,
                      row_number() OVER (PARTITION BY a.vec_id
                        ORDER BY SUM((a.q6 - b.q6) * (a.q6 - b.q6)),
                          b.vec_id) AS rn
                    FROM ee a JOIN ee b ON a.cell = b.cell
                      AND a.dim = b.dim AND a.vec_id <> b.vec_id
                    GROUP BY a.vec_id, b.vec_id) t
                  WHERE rn <= 8),
            hub AS MATERIALIZED (
              SELECT cell, MIN(vec_id) AS h FROM asg GROUP BY cell),
            edges AS MATERIALIZED (
              SELECT src, dst FROM knn
              UNION
              SELECT asg.vec_id, hub.h FROM asg JOIN hub USING (cell)
              WHERE asg.vec_id <> hub.h
              UNION
              SELECT a.h, b.h FROM hub a, hub b WHERE a.h <> b.h),
            qd AS MATERIALIZED (
              SELECT vec_id AS qid, dim, q6 FROM e
              WHERE vec_id BETWEEN 0 AND 3),
            up AS (SELECT vec_id FROM asg WHERE vec_id % 16 = 0),
            b0 AS MATERIALIZED (
              SELECT qid, vec_id, dd, FALSE AS exp FROM (
                SELECT qid, vec_id, dd, row_number() OVER (
                  PARTITION BY qid ORDER BY dd, vec_id) AS rn
                FROM (SELECT qd.qid, up.vec_id,
                        CAST(SUM((qd.q6 - ev.q6) * (qd.q6 - ev.q6))
                          AS BIGINT) AS dd
                      FROM up
                      JOIN e ev ON ev.vec_id = up.vec_id
                      JOIN qd ON qd.dim = ev.dim
                      GROUP BY 1, 2) z) t
              WHERE rn = 1),
            $rounds
         SELECT qid, rank, vec_id,
                round(CAST(dd AS DOUBLE) / 1e12, 6) AS dist
         FROM (SELECT qid, vec_id, dd,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY dd, vec_id) AS BIGINT) AS rank
               FROM b16 WHERE vec_id <> qid) rk
         WHERE rank <= 10 ORDER BY qid, rank"""
    }
  )
}
