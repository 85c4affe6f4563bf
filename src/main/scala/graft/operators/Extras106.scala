package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 additions, part 32: retrieval-quality round-out over the
  * embeddings table — MMR (maximal marginal relevance) re-ranking of
  * the top-20 cosine candidates, reciprocal-rank fusion of two query
  * rankings, and nDCG@10 of the cosine ranking against same-label
  * relevance.
  *
  * Scale shape: every operator starts from the corpus-linear scored
  * scan (the codegen'd integer-dot kernel from q_llm_sim_topk) and a
  * top-k TakeOrdered; the MMR greedy then runs on the BOUNDED 20-row
  * candidate set (one 20×20 integer sim matrix — candidate-bounded,
  * never corpus-bounded). RRF/nDCG are rank windows over the same
  * top-k relations.
  *
  * Determinism contract (SURVEY §2.13): all similarity is the exact
  * 1e-6-quantized integer dot; the MMR greedy compares the EXACT
  * integer objective 7·rel − 3·maxsim (λ=0.7 as an integer fraction)
  * with first-max (= lowest vec_id) tiebreak mirrored in the oracle's
  * list_position; nDCG gain terms are nano-quantized before the
  * bounded fold.
  */
object Extras106 {
  import graft.Det._

  private def q6v(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1e6).cast("long"))

  private def dot(a: Column, b: Column): Column =
    graft.functions.LongArrayDot.longDot(a, b)

  /** Top-20 candidates by integer dot to query vector `qid`, with their
    * quantized vectors. */
  private def cands(s: SparkSession, d: String, qid: Int): DataFrame = {
    val q = Tables.embeddings(s, d).where(col("vec_id") === qid)
      .select(q6v(col("embedding")).as("qe"))
    Tables.embeddings(s, d).where(col("vec_id") =!= qid)
      .select(col("vec_id"), q6v(col("embedding")).as("ve"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), dot(col("ve"), col("qe")).as("rel"),
        col("ve"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MMR — greedy diversified re-rank of the top-20 cosine candidates
    // for query vec 0: pick 10 maximizing 0.7·rel − 0.3·max-sim-to-
    // selected, all in exact integer dot units.
    "q_llm_mmr" -> ((s, d) => {
      import s.implicits._
      val NegInf = -4611686018427387904L
      val packed = cands(s, d, 0)
        .select(struct(col("vec_id"), col("rel"), col("ve")).as("c"))
        .agg(sort_array(collect_list(col("c"))).as("cs"))
        .select(expr("transform(cs, x -> x.vec_id)").as("ids"),
          expr("transform(cs, x -> x.rel)").as("rels"),
          expr("transform(cs, x -> x.ve)").as("vecs"))
      packed.as[(Seq[Long], Seq[Long], Seq[Seq[Long]])]
        .flatMap { case (ids, rels, vecs) =>
          val n = ids.length
          val vs = vecs.map(_.toArray).toArray
          def dd(i: Int, j: Int): Long = {
            var s0 = 0L; var k = 0
            while (k < vs(i).length) { s0 += vs(i)(k) * vs(j)(k); k += 1 }
            s0
          }
          val sims = Array.tabulate(n, n)(dd)
          val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long)]
          var step = 1
          while (step <= 10 && step <= n) {
            var bi = -1; var bs = Long.MinValue
            var i = 0
            while (i < n) {
              val sc =
                if (sel.contains(i)) NegInf
                else {
                  val ms = if (sel.isEmpty) 0L
                    else sel.map(j => sims(i)(j)).max
                  7 * rels(i) - 3 * ms
                }
              if (sc > bs) { bs = sc; bi = i }
              i += 1
            }
            sel += bi
            out += ((step.toLong, ids(bi), bs))
            step += 1
          }
          out.iterator
        }
        .toDF("rank", "vec_id", "score_int")
        .select(col("rank"), col("vec_id"),
          r6(col("score_int").cast("double") / 1e13).as("mmr_score"))
        .orderBy(col("rank"))
    }),

    // RECIPROCAL RANK FUSION — fuse the cosine rankings for query
    // vectors 0 and 1 (k=60): RRF = Σ 1/(60+rankᵢ); top-10 by fused
    // score.
    "q_llm_rrf" -> ((s, d) => {
      def ranked(qid: Int, rname: String): DataFrame = {
        val q = Tables.embeddings(s, d).where(col("vec_id") === qid)
          .select(q6v(col("embedding")).as("qe"))
        val w = Window.orderBy(col("dot").desc, col("vec_id"))
        Tables.embeddings(s, d)
          .where(col("vec_id") =!= 0 && col("vec_id") =!= 1)
          .select(col("vec_id"), q6v(col("embedding")).as("ve"))
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dot(col("ve"), col("qe")).as("dot"))
          .withColumn(rname, row_number().over(w).cast("long"))
          .select(col("vec_id"), col(rname))
      }
      ranked(0, "r1").join(ranked(1, "r2"), "vec_id")
        .select(col("vec_id"), col("r1"), col("r2"),
          r6(lit(1.0) / (col("r1") + 60).cast("double")
            + lit(1.0) / (col("r2") + 60).cast("double")).as("rrf"))
        .orderBy(col("rrf").desc, col("vec_id"))
        .limit(10)
    }),

    // NDCG@10 — the cosine ranking for query vec 0 scored against
    // same-label binary relevance; gains nano-quantized before the
    // bounded position fold.
    "q_llm_ndcg" -> ((s, d) => {
      val qrow = Tables.embeddings(s, d).where(col("vec_id") === 0)
        .select(q6v(col("embedding")).as("qe"), col("label").as("qlabel"))
      val w = Window.orderBy(col("dot").desc, col("vec_id"))
      val scored = Tables.embeddings(s, d).where(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), q6v(col("embedding")).as("ve"))
        .crossJoin(broadcast(qrow))
        .select(col("vec_id"),
          (col("label") === col("qlabel")).cast("long").as("rel"),
          dot(col("ve"), col("qe")).as("dot"))
        .withColumn("pos", row_number().over(w).cast("long"))
      val dcg = scored.where(col("pos") <= 10)
        .select(round(col("rel").cast("double") /
          log2(col("pos").cast("double") + 1) * 1e9).cast("long")
          .as("g_nano"))
        .agg(sum(col("g_nano")).as("dcg_nano"))
      val relTot = scored.agg(sum(col("rel")).as("n_relevant"))
      val ideal = scored
        .withColumn("ipos",
          row_number().over(Window.orderBy(col("rel").desc,
            col("vec_id"))).cast("long"))
        .where(col("ipos") <= 10 && col("rel") === 1)
        .select(round(lit(1.0) /
          log2(col("ipos").cast("double") + 1) * 1e9).cast("long")
          .as("g_nano"))
        .agg(sum(col("g_nano")).as("idcg_nano"))
      dcg.crossJoin(broadcast(relTot)).crossJoin(broadcast(ideal))
        .select(col("n_relevant"),
          r6(col("dcg_nano").cast("double") / 1e9).as("dcg10"),
          r6(col("idcg_nano").cast("double") / 1e9).as("idcg10"),
          r6(col("dcg_nano").cast("double") /
            col("idcg_nano").cast("double")).as("ndcg10"))
    })
  )

  /** Integer dot between two embedding columns e/qe at 1e-6 quant. */
  private val duckDot =
    """SUM(CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT) *
           CAST(round(CAST(qe[i] AS DOUBLE) * 1000000) AS BIGINT))"""

  private val candsSql =
    s"""q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       x AS (SELECT vec_id, embedding AS e FROM embeddings
             WHERE vec_id <> 0),
       u AS (SELECT vec_id, e, qe,
               unnest(generate_series(1, len(e))) AS i FROM x, q),
       sc AS (SELECT vec_id, $duckDot AS rel FROM u GROUP BY vec_id),
       cands AS (SELECT sc.vec_id, sc.rel, em.embedding AS e
                 FROM sc JOIN embeddings em ON em.vec_id = sc.vec_id
                 ORDER BY sc.rel DESC, sc.vec_id LIMIT 20)"""

  val oracle: Map[String, String] = Map(

    "q_llm_mmr" ->
      s"""WITH RECURSIVE $candsSql,
            pd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                     SUM(CAST(round(CAST(a.e[a.ai] AS DOUBLE) * 1000000)
                         AS BIGINT)
                       * CAST(round(CAST(b.e[a.ai] AS DOUBLE) * 1000000)
                         AS BIGINT)) AS d
                   FROM (SELECT vec_id, e,
                           unnest(generate_series(1, len(e))) AS ai
                         FROM cands) a
                   JOIN (SELECT vec_id, e,
                           unnest(generate_series(1, len(e))) AS bi
                         FROM cands) b
                     ON b.bi = a.ai
                   GROUP BY 1, 2),
            rows_ AS (SELECT vec_id, rel,
                        row_number() OVER (ORDER BY vec_id) AS idx
                      FROM cands),
            ids AS (SELECT list(vec_id ORDER BY vec_id) AS ids,
                      list(rel ORDER BY vec_id) AS rels
                    FROM rows_),
            smat AS (SELECT list(rowl ORDER BY ia) AS sims
                     FROM (SELECT ia, list(d ORDER BY ib) AS rowl
                           FROM pd GROUP BY ia)),
            r AS (
              SELECT CAST(0 AS BIGINT) AS k,
                     CAST([] AS INT[]) AS sel,
                     CAST(NULL AS BIGINT) AS pick_id,
                     CAST(NULL AS BIGINT) AS pick_score,
                     ids, rels, sims
              FROM ids, smat
              UNION ALL
              SELECT k + 1,
                     sel || [CAST(list_position(scr, list_max(scr))
                       AS INT)],
                     ids[list_position(scr, list_max(scr))],
                     list_max(scr),
                     ids, rels, sims
              FROM (SELECT k, sel, ids, rels, sims,
                      list_transform(range(1, 21), i ->
                        CASE WHEN list_contains(sel, CAST(i AS INT))
                          THEN -4611686018427387904
                          ELSE 7 * rels[CAST(i AS INT)]
                            - 3 * (CASE WHEN len(sel) = 0 THEN 0
                                ELSE list_max(list_transform(sel, j ->
                                  sims[CAST(i AS INT)][j])) END)
                          END) AS scr
                    FROM r WHERE k < 10) t)
         SELECT k AS rank, pick_id AS vec_id,
                round(CAST(pick_score AS DOUBLE) / 1e13, 6) AS mmr_score
         FROM r WHERE pick_id IS NOT NULL ORDER BY k""",

    "q_llm_rrf" ->
      s"""WITH q0 AS (SELECT embedding AS qe FROM embeddings
                 WHERE vec_id = 0),
            q1 AS (SELECT embedding AS qe FROM embeddings
                   WHERE vec_id = 1),
            x AS (SELECT vec_id, embedding AS e FROM embeddings
                  WHERE vec_id NOT IN (0, 1)),
            u0 AS (SELECT vec_id, e, qe,
                     unnest(generate_series(1, len(e))) AS i FROM x, q0),
            s0 AS (SELECT vec_id, $duckDot AS dot FROM u0
                   GROUP BY vec_id),
            u1 AS (SELECT vec_id, e, qe,
                     unnest(generate_series(1, len(e))) AS i FROM x, q1),
            s1 AS (SELECT vec_id, $duckDot AS dot FROM u1
                   GROUP BY vec_id),
            r0 AS (SELECT vec_id,
                     CAST(row_number() OVER (ORDER BY dot DESC, vec_id)
                       AS BIGINT) AS r1
                   FROM s0),
            r1t AS (SELECT vec_id,
                     CAST(row_number() OVER (ORDER BY dot DESC, vec_id)
                       AS BIGINT) AS r2
                   FROM s1)
         SELECT vec_id, r1, r2,
                round(1.0 / CAST(r1 + 60 AS DOUBLE)
                  + 1.0 / CAST(r2 + 60 AS DOUBLE), 6) AS rrf
         FROM r0 JOIN r1t USING (vec_id)
         ORDER BY rrf DESC, vec_id LIMIT 10""",

    "q_llm_ndcg" ->
      s"""WITH q AS (SELECT embedding AS qe, label AS qlabel
                 FROM embeddings WHERE vec_id = 0),
            x AS (SELECT vec_id, label, embedding AS e FROM embeddings
                  WHERE vec_id <> 0),
            u AS (SELECT vec_id, label, e, qe, qlabel,
                    unnest(generate_series(1, len(e))) AS i FROM x, q),
            s AS (SELECT vec_id,
                    CAST(MAX(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                      AS BIGINT) AS rel,
                    $duckDot AS dot
                  FROM u GROUP BY vec_id, label, qlabel),
            p AS (SELECT vec_id, rel,
                    CAST(row_number() OVER (ORDER BY dot DESC, vec_id)
                      AS BIGINT) AS pos
                  FROM s),
            dcg AS (SELECT CAST(SUM(CAST(round(CAST(rel AS DOUBLE)
                      / log2(CAST(pos AS DOUBLE) + 1) * 1e9) AS BIGINT))
                      AS BIGINT) AS dcg_nano
                    FROM p WHERE pos <= 10),
            rt AS (SELECT CAST(SUM(rel) AS BIGINT) AS n_relevant FROM p),
            ip AS (SELECT rel,
                     CAST(row_number() OVER (ORDER BY rel DESC, vec_id)
                       AS BIGINT) AS ipos
                   FROM p),
            idcg AS (SELECT CAST(SUM(CAST(round(1.0
                      / log2(CAST(ipos AS DOUBLE) + 1) * 1e9) AS BIGINT))
                      AS BIGINT) AS idcg_nano
                     FROM ip WHERE ipos <= 10 AND rel = 1)
         SELECT n_relevant,
                round(CAST(dcg_nano AS DOUBLE) / 1e9, 6) AS dcg10,
                round(CAST(idcg_nano AS DOUBLE) / 1e9, 6) AS idcg10,
                round(CAST(dcg_nano AS DOUBLE) / CAST(idcg_nano AS DOUBLE),
                  6) AS ndcg10
         FROM dcg, rt, idcg"""
  )
}
