package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 61: the embedding-standardization audit
  * (per-dimension z-scoring — the whitening-lite preprocessing every
  * ANN index assumes, verified by the norm identities), the k-means
  * elbow sweep (inertia at k = 2..6 over anchor centroids — the
  * model-selection number q_llm_kmeans/kmeans_iter assume given), and
  * per-label margin separability (nearest-other-centroid gap over
  * within-label spread — the "are these labels even clusterable?"
  * audit behind q_llm_cluster_purity).
  *
  * Scale shape: standardize is two corpus passes (dim stats, then
  * per-vector fold); elbow joins the exploded embedding to a 6-row
  * broadcast anchor codebook then a 5-row broadcast k spine (argmin
  * per (vec, k)); label_margin joins per-dim label centroids
  * (10×64 broadcast) back to vectors, plus a 10×10 centroid pair
  * relation.
  *
  * Determinism contract (SURVEY §2.13): components ride the
  * DECIMAL(18,6) quantization; dim means/sds come from exact decimal
  * moments; per-row z and z² are nano-quantized before vector and
  * corpus folds; label centroids are rounded to 6-dp DECIMAL before
  * ANY distance (both engines share the rounding boundary — the
  * "round first" rule); every argmin ties on the id.
  */
object Extras135 {
  import Det._

  private val Big = DecimalType(38, 0)
  private val D6 = DecimalType(18, 6)

  private def comps(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")))
      .toDF("vec_id", "label", "pos", "x")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        (col("pos") + 1).as("dim"),
        round(col("x").cast("double"), 6).cast(D6).as("q"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STANDARDIZATION AUDIT — z = (q − μ_d)/σ_d per dimension; the
    // post-z norms must average ≈ n_dims and the corpus z mean ≈ 0.
    "q_llm_embed_standardize" -> ((s, d) => {
      val e = comps(s, d)
      val dims = e.groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
          sum(col("q") * col("q")).as("sqq"))
        .select(col("dim"),
          (col("sq").cast("double") / col("n").cast("double")).as("mu"),
          sqrt((col("n").cast("double") * col("sqq").cast("double")
            - col("sq").cast("double") * col("sq").cast("double")) /
            (col("n").cast("double")
              * (col("n").cast("double") - 1))).as("sd"))
      val z = e.join(broadcast(dims), "dim")
        .withColumn("z", (col("q").cast("double") - col("mu"))
          / col("sd"))
        .withColumn("z_nano", round(col("z") * lit(1e9)).cast("long"))
        .withColumn("zz_nano",
          round(col("z") * col("z") * lit(1e9)).cast("long"))
      val perVec = z.groupBy(col("vec_id"))
        .agg(count(lit(1)).as("dims"),
          sum(col("zz_nano")).as("norm2_nano"))
      perVec
        .agg(count(lit(1)).as("n_vecs"), max(col("dims")).as("n_dims"),
          sum(col("norm2_nano")).as("tot_nano"),
          max(col("norm2_nano")).as("max_nano"))
        .select(col("n_vecs"), col("n_dims"),
          r6(col("tot_nano").cast("double") / lit(1e9)
            / col("n_vecs").cast("double")).as("avg_std_norm2"),
          r6(col("max_nano").cast("double") / lit(1e9))
            .as("max_std_norm2"))
    }),

    // ELBOW SWEEP — inertia at k = 2..6 with anchor centroids
    // (vec_id 0..k−1): where marginal inertia stops dropping is k*.
    "q_llm_kmeans_elbow" -> ((s, d) => {
      val e = comps(s, d).drop("label")
      val cb = e.where(col("vec_id") < 6)
        .select(col("vec_id").as("c"), col("dim"), col("q").as("cv"))
      val diff = (col("q") - col("cv")).cast(DecimalType(7, 6))
      val dist = e.join(broadcast(cb), "dim")
        .groupBy(col("vec_id"), col("c"))
        .agg(sum(diff * diff).as("d2"))
      val ks = s.range(2, 7).select(col("id").as("k"))
      val perK = dist.crossJoin(broadcast(ks))
        .where(col("c") < col("k"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k"), col("vec_id"))
            .orderBy(col("d2"), col("c"))))
        .where(col("rn") === 1)
      perK.groupBy(col("k"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("d2")).cast("double").as("inertia"))
        .select(col("k"), col("n_vecs"), r6(col("inertia"))
          .as("inertia"))
        .orderBy(col("k"))
    }),

    // LABEL MARGIN — per label: within-label spread vs the gap to the
    // nearest other label centroid (rounded-first centroids).
    "q_llm_label_margin" -> ((s, d) => {
      val e = comps(s, d)
      val cent = e.groupBy(col("label"), col("dim"))
        .agg(round(sum(col("q")).cast("double")
          / count(lit(1)).cast("double"), 6).cast(D6).as("cv"))
      val within = e.join(broadcast(cent), Seq("label", "dim"))
        .withColumn("dd", ((col("q") - col("cv")).cast(DecimalType(7, 6))
          * (col("q") - col("cv")).cast(DecimalType(7, 6))))
        .groupBy(col("label"), col("vec_id"))
        .agg(sum(col("dd")).as("d2"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("d2")).cast("double").as("sum_d2"))
        .select(col("label"), col("n_vecs"),
          (col("sum_d2") / col("n_vecs").cast("double"))
            .as("avg_within"))
      val pairGap = cent.as("a")
        .join(broadcast(cent.select(col("label").as("l2"), col("dim"),
          col("cv").as("cv2"))), "dim")
        .where(col("label") =!= col("l2"))
        .groupBy(col("label"), col("l2"))
        .agg(sum(((col("cv") - col("cv2")).cast(DecimalType(7, 6))
          * (col("cv") - col("cv2")).cast(DecimalType(7, 6))))
          .as("gap2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("label"))
            .orderBy(col("gap2"), col("l2"))))
        .where(col("rn") === 1)
        .select(col("label"), col("l2").as("nearest_label"),
          col("gap2").cast("double").as("gap2"))
      within.join(broadcast(pairGap), "label")
        .select(col("label"), col("n_vecs"),
          r6(col("avg_within")).as("avg_within_d2"),
          col("nearest_label"), r6(col("gap2")).as("nearest_gap2"),
          r6(col("gap2") / col("avg_within")).as("margin_ratio"))
        .orderBy(col("label"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_embed_standardize" ->
      """WITH x AS (SELECT vec_id, embedding,
                      unnest(generate_series(1, len(embedding))) AS dim
                    FROM embeddings),
            e AS (SELECT vec_id, dim,
                    CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                         AS DECIMAL(18,6)) AS q
                  FROM x),
            dims AS (SELECT dim,
                    CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                      AS mu,
                    sqrt((CAST(COUNT(*) AS DOUBLE)
                        * CAST(SUM(q * q) AS DOUBLE)
                      - CAST(SUM(q) AS DOUBLE) * CAST(SUM(q) AS DOUBLE))
                      / (CAST(COUNT(*) AS DOUBLE)
                        * (CAST(COUNT(*) AS DOUBLE) - 1))) AS sd
                  FROM e GROUP BY 1),
            z AS (SELECT e.vec_id,
                    CAST(round((CAST(e.q AS DOUBLE) - dims.mu) / dims.sd
                      * (CAST(e.q AS DOUBLE) - dims.mu) / dims.sd
                      * 1e9) AS BIGINT) AS zz_nano
                  FROM e JOIN dims ON e.dim = dims.dim),
            pv AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS dims,
                    CAST(SUM(zz_nano) AS BIGINT) AS norm2_nano
                  FROM z GROUP BY 1)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
                MAX(dims) AS n_dims,
                round(CAST(SUM(norm2_nano) AS DOUBLE) / 1e9
                  / CAST(COUNT(*) AS DOUBLE), 6) AS avg_std_norm2,
                round(CAST(MAX(norm2_nano) AS DOUBLE) / 1e9, 6)
                  AS max_std_norm2
         FROM pv""",

    "q_llm_kmeans_elbow" ->
      """WITH x AS (SELECT vec_id, embedding,
                      unnest(generate_series(1, len(embedding))) AS dim
                    FROM embeddings),
            e AS (SELECT vec_id, dim,
                    CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                         AS DECIMAL(18,6)) AS q
                  FROM x),
            cb AS (SELECT vec_id AS c, dim, q AS cv FROM e
                   WHERE vec_id < 6),
            dist AS (SELECT e.vec_id, cb.c,
                    SUM(CAST(e.q - cb.cv AS DECIMAL(7,6))
                      * CAST(e.q - cb.cv AS DECIMAL(7,6))) AS d2
                  FROM e JOIN cb ON e.dim = cb.dim GROUP BY 1, 2),
            ks AS (SELECT CAST(unnest(generate_series(2, 6)) AS BIGINT)
                     AS k),
            best AS (SELECT k, vec_id, d2 FROM (
                     SELECT ks.k, dist.vec_id, dist.d2,
                       row_number() OVER (PARTITION BY ks.k, dist.vec_id
                         ORDER BY dist.d2, dist.c) AS rn
                     FROM dist, ks WHERE dist.c < ks.k) t
                   WHERE rn = 1)
         SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                round(CAST(SUM(d2) AS DOUBLE), 6) AS inertia
         FROM best GROUP BY 1 ORDER BY k""",

    "q_llm_label_margin" ->
      """WITH x AS (SELECT vec_id, label, embedding,
                      unnest(generate_series(1, len(embedding))) AS dim
                    FROM embeddings),
            e AS (SELECT vec_id, CAST(label AS BIGINT) AS label, dim,
                    CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                         AS DECIMAL(18,6)) AS q
                  FROM x),
            cent AS (SELECT label, dim,
                    CAST(round(CAST(SUM(q) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6))
                      AS cv
                  FROM e GROUP BY 1, 2),
            wv AS (SELECT e.label, e.vec_id,
                    SUM(CAST(e.q - c.cv AS DECIMAL(7,6))
                      * CAST(e.q - c.cv AS DECIMAL(7,6))) AS d2
                  FROM e JOIN cent c
                    ON e.label = c.label AND e.dim = c.dim
                  GROUP BY 1, 2),
            within AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                    CAST(SUM(d2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                      AS avg_within
                  FROM wv GROUP BY 1),
            gap AS (SELECT label, l2 AS nearest_label,
                    CAST(gap2 AS DOUBLE) AS gap2 FROM (
                    SELECT a.label, b.label AS l2,
                      SUM(CAST(a.cv - b.cv AS DECIMAL(7,6))
                        * CAST(a.cv - b.cv AS DECIMAL(7,6))) AS gap2,
                      row_number() OVER (PARTITION BY a.label
                        ORDER BY SUM(CAST(a.cv - b.cv AS DECIMAL(7,6))
                          * CAST(a.cv - b.cv AS DECIMAL(7,6))),
                          b.label) AS rn
                    FROM cent a JOIN cent b
                      ON a.dim = b.dim AND a.label <> b.label
                    GROUP BY a.label, b.label) t
                  WHERE rn = 1)
         SELECT w.label, w.n_vecs,
                round(w.avg_within, 6) AS avg_within_d2,
                g.nearest_label, round(g.gap2, 6) AS nearest_gap2,
                round(g.gap2 / w.avg_within, 6) AS margin_ratio
         FROM within w JOIN gap g ON w.label = g.label
         ORDER BY w.label"""
  )
}
