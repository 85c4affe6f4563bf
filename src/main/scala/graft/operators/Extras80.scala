package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 6: multimodal-pipeline plumbing round-out —
  * frame-level exact dedup (the video-dedup shape over the §2.10
  * synthetic payloads), modality routing with mapInPandas-style batch
  * accounting, long-common-prefix near-dup grouping, and per-source
  * length-outlier screening via the exact-integer MAD gate.
  *
  * Determinism contract (SURVEY §2.13): frame digests are md5 of byte
  * slices (ASCII corpus ⇒ byte slices == char slices, the §2.10
  * equivalence); modality tags and batch counts are pure integer
  * arithmetic; the outlier gate is the cross-multiplied integer
  * inequality |x − med|·10 > 25·MAD (z > 2.5 at the 0.1 quantum) —
  * exact order statistics, never an IEEE compare.
  */
object Extras80 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FRAME-LEVEL EXACT DEDUP — every 64-byte frame of every payload
    // hashed inside the partition kernel (no shuffle until the digest
    // agg), then the copy-count histogram: how much frame-level
    // redundancy would a content-addressed store reclaim? The fan-out
    // is partition-local (the q_llm_frames shape without sampling).
    "q_llm_frame_dedup" -> ((s, d) => {
      import s.implicits._
      val frames = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
        .as[Multimodal.DocPayload]
        .mapPartitions { rows =>
          val md = java.security.MessageDigest.getInstance("MD5")
          rows.flatMap { p =>
            val nFrames = (p.payload.length + 63) / 64
            (0 until nFrames).iterator.map { i =>
              val off = i * 64
              val len = math.min(64, p.payload.length - off)
              md.reset()
              md.digest(java.util.Arrays.copyOfRange(p.payload, off,
                off + len)).map("%02x".format(_)).mkString
            }
          }
        }
        .toDF("fdigest")
      frames.groupBy(col("fdigest")).agg(count(lit(1)).as("n_copies"))
        .groupBy(col("n_copies"))
        .agg(count(lit(1)).as("n_frame_groups"))
        .select(col("n_copies"), col("n_frame_groups"),
          (col("n_copies") * col("n_frame_groups")).as("n_frames"))
        .orderBy("n_copies")
    }),

    // MODALITY ROUTER — the dispatch stage of a mixed-media pipeline:
    // payloads route by a magic-byte modality tag (first byte mod 3 →
    // image/audio/video — the synthetic stand-in for real magic
    // numbers), and each modality reports the batch shapes its decode
    // stage would see under a 4 KiB mapInPandas batch budget:
    // Σ ceil(len/4096) batches, byte volume, max payload.
    "q_llm_modality_router" -> ((s, d) => {
      val n = length(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), n.cast("long").as("len"),
          element_at(map(lit(0), lit("image"), lit(1), lit("audio"),
            lit(2), lit("video")),
            (ascii(substring(col("text"), 1, 1)) % 3).cast("int"))
            .as("modality"))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("len")).as("total_bytes"),
          max(col("len")).as("max_payload"),
          sum(expr("(len + 4095) div 4096")).as("n_batches"))
        .orderBy("modality")
    }),

    // PREFIX NEAR-DUP GROUPS — documents sharing their first 10 tokens
    // verbatim (the mirror-page / scraped-template shape exact dedup
    // misses when tails differ): per duplicate group, the member count
    // and the keeper (smallest doc_id). Only groups with >= 2 docs
    // emit; the key is the PORTABLE md5 of the raw prefix.
    "q_llm_dedup_prefix" -> ((s, d) => {
      val ws = split(col("text"), " ")
      Tables.documents(s, d)
        .where(size(ws) >= 10)
        .select(col("doc_id"),
          md5long(concat_ws(" ", slice(ws, 1, 10))).as("hp"))
        .groupBy(col("hp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .where(col("n_docs") >= 2)
        .select(col("keeper"), col("n_docs"))
        .orderBy("keeper")
    }),

    // LENGTH OUTLIERS — per-source robust screen on n_chars: exact
    // integer median and MAD (lower-median positions, the q_agg_levene
    // discipline), then the INTEGER gate |x − med|·10 > 25·MAD
    // (robust z > 2.5 in 0.1 quanta). Emits per source: n, med, mad,
    // outlier count — the "too short / too long to be real text"
    // pipeline filter.
    "q_llm_length_outliers" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
      val wSrc = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      val med = docs
        .withColumn("rn", row_number().over(wSrc))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("source"), col("n_chars").as("med"))
      val withDev = docs.join(med, "source")
        .withColumn("dev", abs(col("n_chars") - col("med")))
      val wDev = Window.partitionBy(col("source"))
        .orderBy(col("dev"), col("doc_id"))
      val mad = withDev
        .withColumn("rn", row_number().over(wDev))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("source"), col("dev").as("mad"))
      withDev.join(mad, "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("med")).as("med_chars"),
          max(col("mad")).as("mad_chars"),
          sum(when(col("dev") * 10 > col("mad") * 25, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_frame_dedup" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS L
                    FROM documents),
            f AS (SELECT doc_id, text, L,
                         unnest(generate_series(0, (L + 63) // 64 - 1))
                           AS i
                  FROM t),
            dg AS (SELECT md5(substr(text, i * 64 + 1, 64)) AS fdigest
                   FROM f),
            cp AS (SELECT fdigest, CAST(COUNT(*) AS BIGINT) AS n_copies
                   FROM dg GROUP BY 1)
         SELECT n_copies, CAST(COUNT(*) AS BIGINT) AS n_frame_groups,
                CAST(n_copies * COUNT(*) AS BIGINT) AS n_frames
         FROM cp GROUP BY 1 ORDER BY 1""",

    "q_llm_modality_router" ->
      """WITH t AS (SELECT doc_id,
                    CAST(length(text) AS BIGINT) AS len,
                    CASE ascii(substr(text, 1, 1)) % 3
                      WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                      ELSE 'video' END AS modality
                 FROM documents)
         SELECT modality, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(len) AS BIGINT) AS total_bytes,
                CAST(MAX(len) AS BIGINT) AS max_payload,
                CAST(SUM((len + 4095) // 4096) AS BIGINT) AS n_batches
         FROM t GROUP BY 1 ORDER BY 1""",

    "q_llm_dedup_prefix" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents
                    WHERE len(string_split(text, ' ')) >= 10),
            p AS (SELECT doc_id,
                    CAST(('0x' || substr(md5(
                      array_to_string(ws[1:10], ' ')), 1, 15)) AS BIGINT)
                      AS hp
                  FROM w),
            g AS (SELECT hp, CAST(COUNT(*) AS BIGINT) AS n_docs,
                    MIN(doc_id) AS keeper
                  FROM p GROUP BY 1)
         SELECT keeper, n_docs FROM g WHERE n_docs >= 2
         ORDER BY keeper""",

    "q_llm_length_outliers" ->
      """WITH docs AS (SELECT source, doc_id, n_chars FROM documents),
            med AS (SELECT source, n_chars AS med
                    FROM (SELECT source, n_chars,
                            row_number() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS rn,
                            COUNT(*) OVER (PARTITION BY source) AS n
                          FROM docs)
                    WHERE rn = (n + 1) // 2),
            dv AS (SELECT d.source, d.doc_id,
                     abs(d.n_chars - m.med) AS dev, m.med
                   FROM docs d JOIN med m ON m.source = d.source),
            mad AS (SELECT source, dev AS mad
                    FROM (SELECT source, dev,
                            row_number() OVER (PARTITION BY source
                              ORDER BY dev, doc_id) AS rn,
                            COUNT(*) OVER (PARTITION BY source) AS n
                          FROM dv)
                    WHERE rn = (n + 1) // 2)
         SELECT dv.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(MAX(dv.med) AS BIGINT) AS med_chars,
                CAST(MAX(mad.mad) AS BIGINT) AS mad_chars,
                CAST(SUM(CASE WHEN dv.dev * 10 > mad.mad * 25
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM dv JOIN mad ON mad.source = dv.source
         GROUP BY dv.source ORDER BY dv.source"""
  )
}
