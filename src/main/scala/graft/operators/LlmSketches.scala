package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.LongArrayDot.longDot

/** Sketch-based LLM operators — the sub-quadratic scale paths promised in
  * LlmOps' scale notes, each still fully deterministic and DuckDB-oracle
  * checkable (fixed seeds, portable md5-derived hashes):
  *
  *  - MinHash + LSH banding (16 hashes, 4 bands × 4 rows): candidate pairs
  *    come from banded signature buckets (an equi-join on band keys), then
  *    are exact-verified. At 100 TB this replaces the all-pairs shingle
  *    join with |candidates| ≈ |true near-dups|; both engines compute the
  *    identical pipeline, so approximation ≠ nondeterminism.
  *  - SimHash: 60-bit sign-aggregated word-hash signature per document;
  *    near-dup candidates are pairs within a small Hamming radius.
  *  - IVF ANN: a fixed 8-vector codebook partitions the embedding space;
  *    search touches only the query's cell — the partition-pruning contract
  *    an IVF index provides at scale.
  */
object LlmSketches {
  type Q = (SparkSession, String) => DataFrame

  import graft.Det.md5long

  /** Single-plane-flip probe masks shared by both hyperplane-LSH queries
    * (identity + one flip per plane). */
  private val ProbeMasks: Seq[Int] = Seq(0, 1, 2, 4, 8)

  /** ONE definition of the hyperplane sign-bucket assignment, shared by
    * the ANN search and the embedding near-dup queries (the DuckDB twins
    * share the matching CTE prefix, `lshBucketCte`): quantized embedding
    * plus its 4-plane 16-bucket signature. */
  /** LSH-candidate embedding near-dup pairs (cosine ≥ 0.35 after the
    * single-plane-flip probe join) — shared by q_llm_dedup_embed_lsh and
    * the semantic-cluster op. */
  private def embedNearPairs(s: SparkSession, d: String): DataFrame = {
    val emb = hyperplaneBucketed(s, d)
    val probed = emb.select(col("vec_id"), col("qe"),
      explode(array(ProbeMasks.map(m =>
        col("bkt").bitwiseXOR(lit(m))): _*)).as("pb"))
    // Round 17 (§2.5): the bucket key space is 2⁴ = 16 values, so a hash
    // join on it caps parallelism at 16 skewed partitions — and the
    // probe side arrives as ONE scan partition, serializing the
    // ~(5/16)·n² candidate expansion. Broadcasting the bucketed side
    // (the production IVF/LSH probe shape: index broadcast, probes
    // streamed) and round-robin repartitioning the STREAMED probe side
    // at core parallelism spreads the expansion; candidates, scores and
    // the ≥ 0.35 cut are unchanged.
    probed.repartition(s.sparkContext.defaultParallelism).as("a")
      .join(broadcast(emb).as("b"),
        col("a.pb") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        (longDot(col("a.qe"), col("b.qe")).cast("double") / 1e12).as("score"))
      .where(col("score") >= 0.35)
  }

  private def hyperplaneBucketed(s: SparkSession, d: String): DataFrame = {
    val planes: Seq[Column] = (0 until 4).map { j =>
      typedlit((0 until 64).map(i => md5Long15(s"${j}_$i") % 2001 - 1000).toArray)
    }
    val bucket = (0 until 4).map(j =>
      when(longDot(col("qe"), planes(j)) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
    Tables.embeddings(s, d)
      .select(col("vec_id"), q6v(col("embedding")).as("qe"))
      .withColumn("bkt", bucket)
  }

  /** Driver-side twin of md5long for CONSTANT codebooks (LSH hyperplanes):
    * first 15 md5 hex chars as a 60-bit integer — identical to the SQL
    * formula in both engines, so plan constants match the oracle's. */
  private def md5Long15(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(dig.map("%02x".format(_)).mkString.take(15), 16)
  }

  private def words(c: Column): Column = split(c, " ")

  private def q6v(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1e6).cast("long"))

  private val duckDot =
    """SUM(CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT) *
           CAST(round(CAST(qe[i] AS DOUBLE) * 1000000) AS BIGINT))"""

  val queries: Map[String, Q] = Map(
    // MinHash signatures → LSH bands → candidates → exact verify >= 0.6.
    // One md5 per shingle; the 16 hash functions are a universal family
    // h_j(x) = ((2j+1)·x + 12345j) mod p over the base hash — 16 codegen'd
    // MIN aggregates in a single groupBy pass (the earlier per-seed-md5
    // HOF formulation cost 27 s at sf0.1; this runs in ~2 s).
    "q_llm_dedup_minhash" -> ((s, d) => {
      val p = 2147483647L
      val rows = LlmOps.shingleTrips(s, d)
      val hm = rows.select(col("doc_id"), (md5long(col("s0")) % p).as("h"))
      val minCols = (0 until 16).map(j =>
        min((lit(2L * j + 1) * col("h") + lit(12345L * j)) % p).as(s"mh$j"))
      val sig = hm.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      val bandStructs = (0 until 4).map(b =>
        struct(lit(b).as("b"),
          concat_ws(",", (0 until 4).map(r => col(s"mh${b * 4 + r}").cast("string")): _*)
            .as("bk")))
      val bands = sig.select(col("doc_id"),
          explode(array(bandStructs: _*)).as("x"))
        .select(col("doc_id"), col("x.b").as("b"), col("x.bk").as("bk"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bk") === col("y.bk")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // Exact verification on the candidate set only. The per-doc shingle
      // counts ride on the rows (shingleTrips), so no count aggregation
      // or size joins — two fewer shuffles, one fewer kernel pass.
      // Join on the RAW shingle string, matching the oracle's a.s = b.s
      // (round-10 advice: a 64-bit hash key admits Spark-only collisions
      // the oracle can't see — same parity rule as Extras48/Extras53).
      val ex = rows.select(col("doc_id"), col("s0").as("s"), col("nsh"))
      cand
        .join(ex.as("a"), col("a.doc_id") === col("doc_a"))
        .join(ex.as("b"), col("b.doc_id") === col("doc_b") && col("a.s") === col("b.s"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"),
          min(col("a.nsh")).cast("long").as("na"),
          min(col("b.nsh")).cast("long").as("nb"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard") >= 0.6)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // 60-bit SimHash signature per document (word multiset, sign-sum
    // bits) — ONE typed-aggregator pass (graft.functions.SimHashAgg)
    // instead of exploding each word hash into 60 (hash, bit) rows
    // (which materialized ~30M intermediate rows at sf0.1). The oracle
    // still runs the exploded formulation; both are the same function of
    // the word-hash multiset, so they hash-match.
    "q_llm_simhash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
        .select(col("doc_id"), md5long(col("w")).as("h"))
        .groupBy(col("doc_id"))
        .agg(graft.functions.SimHashAgg.simhash(col("h")).as("simhash"))
        .orderBy("doc_id")),

    // SimHash near-pairs via Hamming-LSH banding — the sub-quadratic
    // scale path: split the 60-bit signature into 7 covering bands (sizes
    // 8-9 bits); by pigeonhole, any pair within Hamming radius 6 agrees
    // EXACTLY on at least one band, so candidates come from a band
    // equi-join instead of the all-pairs cross join, then the true
    // distance is re-checked — a LOSSLESS rewrite at its radius (the
    // oracle is the all-pairs statement). The radius is tighter than
    // q_llm_simhash_pairs' 10 on purpose: banding efficiency scales with
    // radius/bits, and r=10 over 60 bits is loose enough that 11+ narrow
    // bands collide almost as much as the cross join (measured).
    "q_llm_simhash_lsh" -> ((s, d) => {
      val sig = queries("q_llm_simhash")(s, d)
      // Band b covers bits [60b/7, 60(b+1)/7) — 7 bands, jointly exact.
      val bandCols = (0 until 7).map { b =>
        val lo = 60 * b / 7
        val width = 60 * (b + 1) / 7 - lo
        struct(lit(b).as("b"),
          expr(s"(simhash >> $lo) & ${(1L << width) - 1}").as("bits"))
      }
      val bands = sig.select(col("doc_id"), col("simhash"),
          explode(array(bandCols: _*)).as("x"))
        .select(col("doc_id"), col("simhash"),
          col("x.b").as("b"), col("x.bits").as("bits"))
      bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bits") === col("y.bits")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
            .as("hamming"))
        // Verify BEFORE deduplicating, so distinct() only shuffles the
        // surviving near-pairs, not the full multi-band candidate set.
        .where(col("hamming") <= 6)
        .distinct()
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash near-pairs within Hamming radius 10 — VALIDATION BASELINE
    // ONLY: deliberately O(n²) (unbounded theta self-join) to ground-truth
    // the banded q_llm_simhash_lsh, which is the 100 TB path. PlanAuditSpec
    // pins this key (with q_llm_dedup_embed) as one of exactly two declared
    // queries allowed to carry that shape.
    "q_llm_simhash_pairs" -> ((s, d) => {
      val sig = queries("q_llm_simhash")(s, d)
      val a = sig.select(col("doc_id").as("doc_a"), col("simhash").as("ha"))
      val b = sig.select(col("doc_id").as("doc_b"), col("simhash").as("hb"))
      a.join(b, col("doc_a") < col("doc_b"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .where(col("hamming") <= 10)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy("doc_a", "doc_b")
    }),

    // PER-LABEL IVF ANN (round-9 advice's multi-table ANN item): a
    // separate 4-centroid codebook PER LABEL (the multi-tenant index —
    // each tenant/table gets its own inverted lists and a query never
    // scans another tenant's cells). Codebooks are the 4 smallest
    // vec_ids within each label; assignment joins on label so a vector
    // only competes against its own codebook; the search touches the
    // query's (label, cell) only. Centroid ids are globally unique, so
    // the cell match is one equi-join key. At 100 TB label is the
    // partition key and each label's lists shard independently.
    "q_llm_ann_ivf_label" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), q6v(col("embedding")).as("qe"))
      val cw = Window.partitionBy(col("label")).orderBy(col("vec_id"))
      val cents = emb
        .withColumn("crn", row_number().over(cw))
        .where(col("crn") <= 4)
        .select(col("label"), col("vec_id").as("cid"), col("qe").as("ce"))
      val scored = emb.join(broadcast(cents), "label")
        .select(col("vec_id"), col("cid"), col("qe"),
          (longDot(col("qe"), col("ce")).cast("double") / 1e12).as("cs"))
      val assignW = Window.partitionBy("vec_id")
        .orderBy(col("cs").desc, col("cid"))
      val assigned = scored
        .withColumn("rn", row_number().over(assignW))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("qe"))
      val qCell = assigned.where(col("vec_id") === 0)
        .select(col("cid").as("qcid"), col("qe").as("qv"))
      assigned.join(broadcast(qCell), col("cid") === col("qcid"))
        .where(col("vec_id") =!= 0)
        .select(col("vec_id"),
          (longDot(col("qe"), col("qv")).cast("double") / 1e12).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
    }),

    // IVF-style ANN: assign all vectors to the nearest of 8 fixed
    // centroids (vec_id < 8 as the codebook), then search ONLY the query
    // vector's cell for its top-5 neighbors.
    "q_llm_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), q6v(col("embedding")).as("qe"))
      val cents = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("qe").as("ce"))
      val scored = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"), col("qe"),
          (longDot(col("qe"), col("ce")).cast("double") / 1e12).as("cs"))
      val assignW = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("cid"))
      val assigned = scored
        .withColumn("rn", row_number().over(assignW))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("qe"))
      val qCell = assigned.where(col("vec_id") === 0)
        .select(col("cid").as("qcid"), col("qe").as("qv"))
      assigned.join(broadcast(qCell), col("cid") === col("qcid"))
        .where(col("vec_id") =!= 0)
        .select(col("vec_id"),
          (longDot(col("qe"), col("qv")).cast("double") / 1e12).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
    }),

    // Embedding near-dup via the same hyperplane buckets — the scale path
    // for q_llm_dedup_embed's exact all-pairs scan: candidate pairs must
    // share a bucket in at least one of the probe views (the bucket
    // itself plus each single-plane flip — the same multi-probe trick as
    // the ANN query, symmetric per pair), then the exact integer cosine
    // filters them. Probing all Hamming-1 neighbors makes a miss require
    // the pair to disagree on >= 2 of 4 planes. Candidates are
    // (5/16)·n²-ish instead of n²; at 100 TB the probe views are the
    // shuffle keys.
    "q_llm_dedup_embed_lsh" -> ((s, d) => {
      // Probe views: identity + each single-plane flip of the LEFT side;
      // pair (a,b) within Hamming distance 1 of each other's buckets
      // collides in at least one view. No distinct() needed: for a fixed
      // pair the 5 probe keys are pairwise distinct, so at most ONE can
      // equal the right side's bucket — the join emits each pair once
      // (unlike simhash banding, where several bands can match).
      embedNearPairs(s, d).orderBy("va", "vb")
    }),

    // SemDeDup-style semantic dedup: connected components over the
    // embedding near-dup pair graph (the LSH candidates above), each
    // vector labeled with its component's smallest vec_id and the
    // representative flagged keep=true — the semantic sibling of the
    // shingle-graph q_llm_dedup_clusters, sharing Components.minLabel.
    "q_llm_dedup_semantic" -> ((s, d) => {
      Components.minLabel(embedNearPairs(s, d).select(col("va"), col("vb")))
        .select(col("id").as("vec_id"), col("lbl").as("cluster_id"),
          (col("id") === col("lbl")).as("keep"))
        .orderBy("vec_id")
    }),

    // Random-hyperplane LSH ANN: 4 fixed portable hyperplanes give a
    // 16-bucket sign signature; search probes the query's bucket plus all
    // buckets at Hamming distance 1 (standard multi-probe LSH, so a near
    // neighbor on the wrong side of ONE plane is still found). At scale
    // the bucket is a shuffle/partition key — each probe touches ~5/16 of
    // the corpus here, and 2^k/k-th at larger k. Hyperplane components
    // are md5-derived integers, bit-identical in both engines.
    "q_llm_ann_lsh" -> ((s, d) => {
      val bucketed = hyperplaneBucketed(s, d)
      val probes = bucketed.where(col("vec_id") === 0)
        .select(col("qe").as("qv"),
          explode(array(ProbeMasks.map(m =>
            col("bkt").bitwiseXOR(lit(m))): _*)).as("pb"))
      bucketed.where(col("vec_id") =!= 0)
        .join(broadcast(probes), col("bkt") === col("pb"))
        .select(col("vec_id"), col("bkt"),
          (longDot(col("qe"), col("qv")).cast("double") / 1e12).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
    }),

    // ADAPTIVE-k hyperplane LSH ANN (round-8 verdict #6): the recall
    // audit PROVED fixed 4-plane LSH decays (top-5 recall 0.60 → 0.20 at
    // 8× corpus density) because bucket occupancy grows with n while the
    // probe budget stays constant. The scale path derives the plane
    // count from the corpus: k = min(8, smallest k with n ≤ 64·2^k)
    // — i.e. k ≈ ⌈log2(n/64)⌉, holding expected bucket size ≈ 64 at any
    // scale — via INTEGER threshold comparisons only (no IEEE log2), so
    // both engines pick the identical k. Planes share the fixed
    // variant's md5 seed family.
    //
    // Probing is QUERY-DIRECTED multiprobe (Lv et al.'s insight): a
    // first draft probed identity + single flips only, and its own
    // recall audit showed that collapses as k grows (0.40 at 1×, 0.00
    // at 8× — the probed fraction of bucket space shrinks as (k+1)/2^k).
    // A true neighbor lands on the wrong side of a plane with
    // probability shrinking in the query's margin, so the right probe
    // set is every sign combination of the query's LOWEST-|margin|
    // planes: all 32 masks over the 5 weakest active planes (exhaustive
    // when k ≤ 5), plus the single flips. Probe COUNT stays constant as
    // k grows while bucket size stays ~64 — both pruning and recall are
    // scale-stable, which the ScaleProbe recall row verifies at 8×.
    // Everything stays declarative: n and the query's margin ranking
    // reach the row expressions as broadcast 1-row relations, never a
    // driver-side collect.
    "q_llm_ann_lsh_adaptive" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), q6v(col("embedding")).as("qe"))
      val kCol = (0 until 8)
        .map(j => when(col("n") > (64L << j), 1).otherwise(0))
        .reduce(_ + _)
      val withK = emb.crossJoin(
        broadcast(emb.agg(count(lit(1)).as("n")).select(kCol.as("k"))))
      val planes: Seq[Column] = (0 until 8).map { j =>
        typedlit((0 until 64).map(i => md5Long15(s"${j}_$i") % 2001 - 1000)
          .toArray)
      }
      val dotsArr = array((0 until 8).map(j =>
        when(lit(j) < col("k"), longDot(col("qe"), planes(j)))
          .otherwise(lit(null).cast("long"))): _*)
      val bucket = (0 until 8).map(j =>
        when(lit(j) < col("k") && longDot(col("qe"), planes(j)) > 0,
          lit(1 << j)).otherwise(lit(0))).reduce(_ + _)
      val bucketed = withK.withColumn("bkt", bucket)
      val qrow = bucketed.where(col("vec_id") === 0)
        .withColumn("dots", dotsArr)
        // active planes ranked by |margin| asc (ties by mask — total
        // order both engines); the 5 weakest get exhaustive sign probes
        .withColumn("low5", expr(
          """transform(slice(array_sort(filter(
               transform(dots, (dd, j) ->
                 struct(abs(dd) AS a, shiftleft(1, j) AS m)),
               x -> x.a IS NOT NULL)), 1, 5), x -> x.m)"""))
      val multi = qrow
        .select(col("qe").as("qv"), col("bkt"), col("low5"),
          explode(sequence(lit(0), lit(31))).as("sq"))
        .select(col("qv"), col("bkt"), expr(
          """((sq div 1) % 2) * coalesce(try_element_at(low5, 1), 0)
           + ((sq div 2) % 2) * coalesce(try_element_at(low5, 2), 0)
           + ((sq div 4) % 2) * coalesce(try_element_at(low5, 3), 0)
           + ((sq div 8) % 2) * coalesce(try_element_at(low5, 4), 0)
           + ((sq div 16) % 2) * coalesce(try_element_at(low5, 5), 0)""")
          .as("m"))
      val singles = qrow
        .select(col("qe").as("qv"), col("bkt"),
          explode(array((0 until 8).map(j =>
            when(lit(j) < col("k"), lit(1 << j))): _*)).as("m"))
        .where(col("m").isNotNull)
      val probes = multi.unionByName(singles)
        .select(col("qv"), col("bkt").bitwiseXOR(col("m")).as("pb"))
        .distinct()
      bucketed.where(col("vec_id") =!= 0)
        .join(broadcast(probes), col("bkt") === col("pb"))
        .select(col("vec_id"), col("k"), col("bkt"),
          (longDot(col("qe"), col("qv")).cast("double") / 1e12).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
    }),

    // HLL approximate distinct with a TOLERANCE oracle (round 8): the
    // estimate is engine-specific, so the graded emit is the EXACT
    // distinct count plus all-integer bound verdicts — 10·|a−e| ≤ e for
    // users (default rsd 5%) and 20·|a−e| ≤ e for events (rsd 1%) —
    // that DuckDB asserts as literal TRUE. An estimator drifting past
    // its bound now fails the hash compare instead of hiding behind a
    // rows-only check. The exact side is the validation harness; at
    // 100 TB the sketch alone is the production path (q_agg_distinct is
    // the exact companion).
    "q_agg_approx_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("au"),
          approx_count_distinct(col("event_id"), 0.01).as("ae"),
          countDistinct(col("user_id")).as("exact_users"),
          countDistinct(col("event_id")).as("exact_events"))
        .select(col("event_type"), col("exact_users"), col("exact_events"),
          (abs(col("au") - col("exact_users")) * 10 <= col("exact_users"))
            .as("users_ok"),
          (abs(col("ae") - col("exact_events")) * 20 <= col("exact_events"))
            .as("events_ok"))
        .orderBy("event_type"))
  )

  /** The 16 MIN aggregates and 4 band keys of the minhash oracle are
    * generated to stay bit-for-bit in sync with the Scala pipeline. */
  private val minhashOracle: String = {
    val mins = (0 until 16).map(j =>
      s"MIN(((${2 * j + 1} * h) + ${12345 * j}) % 2147483647) AS mh$j")
      .mkString(",\n                           ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS b, " +
        (0 until 4).map(r => s"mh${b * 4 + r}::VARCHAR").mkString(" || ',' || ") +
        " AS bk FROM sig").mkString("\n                     UNION ALL ")
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
            sig AS (SELECT doc_id,
                           $mins
                    FROM hm GROUP BY doc_id),
            band AS ($bandRows),
            cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                     FROM band x JOIN band y
                       ON x.b = y.b AND x.bk = y.bk
                      AND x.doc_id < y.doc_id),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
            inter AS (SELECT doc_a, doc_b, COUNT(*) AS inter
                      FROM cand
                      JOIN sh a ON a.doc_id = doc_a
                      JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
                      GROUP BY doc_a, doc_b)
         SELECT doc_a, doc_b,
                CAST(inter AS DOUBLE) / (ca.nsh + cb.nsh - inter) AS jaccard
         FROM inter
         JOIN cnt ca ON ca.doc_id = doc_a
         JOIN cnt cb ON cb.doc_id = doc_b
         WHERE CAST(inter AS DOUBLE) / (ca.nsh + cb.nsh - inter) >= 0.6
         ORDER BY doc_a, doc_b"""
  }

  val oracle: Map[String, String] = Map(
    // Tolerance oracle: exact counts reproduced in DuckDB; the _ok
    // booleans are the Spark-side sketch-vs-exact bound, asserted as
    // literal TRUE (see the query comment).
    "q_agg_approx_distinct" ->
      """SELECT event_type,
                COUNT(DISTINCT user_id) AS exact_users,
                COUNT(DISTINCT event_id) AS exact_events,
                TRUE AS users_ok, TRUE AS events_ok
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_llm_dedup_minhash" -> minhashOracle,
    "q_llm_dedup_embed_lsh" ->
      s"""WITH $lshBucketCte,
            pr AS (SELECT vec_id, CAST(xor(bkt, m) AS INT) AS pb
                   FROM bk, unnest([0, 1, 2, 4, 8]) u(m)),
            cand AS (SELECT a.vec_id AS va, b.vec_id AS vb
                     FROM pr a JOIN bk b
                       ON a.pb = b.bkt AND a.vec_id < b.vec_id),
            p AS (SELECT c.va, c.vb, x.qe AS e, y.qe AS q0e
                  FROM cand c
                  JOIN qv x ON x.vec_id = c.va
                  JOIN qv y ON y.vec_id = c.vb),
            pu AS (SELECT va, vb, e, q0e,
                          unnest(generate_series(1, len(e))) AS i FROM p),
            ps AS (SELECT va, vb, SUM(e[i] * q0e[i]) AS dot
                   FROM pu GROUP BY va, vb)
         SELECT va, vb, CAST(dot AS DOUBLE) / 1e12 AS score FROM ps
         WHERE CAST(dot AS DOUBLE) / 1e12 >= 0.35
         ORDER BY va, vb""",
    // Recursive closure over the SAME LSH pair graph: each vector joins
    // its component's smallest vec_id; keep flags the representative.
    "q_llm_dedup_semantic" ->
      s"""WITH RECURSIVE $lshBucketCte,
            pr AS (SELECT vec_id, CAST(xor(bkt, m) AS INT) AS pb
                   FROM bk, unnest([0, 1, 2, 4, 8]) u(m)),
            cand AS (SELECT a.vec_id AS va, b.vec_id AS vb
                     FROM pr a JOIN bk b
                       ON a.pb = b.bkt AND a.vec_id < b.vec_id),
            p AS (SELECT c.va, c.vb, x.qe AS e, y.qe AS q0e
                  FROM cand c
                  JOIN qv x ON x.vec_id = c.va
                  JOIN qv y ON y.vec_id = c.vb),
            pu AS (SELECT va, vb, e, q0e,
                          unnest(generate_series(1, len(e))) AS i FROM p),
            ps AS (SELECT va, vb, SUM(e[i] * q0e[i]) AS dot
                   FROM pu GROUP BY va, vb),
            nd AS (SELECT va, vb FROM ps
                   WHERE CAST(dot AS DOUBLE) / 1e12 >= 0.35),
            edges AS (SELECT va AS a, vb AS b FROM nd
                      UNION ALL SELECT vb, va FROM nd),
            reach(n, l) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.n)
         SELECT n AS vec_id, MIN(l) AS cluster_id,
                (n = MIN(l)) AS keep
         FROM reach GROUP BY n ORDER BY vec_id""",
    "q_llm_ann_lsh" ->
      s"""WITH $lshBucketCte,
            qb AS (SELECT bkt AS qbkt FROM bk WHERE vec_id = 0),
            pr AS (SELECT CAST(xor(qbkt, m) AS INT) AS pb
                   FROM qb, unnest([0, 1, 2, 4, 8]) u(m)),
            cand AS (SELECT b.vec_id, b.bkt FROM bk b
                     JOIN pr ON b.bkt = pr.pb
                     WHERE b.vec_id <> 0),
            p AS (SELECT c.vec_id, c.bkt, v.qe AS e, q0.qe AS q0e
                  FROM cand c
                  JOIN qv v ON v.vec_id = c.vec_id,
                  (SELECT qe FROM qv WHERE vec_id = 0) q0(qe)),
            pu AS (SELECT vec_id, bkt, e, q0e,
                          unnest(generate_series(1, len(e))) AS i FROM p),
            ps AS (SELECT vec_id, bkt, SUM(e[i] * q0e[i]) AS dot
                   FROM pu GROUP BY vec_id, bkt)
         SELECT vec_id, bkt, CAST(dot AS DOUBLE) / 1e12 AS score FROM ps
         ORDER BY score DESC, vec_id LIMIT 5""",
    // Adaptive-k twin: same pipeline with an 8-plane seed family gated by
    // the integer-threshold k (smallest k with n ≤ 64·2^k, capped at 8)
    // — the corpus-count CTE reproduces Spark's broadcast 1-row agg.
    "q_llm_ann_lsh_adaptive" ->
      """WITH qv AS (SELECT vec_id,
                            list_transform(embedding, x ->
                              CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
                     FROM embeddings),
            nk AS (SELECT (CASE WHEN cnt > 64 THEN 1 ELSE 0 END)
                        + (CASE WHEN cnt > 128 THEN 1 ELSE 0 END)
                        + (CASE WHEN cnt > 256 THEN 1 ELSE 0 END)
                        + (CASE WHEN cnt > 512 THEN 1 ELSE 0 END)
                        + (CASE WHEN cnt > 1024 THEN 1 ELSE 0 END)
                        + (CASE WHEN cnt > 2048 THEN 1 ELSE 0 END)
                        + (CASE WHEN cnt > 4096 THEN 1 ELSE 0 END)
                        + (CASE WHEN cnt > 8192 THEN 1 ELSE 0 END) AS k
                   FROM (SELECT COUNT(*) AS cnt FROM embeddings)),
            pl AS (SELECT j, i,
                          CAST(('0x' || substr(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 15))
                               AS BIGINT) % 2001 - 1000 AS hv
                   FROM generate_series(0, 7) g(j), generate_series(0, 63) h(i)),
            dots AS (SELECT vec_id, j, SUM(qe[i + 1] * hv) AS dt
                     FROM qv, pl GROUP BY vec_id, j),
            bk AS (SELECT vec_id,
                          CAST(SUM(CASE WHEN j < (SELECT k FROM nk) AND dt > 0
                                   THEN (1::BIGINT << j) ELSE 0 END) AS INT) AS bkt
                   FROM dots GROUP BY vec_id),
            qb AS (SELECT bkt AS qbkt FROM bk WHERE vec_id = 0),
            low5 AS (SELECT list(CAST(1::BIGINT << j AS INT)
                       ORDER BY abs(dt), j)[1:5] AS lm
                     FROM dots WHERE vec_id = 0
                       AND j < (SELECT k FROM nk)),
            masks AS (SELECT ((s // 1) % 2) * coalesce(lm[1], 0)
                           + ((s // 2) % 2) * coalesce(lm[2], 0)
                           + ((s // 4) % 2) * coalesce(lm[3], 0)
                           + ((s // 8) % 2) * coalesce(lm[4], 0)
                           + ((s // 16) % 2) * coalesce(lm[5], 0) AS m
                      FROM low5, generate_series(0, 31) g(s)
                      UNION
                      SELECT (1 << j) FROM generate_series(0, 7) g(j)
                      WHERE j < (SELECT k FROM nk)),
            pr AS (SELECT DISTINCT CAST(xor(qbkt, m) AS INT) AS pb
                   FROM qb, masks),
            cand AS (SELECT b.vec_id, b.bkt FROM bk b
                     JOIN pr ON b.bkt = pr.pb
                     WHERE b.vec_id <> 0),
            p AS (SELECT c.vec_id, c.bkt, v.qe AS e, q0.qe AS q0e
                  FROM cand c
                  JOIN qv v ON v.vec_id = c.vec_id,
                  (SELECT qe FROM qv WHERE vec_id = 0) q0(qe)),
            pu AS (SELECT vec_id, bkt, e, q0e,
                          unnest(generate_series(1, len(e))) AS i FROM p),
            ps AS (SELECT vec_id, bkt, SUM(e[i] * q0e[i]) AS dot
                   FROM pu GROUP BY vec_id, bkt)
         SELECT vec_id, (SELECT k FROM nk) AS k, bkt,
                CAST(dot AS DOUBLE) / 1e12 AS score FROM ps
         ORDER BY score DESC, vec_id LIMIT 5""",
    "q_llm_simhash" ->
      """WITH wh AS (SELECT doc_id,
                            CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                           FROM documents) t),
            bits AS (SELECT doc_id, i,
                            SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS bs
                     FROM wh, generate_series(0, 59) g(i)
                     GROUP BY doc_id, i)
         SELECT doc_id,
                CAST(SUM(CASE WHEN bs > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id ORDER BY doc_id""",
    // The banded path is an execution strategy — its oracle is the
    // all-pairs statement at ITS radius, proving the rewrite is lossless.
    "q_llm_simhash_lsh" -> simhashPairsOracle(6),
    "q_llm_simhash_pairs" -> simhashPairsOracle(10),
    "q_llm_ann_ivf" -> annIvfOracle,
    "q_llm_ann_ivf_label" -> annIvfLabelOracle
  )

  /** Shared CTE prefix of both hyperplane-LSH oracles — the SQL twin of
    * `hyperplaneBucketed` (quantize, derive planes, dot per plane, fold
    * sign bits into the bucket). Used inside `WITH $lshBucketCte, ...`. */
  private lazy val lshBucketCte: String =
    """qv AS (SELECT vec_id,
                            list_transform(embedding, x ->
                              CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
                     FROM embeddings),
            pl AS (SELECT j, i,
                          CAST(('0x' || substr(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 15))
                               AS BIGINT) % 2001 - 1000 AS hv
                   FROM generate_series(0, 3) g(j), generate_series(0, 63) h(i)),
            dots AS (SELECT vec_id, j, SUM(qe[i + 1] * hv) AS dt
                     FROM qv, pl GROUP BY vec_id, j),
            bk AS (SELECT vec_id,
                          CAST(SUM(CASE WHEN dt > 0 THEN (1::BIGINT << j) ELSE 0 END)
                               AS INT) AS bkt
                   FROM dots GROUP BY vec_id)"""

  private def simhashPairsOracle(radius: Int): String =
      s"""WITH wh AS (SELECT doc_id,
                            CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                           FROM documents) t),
            bits AS (SELECT doc_id, i,
                            SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS bs
                     FROM wh, generate_series(0, 59) g(i)
                     GROUP BY doc_id, i),
            sig AS (SELECT doc_id,
                           CAST(SUM(CASE WHEN bs > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
                    FROM bits GROUP BY doc_id)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= $radius
         ORDER BY doc_a, doc_b"""

  private lazy val annIvfOracle: String =
      s"""WITH q AS (SELECT vec_id, embedding AS e FROM embeddings),
            c AS (SELECT vec_id AS cid, embedding AS qe FROM embeddings
                  WHERE vec_id < 8),
            u AS (SELECT q.vec_id, c.cid, q.e, c.qe,
                         unnest(generate_series(1, len(q.e))) AS i FROM q, c),
            s AS (SELECT vec_id, cid, $duckDot AS dot FROM u
                  GROUP BY vec_id, cid),
            a AS (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY dot DESC, cid) AS rn
                  FROM s),
            asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
            qc AS (SELECT cid AS qcid FROM asg WHERE vec_id = 0),
            cell AS (SELECT asg.vec_id FROM asg, qc
                     WHERE asg.cid = qc.qcid AND asg.vec_id <> 0),
            p AS (SELECT v.vec_id, v.embedding AS e, qv.embedding AS qe
                  FROM embeddings v
                  JOIN cell ON cell.vec_id = v.vec_id,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0) qv(embedding)),
            pu AS (SELECT vec_id, e, qe,
                          unnest(generate_series(1, len(e))) AS i FROM p),
            ps AS (SELECT vec_id, $duckDot AS dot FROM pu GROUP BY vec_id)
         SELECT vec_id, CAST(dot AS DOUBLE) / 1e12 AS score FROM ps
         ORDER BY score DESC, vec_id LIMIT 5"""

  /** Per-label IVF: annIvfOracle with a 4-centroid codebook PER label
    * (the multi-tenant index); centroid ids are globally unique so the
    * query-cell match stays a single cid equi-join. */
  private lazy val annIvfLabelOracle: String =
      s"""WITH q AS (SELECT vec_id, label, embedding AS e FROM embeddings),
            c AS (SELECT label, vec_id AS cid, embedding AS qe
                  FROM (SELECT label, vec_id, embedding,
                          row_number() OVER (PARTITION BY label
                            ORDER BY vec_id) AS crn
                        FROM embeddings)
                  WHERE crn <= 4),
            u AS (SELECT q.vec_id, c.cid, q.e, c.qe,
                         unnest(generate_series(1, len(q.e))) AS i
                  FROM q JOIN c ON q.label = c.label),
            s AS (SELECT vec_id, cid, $duckDot AS dot FROM u
                  GROUP BY vec_id, cid),
            a AS (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY dot DESC, cid) AS rn
                  FROM s),
            asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
            qc AS (SELECT cid AS qcid FROM asg WHERE vec_id = 0),
            cell AS (SELECT asg.vec_id FROM asg, qc
                     WHERE asg.cid = qc.qcid AND asg.vec_id <> 0),
            p AS (SELECT v.vec_id, v.embedding AS e, qv.embedding AS qe
                  FROM embeddings v
                  JOIN cell ON cell.vec_id = v.vec_id,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0) qv(embedding)),
            pu AS (SELECT vec_id, e, qe,
                          unnest(generate_series(1, len(e))) AS i FROM p),
            ps AS (SELECT vec_id, $duckDot AS dot FROM pu GROUP BY vec_id)
         SELECT vec_id, CAST(dot AS DOUBLE) / 1e12 AS score FROM ps
         ORDER BY score DESC, vec_id LIMIT 5"""
}
