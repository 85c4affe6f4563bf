package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Det, FixtureCache, Tables}

/** Round-6 operator additions: graded checkpoint-resume (the reference
  * store's resume-from-offset semantic, previously spec-only), a
  * mergeable exact quantile sketch, the xpath scalar family, and a
  * Hilbert-curve layout beside Z-order.
  */
object Extras9 {
  import Det._

  /** Unique memory-sink names per invocation (memory sink tables live for
    * the session; a fixed name would collide across invocations). */
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private def nextSink(prefix: String): String =
    s"${prefix}_${sinkSeq.incrementAndGet()}"

  /** The events table split into two single-FILE parquet halves by
    * event_id parity — the "already ingested" half and the "arrives after
    * the restart" half. Built once per testdata snapshot (FixtureCache);
    * the per-invocation staging below only hardlinks these files. */
  private def eventsSplit(s: SparkSession, d: String): Path = {
    val dir = FixtureCache.ensure("events_split2", Seq(s"$d/events.parquet"),
      "split by event_id % 2, single file each, ts as µs v1") { dest =>
      val ev = Tables.events(s, d) // ns→µs conversion happens here, once
      Files.createDirectories(Paths.get(dest))
      for ((tag, par) <- Seq("a" -> 0, "b" -> 1)) {
        val tmp = s"$dest/build_$tag"
        ev.where(pmod(col("event_id"), lit(2)) === par)
          .coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written under $tmp"))
        Files.move(part.toPath, Paths.get(s"$dest/$tag.parquet"))
      }
    }
    Paths.get(dir)
  }

  /** Hardlink (fall back to copy) src into dir. */
  private def stage(src: Path, dir: Path): Unit = {
    val dst = dir.resolve(src.getFileName)
    try Files.createLink(dst, src)
    catch { case _: Exception => Files.copy(src, dst) }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CHECKPOINT-RESUME — the reference store's core semantic (append,
    // then resume reading from a durable offset) in the graded set. Run 1
    // streams half the events (AvailableNow) into a per-event_type
    // aggregate and stops; half B is then added to the source dir and the
    // SAME query restarts from the SAME checkpoint. The file-stream source
    // resumes from its recorded offset (half A is never re-read — the spec
    // asserts run 2's input row count is exactly |B|), the state store
    // recovers run 1's partial aggregates, and the complete-mode output
    // equals the batch aggregate over A ∪ B. Any offset-replay bug (reread
    // or skip) doubles or loses counts and fails the oracle hash.
    // Counts and exact-cents sums are integers — order- and
    // batch-split-free, so the hash is deterministic however the two runs
    // shard the files.
    "q_stream_live_resume" -> ((s, d) => {
      val split = eventsSplit(s, d)
      val staging = Files.createTempDirectory("graft_resume")
      val in = Files.createDirectories(staging.resolve("in"))
      val chk = staging.resolve("chk").toString
      val schema = s.read.parquet(s"$split/a.parquet").schema
      def agg: DataFrame =
        s.readStream.schema(schema).parquet(in.toString)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((col("value").cast(D2) * 100).cast("long")).as("total_cents"))
      def runOnce(name: String): Unit = {
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(name)
          .option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      graft.streaming.StreamOps.withCappedState(s) {
        stage(split.resolve("a.parquet"), in)
        runOnce(nextSink("resume_run1"))
        stage(split.resolve("b.parquet"), in)
        val sink2 = nextSink("resume_run2")
        runOnce(sink2)
        s.table(sink2).orderBy("event_type")
      }
    }),

    // MERGEABLE EXACT QUANTILE SKETCH — the deterministic sibling of
    // percentile_approx (which is rows-only ✘-oracle because its survey
    // internals are engine-specific). The sketch is a fixed-width integer
    // histogram over exact cents: 16 per-shard bucket-count maps are the
    // mergeable summaries (merge = plain integer SUM — associative,
    // commutative, order-free, the KLL/t-digest role with zero float
    // state), a cumulative scan over the ~1.1k-bucket merged relation
    // answers any quantile with error bounded by the bucket width
    // (49 cents), and the probe never touches the raw data again. The
    // exact quantile rides along from a cents-granularity CDF — also a
    // bounded relation (distinct 2-dp values of a bounded measure), so
    // nothing here scans-and-sorts raw rows: at 100 TB both CDFs are
    // tiny aggregates and the quantile probe is a broadcast join.
    // All arithmetic is integer (rank = ceil via (n*q+999999) div 1e6),
    // so the hash match is exact by construction.
    "q_agg_quantile_sketch" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"),
        (col("value").cast(D2) * 100).cast("long").as("cents"))
      // (1) per-shard sketches — the mergeable artifact
      val perShard = ev.groupBy(
          pmod(md5long(col("event_id").cast("string")), lit(16L)).as("shard"),
          expr("cents div 50").as("b"))
        .agg(count(lit(1)).as("n"))
      // (2) merge = integer sum per bucket; (3) bucket CDF (tiny relation)
      val cdf = perShard.groupBy(col("b")).agg(sum(col("n")).as("n"))
        .withColumn("cum", sum(col("n")).over(Window.orderBy("b")))
        .select(col("b"), col("cum"))
      val centsCdf = ev.groupBy(col("cents")).agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(Window.orderBy("cents")))
        .select(col("cents"), col("cum"))
      val probes = ev.agg(count(lit(1)).as("n_total"))
        .select(col("n_total"), explode(array(
          lit(10000L), lit(250000L), lit(500000L),
          lit(750000L), lit(900000L), lit(990000L))).as("q_ppm"))
        .withColumn("rnk",
          expr("(n_total * q_ppm + 999999) div 1000000"))
      val est = probes.join(broadcast(cdf), col("cum") >= col("rnk"))
        .groupBy(col("q_ppm"), col("n_total"), col("rnk"))
        .agg(min(col("b")).as("b_est"))
      val exact = probes.join(broadcast(centsCdf), col("cum") >= col("rnk"))
        .groupBy(col("q_ppm"))
        .agg(min(col("cents")).as("exact_cents"))
      est.join(exact, Seq("q_ppm"))
        .select(col("q_ppm"), col("n_total"), col("exact_cents"),
          (col("b_est") * 50).as("est_lo_cents"),
          (col("b_est") * 50 + 49).as("est_hi_cents"))
        .orderBy("q_ppm")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_stream_live_resume" ->
      """SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                     AS BIGINT) AS total_cents
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_agg_quantile_sketch" ->
      """WITH ev AS (
           SELECT event_id,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events),
         shards AS (
           SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % 16 AS shard,
                  cents // 50 AS b, COUNT(*) AS n
           FROM ev GROUP BY 1, 2),
         merged AS (SELECT b, CAST(SUM(n) AS BIGINT) AS n FROM shards GROUP BY 1),
         cdf AS (SELECT b, SUM(n) OVER (ORDER BY b) AS cum FROM merged),
         ccdf AS (SELECT cents, SUM(n) OVER (ORDER BY cents) AS cum
                  FROM (SELECT cents, COUNT(*) AS n FROM ev GROUP BY 1)),
         tot AS (SELECT COUNT(*) AS n_total FROM ev),
         pr AS (SELECT CAST(q_ppm AS BIGINT) AS q_ppm, n_total,
                       (n_total * q_ppm + 999999) // 1000000 AS rnk
                FROM (SELECT unnest([10000, 250000, 500000,
                                     750000, 900000, 990000]) AS q_ppm)
                CROSS JOIN tot),
         est AS (SELECT pr.q_ppm, pr.n_total, MIN(cdf.b) AS b_est
                 FROM pr JOIN cdf ON cdf.cum >= pr.rnk GROUP BY 1, 2),
         ex AS (SELECT pr.q_ppm, MIN(ccdf.cents) AS exact_cents
                FROM pr JOIN ccdf ON ccdf.cum >= pr.rnk GROUP BY 1)
       SELECT est.q_ppm, CAST(est.n_total AS BIGINT) AS n_total,
              ex.exact_cents,
              est.b_est * 50 AS est_lo_cents,
              est.b_est * 50 + 49 AS est_hi_cents
       FROM est JOIN ex ON est.q_ppm = ex.q_ppm
       ORDER BY est.q_ppm"""
  )
}
