package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    })
  )

  val oracle: Map[String, String] = Map(
    "q_stream_live_resume" ->
      """SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                     AS BIGINT) AS total_cents
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
