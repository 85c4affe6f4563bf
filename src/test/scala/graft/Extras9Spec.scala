package graft

import org.apache.spark.sql.functions._

class Extras9Spec extends QuerySuiteBase {
  Seq("q_stream_live_resume", "q_agg_quantile_sketch").foreach(checkDeclared(_))

  test("quantile sketch: exact quantile always inside the bucket bound") {
    q("q_agg_quantile_sketch").collect().foreach { r =>
      val (exact, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(exact >= lo && exact <= hi,
        s"exact $exact outside sketch bucket [$lo,$hi] — the sketch's " +
          "error guarantee (bucket width) is broken")
    }
  }

  test("quantile sketch summaries merge associatively (any shard grouping)") {
    import Det._
    val ev = Tables.events(spark, sf).select(col("event_id"),
      (col("value").cast(Det.D2) * 100).cast("long").as("cents"))
    val perShard = ev.groupBy(
        pmod(md5long(col("event_id").cast("string")), lit(16L)).as("shard"),
        expr("cents div 50").as("b"))
      .agg(count(lit(1)).as("n"))
    // merge all 16 at once vs merge two halves then merge the partials —
    // identical histograms (integer sums are associative/commutative).
    val all = perShard.groupBy("b").agg(sum("n").as("n"))
    val halves = perShard
      .groupBy(expr("shard div 8").as("half"), col("b"))
      .agg(sum(col("n")).as("n"))
      .groupBy("b").agg(sum("n").as("n"))
    assert(fingerprint(all.orderBy("b")) == fingerprint(halves.orderBy("b")))
  }

  test("checkpoint resume equals the batch aggregate (exactly-once)") {
    val live = q("q_stream_live_resume")
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast(Det.D2) * 100).cast("long")).as("total_cents"))
      .orderBy("event_type")
    assert(fingerprint(live) == fingerprint(batch),
      "resumed stream diverged from batch over the full file set — " +
        "offsets were re-read or skipped across the restart")
  }

  test("run 2 resumes from the recorded offset: half A is never re-read") {
    import org.apache.spark.sql.streaming.Trigger
    // Replicate the two-phase harness with progress captured, so the
    // exactly-once proof is structural (input row counts), not only
    // result-level: run 2's cumulative input must be exactly |B|.
    val split = Tables.events(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("graft-resume-spec")
    val in = java.nio.file.Files.createDirectories(tmp.resolve("in"))
    val chk = tmp.resolve("chk").toString
    def writeHalf(par: Int, name: String): Long = {
      val half = split.where(pmod(col("event_id"), lit(2)) === par)
      half.coalesce(1).write.parquet(s"$tmp/build_$name")
      val part = new java.io.File(s"$tmp/build_$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, in.resolve(s"$name.parquet"))
      half.count()
    }
    val schema = split.schema
    def runOnce(sink: String): Long = {
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(sink)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    val nA = writeHalf(0, "a")
    val inputsRun1 = runOnce("resume_spec_run1")
    val nB = writeHalf(1, "b")
    val inputsRun2 = runOnce("resume_spec_run2")
    assert(inputsRun1 == nA, s"run 1 read $inputsRun1 rows, |A| = $nA")
    assert(inputsRun2 == nB,
      s"run 2 read $inputsRun2 rows, |B| = $nB — offset replay re-read A")
    assert(spark.table("resume_spec_run2")
      .agg(sum(col("n"))).head().getLong(0) == nA + nB)
  }
}
