package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.WritePath

/** The reference's Write(entry)->Offset contract on Spark: contiguous,
  * deterministic, partition-count-independent offsets; appended batches
  * continue from the tail; readers see an immutable snapshot. */
class WritePathSpec extends QuerySuiteBase {

  private def eventsDf = Tables.events(spark, sf)
    .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))

  test("offsets are contiguous 0..n-1 in the requested total order") {
    val n = eventsDf.count()
    val off = WritePath.withOffsets(eventsDf,
      Seq(col("ts"), col("event_id")), 0L)
    val offs = off.select("offset").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == (0L until n).toSeq)
    // Offset order == requested order: event_id is ts-ordered in the
    // fixture, so offset order must equal event_id order.
    val misordered = off
      .select(col("event_id"), col("offset"))
      .where(col("event_id") =!= col("offset")).count()
    assert(misordered == 0,
      "fixture event_id IS the ts-order rank, offsets must match it")
  }

  test("offset assignment is independent of the input partition count") {
    val a = WritePath.withOffsets(eventsDf.repartition(3),
      Seq(col("ts"), col("event_id")), 100L)
    val b = WritePath.withOffsets(eventsDf.repartition(11),
      Seq(col("ts"), col("event_id")), 100L)
    val fa = a.select("event_id", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val fb = b.select("event_id", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(fa == fb)
  }

  test("append continues from the tail; readers see a consistent log") {
    val dir = Files.createTempDirectory("graft-log").toString + "/log"
    val first = eventsDf.where(col("event_id") < 100)
    val second = eventsDf.where(col("event_id") >= 100 && col("event_id") < 150)
    val tail1 = WritePath.append(dir, first, Seq(col("ts"), col("event_id")))
    assert(tail1 == 100L)
    val tail2 = WritePath.append(dir, second, Seq(col("ts"), col("event_id")))
    assert(tail2 == 150L)
    val log = spark.read.parquet(dir)
    assert(log.count() == 150)
    val offs = log.select("offset").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == (0L until 150L).toSeq)
    // SearchForward(offset >= 100) returns exactly the second batch.
    assert(log.where(col("offset") >= 100).count() == 50)
  }

  test("compact: fewer files, identical rows+offsets, appends continue") {
    val dir = Files.createTempDirectory("graft-log-compact").toString + "/log"
    val order = Seq(col("ts"), col("event_id"))
    // Five small appends → at least five part files.
    (0 until 5).foreach { i =>
      WritePath.append(dir,
        eventsDf.where(col("event_id") >= i * 20 && col("event_id") < (i + 1) * 20),
        order)
    }
    def partFiles(): Seq[java.io.File] =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    val before = spark.read.parquet(dir)
      .select("event_id", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(partFiles().size >= 5)
    WritePath.compact(spark, dir, targetFiles = 2)
    assert(partFiles().size <= 2, s"still ${partFiles().size} files")
    val after = spark.read.parquet(dir)
      .select("event_id", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(after == before, "compaction must preserve rows and offsets")
    assert(new java.io.File(dir + ".bak").exists() == false)
    assert(new java.io.File(dir + ".compacting").exists() == false)
    // The log is still a log: the next append continues from the tail.
    assert(WritePath.append(dir,
      eventsDf.where(col("event_id") >= 100 && col("event_id") < 110),
      order) == 110L)
  }

  test("compact recovers a crash between the two install renames") {
    val dir = Files.createTempDirectory("graft-log-crash").toString + "/log"
    val order = Seq(col("ts"), col("event_id"))
    WritePath.append(dir, eventsDf.where(col("event_id") < 50), order)
    val before = spark.read.parquet(dir)
      .select("event_id", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // Simulate the crash window: live dir moved aside, install never ran —
    // the ONLY complete log now lives at `.bak`.
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".bak")))
    // The natural recovery action is re-running compact: it must restore
    // `.bak` (never delete it) and then compact normally.
    WritePath.compact(spark, dir, targetFiles = 1)
    val after = spark.read.parquet(dir)
      .select("event_id", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(after == before, "recovery must preserve rows and offsets")
    assert(!new java.io.File(dir + ".bak").exists())
    // With NOTHING recoverable (no live dir, no .bak) compact must refuse
    // rather than fabricate an empty log.
    val gone = Files.createTempDirectory("graft-log-gone").toString + "/log"
    intercept[java.io.IOException] {
      WritePath.compact(spark, gone, targetFiles = 1)
    }
  }

  test("empty appends are no-ops: tail survives, next offsets continue") {
    val dir = Files.createTempDirectory("graft-log-empty").toString + "/log"
    val none = eventsDf.where(col("event_id") < 0)
    // Empty append onto an ABSENT log: creates an empty log at tail 0.
    assert(WritePath.append(dir, none, Seq(col("ts"), col("event_id"))) == 0L)
    // Empty append onto the EXISTING zero-row log (the NPE case): still 0.
    assert(WritePath.append(dir, none, Seq(col("ts"), col("event_id"))) == 0L)
    val tail = WritePath.append(dir, eventsDf.where(col("event_id") < 10),
      Seq(col("ts"), col("event_id")))
    assert(tail == 10L)
    // And an empty append after real rows leaves the tail untouched.
    assert(WritePath.append(dir, none, Seq(col("ts"), col("event_id"))) == 10L)
    val offs = spark.read.parquet(dir).select("offset")
      .collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == (0L until 10L).toSeq)
  }
}
