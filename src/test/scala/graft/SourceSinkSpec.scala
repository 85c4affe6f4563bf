package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond the graded parquet path: CSV, JSON-lines
  * and ORC round-trips (write → read-back → value equality), plus a
  * partitioned layout whose partition filter actually prunes at the scan
  * — the file-level analog of the reference store's block skipping, and
  * the layout contract a 100 TB deployment depends on. */
class SourceSinkSpec extends QuerySuiteBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves documents despite commas/quoting") {
    val out = tmp("graft-csv")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(out)
    assert(back.count() == docs.count())
    val diff = docs.join(back,
      docs("doc_id") === back("doc_id")
        && docs("text") === back("text"), "left_anti")
    assert(diff.count() == 0, "some rows changed in the CSV round-trip")
  }

  test("JSON-lines round-trip preserves events incl. timestamps") {
    val out = tmp("graft-json")
    // The default JSON timestampFormat keeps milliseconds only; a
    // microsecond format must be pinned on BOTH sides for lossless µs.
    val usFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    val ev = Tables.events(spark, sf)
    ev.write.mode("overwrite").option("timestampFormat", usFmt).json(out)
    val back = spark.read.schema(ev.schema)
      .option("timestampFormat", usFmt).json(out)
    assert(back.count() == ev.count())
    val a = ev.agg(sum(Det.tsUs(col("ts"))), sum("event_id")).head()
    val b = back.agg(sum(Det.tsUs(col("ts"))), sum("event_id")).head()
    assert(a == b, s"timestamp/id checksums differ: $a vs $b")
  }

  test("ORC round-trip preserves lineitem values") {
    val out = tmp("graft-orc")
    val li = Tables.lineitem(spark, sf)
    li.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    val a = li.agg(sum(Det.dec(col("l_extendedprice"))), count(lit(1))).head()
    val b = back.agg(sum(Det.dec(col("l_extendedprice"))), count(lit(1))).head()
    assert(a == b)
  }

  test("binaryFile source ingests opaque payloads with typed metadata") {
    // The real multimodal INGEST path: files arrive as (path, modTime,
    // length, content BINARY) rows — the schema the decode kernels
    // (Multimodal.decodePartition/framePartition) consume at scale.
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(sf)
      .select(col("path"), col("length"), col("content"))
      .collect()
    assert(files.length == Tables.names.length) // one per table
    files.foreach { r =>
      val onDisk = java.nio.file.Files.size(java.nio.file.Paths.get(
        new java.net.URI(r.getAs[String]("path")).getPath))
      assert(r.getAs[Long]("length") == onDisk)
      assert(r.getAs[Array[Byte]]("content").length == onDisk)
    }
  }

  test("partitioned layout: event_type filter prunes partitions at scan") {
    val out = tmp("graft-part")
    Tables.events(spark, sf).write.mode("overwrite")
      .partitionBy("event_type").parquet(out)
    val purchases = spark.read.parquet(out)
      .where(col("event_type") === "purchase")
    val expected = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(purchases.count() == expected)
    // Non-vacuous pruning evidence: a NON-EMPTY PartitionFilters list
    // (the metadata line prints even when empty), and — execution-level —
    // every file actually read lives under the matching partition dir.
    val p = purchases.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      "PartitionFilters is empty — nothing was pushed to the file index:\n" + p)
    val files = purchases.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("event_type=purchase")),
      s"scan read files outside the pruned partition: ${files.mkString(",")}")
  }
}
