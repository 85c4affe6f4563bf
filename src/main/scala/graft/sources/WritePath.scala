package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference store's write path — `Write(entry) -> Offset` — on Spark:
  * append a batch to the log with contiguous, deterministic offsets
  * continuing from the current tail.
  *
  * Scale design: the naive formulation is `row_number() OVER (ORDER BY
  * ...)` — ONE unpartitioned window, i.e. a single-task sort of the whole
  * batch; fine at test scale, fatal at 100 TB. This implementation is the
  * standard two-pass distributed assignment instead:
  *
  *   1. range-repartition + sort within partitions by the append order
  *      (total order across partition boundaries, each partition sorted);
  *   2. count rows per partition (a tiny per-partition aggregate — only
  *      the COUNTS travel to the driver, never rows);
  *   3. give each partition its exclusive-prefix-sum base and assign
  *      `base + local index` in one mapPartitions pass.
  *
  * Offsets are deterministic for a given append order (ties must be
  * broken by a unique key, same rule as every declared query) and
  * independent of the partition count — the property
  * `monotonically_increasing_id` does NOT have (SURVEY §7.4.1).
  */
object WritePath {

  /** Returns `df` with an `offset` column: start, start+1, ... in the
    * total order given by `orderCols` (must be a total order — include a
    * unique tie-breaker). `zipWithIndex` is exactly the two-pass
    * distributed assignment described above (its first job counts rows
    * per partition; only counts reach the driver). */
  /** Convenience form of withOffsetsManaged that leaves block release to
    * the ContextCleaner: the pinned blocks are unpersisted asynchronously
    * once the returned frame (and its RDD) become unreachable after the
    * caller's action. A long-lived appender should prefer
    * withOffsetsManaged and release() deterministically after its write,
    * as append() does. */
  def withOffsets(df: DataFrame, orderCols: Seq[Column], start: Long): DataFrame =
    withOffsetsManaged(df, orderCols, start)._1

  /** As withOffsets, plus a release() handle: the sorted batch is PINNED
    * (persisted at MEMORY_AND_DISK) so zipWithIndex's per-partition count
    * job and the subsequent terminal action read the SAME materialization
    * — a non-deterministic source plan (sampling, rand, changing input)
    * cannot make the prefix-sum bases disagree with the rows actually
    * written, so the contiguity contract holds unconditionally. Invoke
    * release() after the terminal action for deterministic block frees;
    * otherwise the ContextCleaner reclaims them only at GC time. */
  def withOffsetsManaged(df: DataFrame, orderCols: Seq[Column],
      start: Long): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val rdd = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "offset", LongType, nullable = false))
    val withOff = rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (start + i))
    }
    (spark.createDataFrame(withOff, schema),
      () => { rdd.unpersist(blocking = false); () })
  }

  /** Append `batch` to the parquet log at `dir`, assigning offsets after
    * the current tail (or `0` on an absent log). Returns the new tail
    * offset (exclusive).
    *
    * Concurrency contract — stated, not hand-waved: this is a
    * SINGLE-WRITER log, like the reference store's one writer goroutine.
    * Written part-files are immutable, so a reader that lists the
    * directory between appends sees a consistent prefix; a reader racing
    * the commit of an in-flight append may see a partial batch, and two
    * concurrent appenders would assign overlapping offsets — a
    * multi-writer deployment needs a transactional table format
    * underneath, which is out of scope here (BASELINE.json excludes
    * replicating the storage layer). */
  def append(dir: String, batch: DataFrame, orderCols: Seq[Column]): Long = {
    val spark = batch.sparkSession
    // ONLY an absent log maps to tail 0 — any other read failure
    // (transient IO, corrupt footer) must propagate, not silently restart
    // offsets at 0 and corrupt the log with duplicates.
    // coalesce(max, -1): a log directory that exists but holds zero rows
    // (e.g. after appending an empty batch) yields max = NULL — treat it
    // as tail 0, not an NPE.
    def tailOf(): Long =
      spark.read.parquet(dir)
        .agg(coalesce(max(col("offset")), lit(-1L))).head().getLong(0) + 1
    val tail =
      try tailOf()
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" => 0L
      }
    val (withOff, release) = withOffsetsManaged(batch, orderCols, tail)
    try withOff.write.mode("append").parquet(dir)
    finally release()
    // The written row count, read back from the offsets just assigned —
    // never a third recomputation of the (possibly non-deterministic
    // source) batch plan.
    tailOf()
  }

  /** Compact the log at `dir` into ~`targetFiles` offset-ranged files —
    * the log-store maintenance op for the small-files problem: every
    * append writes its own part files, and a year of small appends makes
    * the file listing (and per-file open cost) dominate reads at scale.
    *
    * Offsets and rows are preserved exactly; files afterwards hold
    * CONTIGUOUS offset ranges (repartitionByRange on offset + in-file
    * sort), so row-group min/max stats make offset-range reads skip whole
    * files — the same read path as a fresh bulk load.
    *
    * Same single-writer contract as append: run from the writer role.
    * Crash safety is rename-based: the compacted copy is fully written to
    * a sibling, the live dir is moved aside, the copy renamed in, and
    * only then the old data deleted — a crash at any point leaves either
    * the old or the new complete log on disk (plus at worst a stale
    * `.bak`/`.compacting` sibling to clean up), never a partial mix.
    * Readers racing the two-rename install window see NO directory at the
    * path (not a partial one) — the same visibility gap as any
    * rename-install scheme; retry the read.
    *
    * Re-running compact is also the RECOVERY action: if a prior run
    * crashed between the two renames (live dir absent, `.bak` holds the
    * only complete log), the `.bak` is renamed back into place before
    * anything is deleted — the stale-sibling cleanup below only runs once
    * the live dir demonstrably exists, so the last complete log can never
    * be deleted.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFiles: Int): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive: $targetFiles")
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compacting")
    val bak = new org.apache.hadoop.fs.Path(dir + ".bak")
    if (!fs.exists(hPath)) {
      // A prior compact crashed mid-install. If the complete original
      // survives at `.bak`, restore it and carry on; otherwise fail loudly
      // — deleting siblings here could destroy the only complete log.
      if (!fs.exists(bak) || !fs.rename(bak, hPath))
        throw new java.io.IOException(
          s"compact: $dir is absent and no recoverable $bak exists — " +
            "restore the log manually before compacting")
    }
    // Stale siblings from an interrupted run are safe to drop only now
    // that the live dir is known to exist.
    fs.delete(tmp, true); fs.delete(bak, true)
    spark.read.parquet(dir)
      .repartitionByRange(targetFiles, col("offset"))
      .sortWithinPartitions("offset")
      .write.parquet(tmp.toString)
    if (!fs.rename(hPath, bak))
      throw new java.io.IOException(s"compact: cannot move $dir aside")
    if (!fs.rename(tmp, hPath)) {
      // Roll back: put the original log back before failing.
      fs.rename(bak, hPath)
      throw new java.io.IOException(s"compact: cannot install compacted $dir")
    }
    fs.delete(bak, true)
  }
}
