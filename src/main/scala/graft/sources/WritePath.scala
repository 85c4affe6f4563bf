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
    * unique tie-breaker). */
  def withOffsets(df: DataFrame, orderCols: Seq[Column], start: Long): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val bases = counts.scanLeft(start)(_ + _) // exclusive prefix sum
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "offset", LongType, nullable = false))
    val withOff = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var off = bases(i)
      it.map { row =>
        val r = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ off)
        off += 1
        r
      }
    }
    spark.createDataFrame(withOff, schema)
  }

  /** Append `batch` to the parquet log at `dir`, assigning offsets after
    * the current tail (or `0` on an empty log). Returns the new tail
    * offset (exclusive). The write itself is an ordinary parquet append —
    * immutable files, snapshot-isolated readers, exactly the reference's
    * copy-on-write read model. */
  def append(dir: String, batch: DataFrame, orderCols: Seq[Column]): Long = {
    val spark = batch.sparkSession
    val tail =
      try spark.read.parquet(dir).agg(max(col("offset"))).head().getLong(0) + 1
      catch { case _: Throwable => 0L }
    val withOff = withOffsets(batch, orderCols, tail)
    withOff.write.mode("append").parquet(dir)
    tail + batch.count()
  }
}
