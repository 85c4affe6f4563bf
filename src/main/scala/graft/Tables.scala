package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + cross-engine determinism helpers (SURVEY.md §2.13).
  *
  * Design notes for 100 TB scale: every loader returns a plain parquet scan
  * so Catalyst sees the source directly — predicate pushdown, column
  * pruning and row-group stats skipping (the Spark analog of the reference
  * store's per-block min/max + bloom skipping) all reach the file scan.
  * No caching, no collect, no schema inference beyond parquet footers.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Deliberately NO plan cache here: a cached DataFrame pins the file
  // listing captured at first load (stale after a rewrite of the parquet
  // dir) and retains every session it was built for. Re-listing on each
  // load keeps every query an immutable snapshot of the files as they are
  // NOW — and measured end-to-end, caching saved ~1 s across the whole
  // 116-query bench, which does not buy that staleness class.
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events.ts has shipped in two physical layouts across testdata
    * generations: parquet timestamp[ns] (rounds 1–7), which Spark's µs
    * TimestampType refuses outright ([PARQUET_TYPE_ILLEGAL]) and must be
    * read via the `nanosAsLong` legacy conf as LongType nanos, and plain
    * timestamp[us] (round 8+), which reads as TIMESTAMP_NTZ directly. The
    * loader is SCHEMA-DRIVEN: it inspects the footer-derived type and
    * applies the matching normalization, so both layouts land on the same
    * µs TimestampType (UTC session) every downstream query and oracle was
    * graded against. ns→µs uses integer `div` (epoch-ns ≈ 1.7e18 exceeds
    * double's 53-bit mantissa, so `/` would corrupt values); the DuckDB
    * oracle sees the same values natively either way (§2.13 rule 3).
    *
    * The nanosAsLong conf stays set at session construction
    * (GraftExtensions.session, Verify, Bench, the test harness) — it is
    * inert for µs files and required for ns files.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy ns-as-long layout
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // timestamp[us]: NTZ→TZ cast is value-preserving under UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}

/** Determinism helpers — SURVEY.md §2.13 hash-match safety rules.
  *
  * Float sums are order-dependent across engines; all graded aggregates run
  * in exact DECIMAL space and only the final value is cast back to DOUBLE
  * (a deterministic nearest-double conversion both engines share). The
  * testdata's measure columns are 2-decimal values, so DECIMAL(18,2) casts
  * are exact round-trips.
  */
object Det {
  val D2: DecimalType = DecimalType(18, 2)

  /** Exact decimal view of a 2-dp double measure column. */
  def dec(c: Column): Column = c.cast(D2)

  /** Order-independent exact SUM of a 2-dp double measure → DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact AVG: decimal sum cast to double, divided by count (both engines
    * perform the identical IEEE-754 division). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** 6-dp rounding for scalar float outputs (§2.13 rule 2). */
  def r6(c: Column): Column = round(c, 6)

  /** THE portable 60-bit text hash (single definition — four operator
    * families share it): first 15 md5 hex chars parsed as an integer.
    * DuckDB twin: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT). */
  def md5long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Timestamp as epoch microseconds (bigint) — sidesteps all cross-engine
    * timestamp formatting/precision/timezone hash differences. The cast
    * also accepts TIMESTAMP_NTZ columns (parquet ms without the UTC flag,
    * e.g. o_orderdate): with the session pinned UTC it is value-exact. */
  def tsUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Deterministic DOUBLE emission of a NON-NEGATIVE exact integer
    * column (BIGINT or DECIMAL(38,0), referenced BY NAME) that may
    * exceed 2^53 — the round-14 generalized gini/haar fence fix.
    * Splitting into two int64 limbs at 2^30 makes every conversion a
    * ≤2^53-exact int→double, and the recombination (one multiply, one
    * add) is the identical IEEE-754 sequence on both engines — unlike
    * a DECIMAL/HUGEINT→double cast, whose rounding paths diverged by
    * 1 ulp between the engines at sf0.1 (the original gini lesson).
    * SQL twin:
    *   (CAST(CAST(x // 1073741824 AS BIGINT) AS DOUBLE) * 1073741824.0
    *    + CAST(CAST(x % 1073741824 AS BIGINT) AS DOUBLE))
    * Caller contract: x >= 0 (div/%/floor agree there) and
    * x < 2^93 (hi limb stays in int64). */
  def limbDouble(name: String): Column =
    expr(s"CAST($name div 1073741824 AS BIGINT)").cast("double") *
      lit(1073741824.0) +
      expr(s"CAST($name % 1073741824 AS BIGINT)").cast("double")

  /** The DuckDB twin of [[limbDouble]], for oracle construction. */
  def limbDoubleSql(x: String): String =
    s"(CAST(CAST(($x) // 1073741824 AS BIGINT) AS DOUBLE) " +
      s"* 1073741824.0 + CAST(CAST(($x) % 1073741824 AS BIGINT) " +
      "AS DOUBLE))"

  /** Three-limb variant of [[limbDouble]] for magnitudes past its
    * 2^93 horizon (round-15: block_bootstrap's Σdev² reads ~1e26 at
    * sf0.01 and grows ∝ volume²). Limbs split at 2^60 and 2^30: every
    * limb is an exact ≤2^63 BIGINT whose int64→double conversion is
    * the same correctly-rounded operation on both engines, and the
    * recombination (two multiplies, two adds, both powers of two) is
    * one shared IEEE tree. Caller contract: x >= 0 and
    * x < 2^123 (≈1.06e37 — effectively the DECIMAL(38,0) range). */
  def limbDouble3(name: String): Column =
    expr(s"CAST($name div 1152921504606846976 AS BIGINT)").cast("double") *
      lit(1.152921504606846976e18) +
      expr(s"CAST(($name % 1152921504606846976) div 1073741824 AS BIGINT)")
        .cast("double") * lit(1073741824.0) +
      expr(s"CAST($name % 1073741824 AS BIGINT)").cast("double")

  /** The DuckDB twin of [[limbDouble3]]. */
  def limbDouble3Sql(x: String): String =
    s"(CAST(CAST(($x) // 1152921504606846976 AS BIGINT) AS DOUBLE) " +
      "* 1152921504606846976.0 " +
      s"+ CAST(CAST((($x) % 1152921504606846976) // 1073741824 AS BIGINT) " +
      "AS DOUBLE) * 1073741824.0 " +
      s"+ CAST(CAST(($x) % 1073741824 AS BIGINT) AS DOUBLE))"
}
