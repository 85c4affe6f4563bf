package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + oracle-parity helper for all operator suites.
  *
  * Oracle parity pre-flight (SURVEY.md §5.3): DuckDB is not linkable from
  * the JVM, so the strongest in-repo check is Spark-DSL result vs the same
  * tables through an independent recomputation — plus, for every declared
  * key, a non-emptiness + determinism (run-twice, same hash) check.
  */
abstract class QuerySuiteBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .appName("graft-test")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  /** Stable fingerprint of a DataFrame's full contents, ORDER-SENSITIVE —
    * a commutative sum would miss row-order nondeterminism, the exact
    * failure mode the driver's ordered hash compare punishes. */
  def fingerprint(df: DataFrame): (Long, Long) = {
    val rows = df.collect()
    val h = rows.foldLeft(0L)((acc, r) => acc * 31 + r.toString.hashCode)
    (rows.length.toLong, h)
  }

  /** Declared-query invariants: runs, returns rows, deterministic. */
  def checkDeclared(name: String, minRows: Long = 1): Unit =
    test(s"$name: non-empty + deterministic") {
      val a = fingerprint(q(name))
      val b = fingerprint(q(name))
      assert(a._1 >= minRows, s"$name returned ${a._1} rows")
      assert(a == b, s"$name not deterministic across runs")
    }
}
