package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-facing extension surface: long_array_dot callable from plain
  * SQL through SparkSessionExtensions. Needs its own session (extensions
  * bind at session build time). */
class ExtensionsSpec extends AnyFunSuite {
  test("long_array_dot is callable from SQL via GraftExtensions") {
    val spark = GraftExtensions.session()
    try {
      val r = spark.sql(
        "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .head().getLong(0)
      assert(r == 4 + 10 + 18)
    } finally spark.stop()
  }
}
