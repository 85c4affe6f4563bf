package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Size-based AQE coalescing (the Spark-recommended setting): post-
      // shuffle partitions target the advisory byte size instead of one-
      // per-core. At bench scale that collapses tiny shuffles to a single
      // partition (task overhead dominates sub-MB data); at 100 TB the
      // same setting yields full parallelism because partition count is
      // derived from actual bytes.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/file-listing paths so the first timed query
    // isn't charged ~3 s of fixed startup cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries.get("q_scan_full").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        // Make failures loud in BOTH channels: stderr for humans, and a
        // machine-readable "failed" list so a fast-failing query cannot
        // masquerade as a green fast one in the recorded totals.
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failed += name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
