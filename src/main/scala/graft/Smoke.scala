package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke gate: SparkEntry.entry must
  * return rows > 0 on sf0.001. Run: sbt "runMain graft.Smoke". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    df.show(5, truncate = false)

    // Streaming smoke: the same tumbling aggregation as q_stream_tumbling,
    // driven incrementally from a file stream of the events table (shared
    // harness with the graded live queries).
    import graft.streaming.StreamOps
    val sf = "/root/testdata/sf0.001"
    val sn = StreamOps.runToMemory(
      StreamOps.tumbling(StreamOps.eventsFileStream(spark, sf)),
      "smoke_stream").count()
    println(s"SMOKE streaming windows=$sn ${if (sn > 0) "PASS" else "FAIL"}")

    spark.stop()
    if (n <= 0 || sn <= 0) sys.exit(1)
  }
}
