package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution for the dedup/LSH family (round-16): times
  * each shared building block in isolation under the exact Bench
  * session, so per-key rewrites chase the measured cost center instead
  * of the assumed one.
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.operators.DedupProbe" */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DPROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    
    // warm the fixture markers
    time("warm: trips fixture read+count") {
      LlmOps.nearDupPairs(spark, sfDir, cachedTrips = true).count()
    }
    for (round <- 1 to 2) {
      time(s"r$round inline trips -> postingPairs(j>=.6)") {
        LlmOps.nearDupPairs(spark, sfDir).count()
      }
      time(s"r$round cached trips -> postingPairs(j>=.6)") {
        LlmOps.nearDupPairs(spark, sfDir, cachedTrips = true).count()
      }
      time(s"r$round sig fixture read") {
        Extras37.minhashSigs(spark, sfDir).count()
      }
      time(s"r$round cached pairs NO final agg") {
        import spark.implicits._
        val trips = spark.read.parquet(
          graft.FixtureCache.ensure("shingle_trips",
            Seq(s"$sfDir/documents.parquet"),
            "xxhash64 3-gram shingle postings + per-doc distinct counts v1")(
            _ => ()))
        val p = spark.sparkContext.defaultParallelism
        trips.repartition(p, col("s"))
          .sortWithinPartitions(col("s"), col("doc_id"))
          .as[(Long, Long, Int)]
          .mapPartitions { rows =>
            var n = 0L
            val buf = rows.buffered
            val outBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (buf.hasNext) {
              val key = buf.head._2
              var m = 0L
              while (buf.hasNext && buf.head._2 == key) { buf.next(); m += 1 }
              n += m * (m - 1) / 2
            }
            Iterator(n)
          }.reduce(_ + _)
      }
      time(s"r$round minLabel(cached pairs)") {
        Components.minLabel(
          LlmOps.nearDupPairs(spark, sfDir, cachedTrips = true)
            .select(col("doc_a"), col("doc_b"))).count()
      }
      time(s"r$round full key: q_llm_dedup_card") {
        graft.SparkEntry.queries("q_llm_dedup_card")(spark, sfDir).count()
      }
      time(s"r$round full key: q_llm_lsh_eval") {
        graft.SparkEntry.queries("q_llm_lsh_eval")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
