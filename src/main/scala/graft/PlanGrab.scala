package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Per-key plan snapshots for the optimization-round evidence trail:
  * writes each named key's AQE-final formatted plan to
  * <outDir>/<key>_<suffix>.txt, under the EXACT Bench session settings
  * (master/shuffle-partitions/AQE coalesce), so a before/after pair is
  * the plan diff the round doc claims. Executes each frame first
  * (PlanDump convention) so AQE has resolved its final shape.
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.PlanGrab <outDir> <suffix> <key>..."
  */
object PlanGrab {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanGrab <outDir> <suffix> <key>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val keys = args.drop(2)
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
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    keys.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect() // finalize AQE
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
          df.queryExecution.explainString(FormattedMode).trim + "\n")
        println(s"[plangrab] $name ok")
      } catch { case e: Throwable =>
        println(s"[plangrab] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
