package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the q_graph_two_hop formulation (round-9 verdict #5:
  * the heaviest single query three rounds running — measure the
  * neighbor-set pre-aggregation alternative before adopting anything).
  *
  * Variants over the SAME co-occurrence graph:
  *   A  current: pair-join → EXCEPT direct edges → groupBy count
  *   B  pair-join (raw) → left_anti direct → countDistinct
  *   C  pair-join → distinct → left_anti direct → count (EXCEPT minus
  *      the redundant right-side distinct — e is distinct by
  *      construction)
  *   D  per-node sorted neighbor ARRAYS: candidates arrive as packed
  *      arrays, the distinct/exclusion is array_except per node
  * Run: sbt "runMain graft.TwoHopProbe [sfDir]".
  */
object TwoHopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def edges(): DataFrame = {
      val v = Tables.events(spark, sfDir)
        .where(pmod(col("user_id"), lit(3L)) === 0)
        .select(date_trunc("hour", col("ts")).as("h"),
          col("event_type").as("t"), col("user_id").as("u"))
        .distinct()
      val und = v.as("x").join(v.as("y"),
          col("x.h") === col("y.h") && col("x.t") === col("y.t")
            && col("x.u") < col("y.u"))
        .select(col("x.u").as("a"), col("y.u").as("b"))
        .distinct()
      und.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    for (round <- 1 to 2) {
      println(s"-- round $round --")
      time("A:current") {
        val e = edges()
        val fof = e.as("p").join(e.as("q"), col("p.dst") === col("q.src"))
          .select(col("p.src").as("u"), col("q.dst").as("v"))
          .where(col("u") =!= col("v"))
          .except(e.select(col("src").as("u"), col("dst").as("v")))
        fof.groupBy(col("u")).agg(count(lit(1)).as("two_hop")).count()
      }
      time("B:anti+cd") {
        val e = edges()
        e.as("p").join(e.as("q"), col("p.dst") === col("q.src"))
          .select(col("p.src").as("u"), col("q.dst").as("v"))
          .where(col("u") =!= col("v"))
          .join(e.select(col("src").as("u"), col("dst").as("v")),
            Seq("u", "v"), "left_anti")
          .groupBy(col("u")).agg(countDistinct(col("v")).as("two_hop"))
          .count()
      }
      time("C:dist+anti") {
        val e = edges()
        e.as("p").join(e.as("q"), col("p.dst") === col("q.src"))
          .select(col("p.src").as("u"), col("q.dst").as("v"))
          .where(col("u") =!= col("v"))
          .distinct()
          .join(e.select(col("src").as("u"), col("dst").as("v")),
            Seq("u", "v"), "left_anti")
          .groupBy(col("u")).agg(count(lit(1)).as("two_hop")).count()
      }
      time("D:arrays") {
        val e = edges()
        val nbrs = e.groupBy(col("src"))
          .agg(sort_array(collect_set(col("dst"))).as("ns"))
        val cand = e.join(nbrs.withColumnRenamed("src", "mid"),
            col("dst") === col("mid"))
          .groupBy(col("src").as("u"))
          .agg(array_distinct(flatten(collect_list(col("ns")))).as("cands"))
        cand.join(nbrs.select(col("src").as("u"), col("ns").as("own")), "u")
          .select(col("u"),
            size(array_except(array_remove(col("cands"), col("u")),
              col("own"))).as("two_hop"))
          .where(col("two_hop") > 0)
          .count()
      }
    }
    spark.stop()
  }
}
