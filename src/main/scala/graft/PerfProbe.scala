package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the heaviest declared queries.
  * Run: sbt "runMain graft.PerfProbe [sfDir]". */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val ws = split(col("text"), " ")
    val sh = docs.where(size(ws) >= 3)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", slice(ws, i, lit(3))))).as("sh"))
    time("shingle-gen+explode+hash") {
      sh.select(col("doc_id"), explode(col("sh")).as("s0"))
        .select(col("doc_id"), xxhash64(col("s0")).as("s")).count()
    }
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    time("pair-join+group(inter)") {
      ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
    }
    time("full q_llm_dedup_near") {
      SparkEntry.queries("q_llm_dedup_near")(spark, sfDir).count()
    }
    // Alternative pair builder: inverted index (group by shingle, emit
    // in-partition pair combinations) instead of the hash self-join.
    time("inverted-index pairs") {
      import spark.implicits._
      ex.as[(Long, Long)].groupByKey(_._2).flatMapGroups { (_, it) =>
        val ds = it.map(_._1).toArray.sorted
        if (ds.length < 2) Iterator.empty
        else ds.indices.iterator.flatMap(i =>
          (i + 1 until ds.length).iterator.map(j => (ds(i), ds(j))))
      }.toDF("doc_a", "doc_b").groupBy("doc_a", "doc_b").count().count()
    }

    // md5long-chain cost split (round-9 advice: go native ONLY if the
    // conv(substr(md5)) wrapper — not md5 itself — is hot). Three runs
    // over the same exploded shingle column: raw md5 (the floor), the
    // full portable chain, and xxhash64 (the non-portable ceiling).
    val s0 = sh.select(explode(col("sh")).as("s0"))
    time("hash: md5 only") {
      s0.select(md5(col("s0")).as("h")).agg(count(col("h"))).count()
    }
    time("hash: md5long chain") {
      s0.select(conv(substring(md5(col("s0")), 1, 15), 16, 10)
        .cast("long").as("h")).agg(sum(col("h"))).count()
    }
    time("hash: xxhash64") {
      s0.select(xxhash64(col("s0")).as("h")).agg(sum(col("h"))).count()
    }
    spark.stop()
  }
}
