package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling evidence: inflate the sf0.1 tables K× in /tmp
  * (STRUCTURE-PRESERVING — keys are remapped so cardinalities grow with
  * the data, and document text gets a per-replica vocabulary suffix so
  * the near-dup pair structure replicates instead of exploding
  * quadratically), then time representative heavy operators at 1× and
  * K× and print the ratio. A shuffle-bound operator should scale ≈ K·
  * log-ish; anything super-linear is a plan that would not survive 100×.
  *
  * Run: sbt "runMain graft.ScaleProbe [K]"; results recorded in
  * BASELINE.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val sf = "/root/testdata/sf0.1"
    val out = s"/tmp/graft-scale-x$k"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    def replicate(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(k).select(col("id").as("rep")))

    // lineitem/orders: remap join keys so the key space grows K× too.
    replicate(Tables.lineitem(spark, sf))
      .withColumn("l_orderkey", col("l_orderkey") * k + col("rep")).drop("rep")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    replicate(Tables.orders(spark, sf))
      .withColumn("o_orderkey", col("o_orderkey") * k + col("rep")).drop("rep")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    // events: new ids and users, ts shifted per replica (keeps sessions).
    replicate(Tables.events(spark, sf))
      .withColumn("event_id", col("event_id") * k + col("rep"))
      .withColumn("user_id", col("user_id") * k + col("rep"))
      .withColumn("ts", timestamp_micros(unix_micros(col("ts"))
        + col("rep") * 86400000000L))
      .drop("rep")
      // events.parquet is read via Tables.events (nanosAsLong + div):
      // store ts back as LONG nanos to honor the raw schema.
      .withColumn("ts", unix_micros(col("ts")) * 1000)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/events_dir")
    // The live-streaming probes go through StreamOps.eventsFileStream,
    // which requires events.parquet to be a single FILE (pathGlobFilter
    // semantics) — promote the lone part file to that name.
    locally {
      val dir = new java.io.File(s"$out/events_dir")
      val part = dir.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(
          s"ScaleProbe: no .parquet part under $dir — coalesced write failed"))
      val dst = new java.io.File(s"$out/events.parquet")
      // a stale run may have left a DIRECTORY at this name (possibly with
      // subdirectories — delete bottom-up so the move cannot throw)
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
        f.delete(); ()
      }
      rmr(dst)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    // documents: per-replica vocabulary suffix — replicas of different k
    // share NO shingles, so the planted near-dup structure replicates
    // linearly instead of every copy matching every other copy.
    replicate(Tables.documents(spark, sf))
      .withColumn("doc_id", col("doc_id") * k + col("rep"))
      .withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(w, col("rep").cast("string"))), " "))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    replicate(Tables.embeddings(spark, sf))
      .withColumn("vec_id", col("vec_id") * k + col("rep")).drop("rep")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // Dims the probes join against, unchanged.
    Seq("customer", "nation", "region", "part", "supplier").foreach { t =>
      Tables.load(spark, sf, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val probes: Seq[(String, String => Long)] = Seq(
      "q1_pricing_summary" -> (d => SparkEntry.queries("q1_pricing_summary")(spark, d).count()),
      "q_join_sortmerge" -> (d => SparkEntry.queries("q_join_sortmerge")(spark, d).count()),
      "q_stream_session" -> (d => SparkEntry.queries("q_stream_session")(spark, d).count()),
      "q_llm_dedup_near" -> (d => SparkEntry.queries("q_llm_dedup_near")(spark, d).count()),
      "q_llm_dedup_minhash" -> (d => SparkEntry.queries("q_llm_dedup_minhash")(spark, d).count()),
      "q_llm_sim_topk" -> (d => SparkEntry.queries("q_llm_sim_topk")(spark, d).count()),
      "q_llm_simhash_lsh" -> (d => SparkEntry.queries("q_llm_simhash_lsh")(spark, d).count()),
      "q_llm_dedup_clusters" -> (d => SparkEntry.queries("q_llm_dedup_clusters")(spark, d).count()),
      "q_llm_centroid" -> (d => SparkEntry.queries("q_llm_centroid")(spark, d).count()),
      // Round-4 layout + decorrelation probes: the partitioned/bucketed
      // probes time LAYOUT BUILD + QUERY together (the write is the cost
      // being amortized; it must itself scale linearly), q21 times the
      // semi+anti decorrelation over the K×-remapped order keys.
      "q_source_partitioned" -> (d => SparkEntry.queries("q_source_partitioned")(spark, d).count()),
      "q_join_bucketed" -> (d => SparkEntry.queries("q_join_bucketed")(spark, d).count()),
      "q_ts_ohlc" -> (d => SparkEntry.queries("q_ts_ohlc")(spark, d).count()),
      "q_sql_q21" -> (d => SparkEntry.queries("q_sql_q21")(spark, d).count()),
      // Round-5 probes: gram-expansion + windowed min (winnow), bounded
      // ROWS frames (zscore), the double-window GROUPS emulation, the
      // bigram-LM two-join shape, the live stream-stream join (state
      // store volume scales with the click horizon), and the two
      // mergeable summaries (sketch size is CONSTANT — only the scan
      // side should grow).
      "q_llm_winnow" -> (d => SparkEntry.queries("q_llm_winnow")(spark, d).count()),
      "q_ts_zscore" -> (d => SparkEntry.queries("q_ts_zscore")(spark, d).count()),
      "q_win_groups_frame" -> (d => SparkEntry.queries("q_win_groups_frame")(spark, d).count()),
      "q_llm_ngram_lm" -> (d => SparkEntry.queries("q_llm_ngram_lm")(spark, d).count()),
      "q_stream_live_ssjoin" -> (d => SparkEntry.queries("q_stream_live_ssjoin")(spark, d).count()),
      "q_agg_countmin" -> (d => SparkEntry.queries("q_agg_countmin")(spark, d).count()),
      "q_agg_bloom" -> (d => SparkEntry.queries("q_agg_bloom")(spark, d).count())
    )
    println(f"${"probe"}%-22s ${"t_1x"}%8s ${"rows_1x"}%9s ${"t_Kx"}%8s ${"rows_Kx"}%9s ${"ratio"}%6s  (K=$k)")
    probes.foreach { case (name, f) =>
      val (t1, n1) = time(f(sf))
      val (tk, nk) = time(f(out))
      println(f"$name%-22s $t1%8.2f $n1%9d $tk%8.2f $nk%9d ${tk / t1}%6.2f")
    }
    spark.stop()
  }
}
