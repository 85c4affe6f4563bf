package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-layout scale stories that the declared queries can't show:
  * partitioned writes with parquet bloom filters (the write-side analog
  * of the reference store's per-block blooms), bucketed tables giving
  * shuffle-free joins, and CSV/JSON source round-trips. */
class StorageSpec extends QuerySuiteBase {

  test("partitioned write + bloom filter: partition pruning reaches the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf)
      .write.mode("overwrite")
      .partitionBy("event_type")
      .option("parquet.bloom.filter.enabled#user_id", "true")
      .parquet(dir)
    val back = spark.read.parquet(dir)
      .where(col("event_type") === "purchase" && col("user_id") === 7)
    // Non-empty PartitionFilters (the line prints even when empty) plus
    // execution-level proof: only the matching partition's files read.
    val plan = back.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"partition pruning missing:\n$plan")
    val files = back.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("event_type=purchase")),
      s"scan read files outside the pruned partition: ${files.mkString(",")}")
    val expected = Tables.events(spark, sf)
      .where(col("event_type") === "purchase" && col("user_id") === 7).count()
    assert(back.count() == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // Co-bucketed equi-join: no ShuffleExchange on either side.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }

  test("csv and json sources round-trip the nation table") {
    val base = Files.createTempDirectory("graft-src").toString
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    nation.write.mode("overwrite").json(s"$base/json")
    val viaCsv = spark.read.option("header", "true")
      .schema(nation.schema).csv(s"$base/csv")
    val viaJson = spark.read.schema(nation.schema).json(s"$base/json")
    assert(viaCsv.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    assert(viaJson.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }
}
