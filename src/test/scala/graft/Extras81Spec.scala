package graft

import org.apache.spark.sql.functions._

class Extras81Spec extends QuerySuiteBase {
  Seq("q_join_interval_sessions", "q_scan_sample_pergroup", "q_fn_delta_encode",
    "q_agg_bitmap_index").foreach(checkDeclared(_))

  test("interval join: bucketed form equals the naive theta join") {
    // recompute pair TOTAL with the naive (unbucketed) formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val sess = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Det.tsUs(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull
        || col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
      .localCheckpoint()
    val naive = sess.as("a").join(broadcast(sess.as("b")),
        col("a.user_id") < col("b.user_id")
          && col("a.s_us") <= col("b.e_us")
          && col("b.s_us") <= col("a.e_us"))
      .count()
    val rows = q("q_join_interval_sessions").collect()
    assert(rows.map(_.getLong(1)).sum == naive)
  }

  test("per-group sample: exactly 3 per priority, ranks 1..3, stable " +
      "across two runs") {
    val r1 = q("q_scan_sample_pergroup").collect()
    val r2 = q("q_scan_sample_pergroup").collect()
    assert(r1.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == r2.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    r1.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("delta encode: points account for n_days - 2; width classes " +
      "legal") {
    val rows = q("q_fn_delta_encode").collect()
    val nDays = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nDays - 2)
    rows.foreach { r =>
      assert(Set(1L, 9L, 17L, 37L).contains(r.getLong(0)))
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
    }
  }

  test("bitmap index: set bits account for every order; densities in " +
      "(0, 1]") {
    val rows = q("q_agg_bitmap_index").collect()
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == n)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      val dens = r.getDouble(4)
      assert(dens > 0.0 && dens <= 1.0)
    }
  }
}
