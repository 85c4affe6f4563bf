package graft

import org.apache.spark.sql.functions._

class Extras28Spec extends QuerySuiteBase {
  Seq("q_ts_rolling_corr", "q_dq_fd_check", "q_graph_reciprocity",
    "q_llm_dataset_card", "q_sql_qualify", "q_subquery_all")
    .foreach(checkDeclared(_))

  test("rolling corr: full windows only, r in [-1,1], exact identity") {
    val rows = q("q_ts_rolling_corr").collect()
    val days = Tables.events(spark, sf)
      .select(countDistinct(to_date(col("ts")))).head.getLong(0)
    assert(rows.length == days - 6) // first 6 days lack a full window
    rows.foreach { r =>
      if (!r.isNullAt(6)) {
        val v = r.getDouble(6)
        assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12)
        // r reconstructs from the emitted exact integers
        val expect = r.getLong(3).toDouble /
          (math.sqrt(r.getLong(4).toDouble) * math.sqrt(r.getLong(5).toDouble))
        assert(v == expect)
      }
    }
  }

  test("fd check: doc_hash->n_chars holds, the refuted FDs all violate") {
    val m = q("q_dq_fd_check").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("doc_hash->n_chars")._2 == 0) // n_chars is a function of text
    assert(m("p_type->p_brand")._2 > 0)
    assert(m("c_nationkey->c_mktsegment")._2 > 0)
    assert(m("o_custkey->o_orderpriority")._2 > 0)
    // determinant cardinality sanity: one per distinct text hash
    assert(m("doc_hash->n_chars")._1 ==
      Tables.documents(spark, sf).select(countDistinct(md5(col("text")
        .cast("binary")))).head.getLong(0))
  }

  test("reciprocity: unordered pairs, reciprocated = min, ratio <= 1") {
    val rows = q("q_graph_reciprocity").collect()
    assert(rows.nonEmpty && rows.length <= 10) // C(5,2) type pairs
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val (ab, ba, rec) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rec == math.min(ab, ba))
      assert(r.getDouble(5) <= 1.0)
    }
  }

  test("dataset card: per-language doc partition sums to corpus") {
    val rows = q("q_llm_dataset_card").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(1)) // dup_docs
      assert(r.getDouble(5) > 0)                               // mean_chars
    }
  }

  test("qualify: exactly top-2 per customer by cents with orderkey tiebreak") {
    val rows = q("q_sql_qualify").collect()
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 2))
    // spot-check one customer against a direct sort
    val ck = rows.head.getLong(0)
    val truth = Tables.orders(spark, sf)
      .where(col("o_custkey") === ck)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .collect().sortBy(r => (-r.getLong(1), r.getLong(0)))
      .take(2).map(_.getLong(0)).toSet
    assert(perCust(ck).map(_.getLong(1)).toSet == truth)
  }

  test("subquery all: every kept order beats the cohort max") {
    val cohortMax = Tables.orders(spark, sf)
      .where(col("o_orderstatus") === "F" && col("o_custkey") <= 10)
      .agg(max((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))).head.getLong(0)
    val rows = q("q_subquery_all").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) > cohortMax))
  }
}
