package graft

import org.apache.spark.sql.functions._

class Extras36Spec extends QuerySuiteBase {
  Seq("q_llm_langid_eval", "q_llm_cross_dedup", "q_dq_outlier_cols",
    "q_fn_ip").foreach(checkDeclared(_))

  test("langid eval: confusion matrix counts tile the corpus exactly") {
    val rows = q("q_llm_langid_eval").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    // within each actual lang the shares sum to ~1
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
  }

  test("cross dedup: only odd incoming docs, best match is even and real") {
    val rows = q("q_llm_cross_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 2 == 1, "incoming side must be odd doc_ids")
      assert(r.getLong(2) % 2 == 0, "matches must come from the even corpus")
      assert(r.getDouble(3) >= 0.6 && r.getDouble(3) <= 1.0)
      assert(r.getLong(1) >= 1)
    }
  }

  test("outlier audit: 3-sigma counts match a double-arithmetic recompute") {
    val rows = q("q_dq_outlier_cols").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val xs = Tables.lineitem(spark, sf)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).collect().map(_.getLong(0))
    val n = xs.length.toDouble
    val mean = xs.sum / n
    val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
    val expected = xs.count(x => (x - mean) * (x - mean) > 9 * variance)
    assert(rows("l_extendedprice") == expected,
      s"price outliers ${rows("l_extendedprice")} vs recomputed $expected")
  }

  test("ip functions: octets reassemble, private ranges honored") {
    q("q_fn_ip").collect().foreach { r =>
      val (ip, s) = (r.getLong(1), r.getString(2))
      val parts = s.split("\\.").map(_.toLong)
      assert(parts.length == 4 && parts.forall(p => p >= 0 && p <= 255))
      assert(parts(0) * 16777216L + parts(1) * 65536L
        + parts(2) * 256L + parts(3) == ip)
      val priv = parts(0) == 10 || (parts(0) == 192 && parts(1) == 168) ||
        (parts(0) == 172 && parts(1) >= 16 && parts(1) <= 31)
      assert(r.getBoolean(4) == priv)
    }
  }
}
