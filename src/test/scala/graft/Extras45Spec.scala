package graft

import org.apache.spark.sql.functions._

class Extras45Spec extends QuerySuiteBase {
  Seq("q_agg_hdr_histogram", "q_ts_var95", "q_fn_uuid5",
    "q_llm_chunk_overlap")
    .foreach(checkDeclared(_))

  test("hdr histogram: buckets nest gaps; cumulative ends at 1") {
    val rows = q("q_agg_hdr_histogram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(lo == (1L << (b - 1)) && hi == (1L << b) - 1)
      assert(r.getLong(4) >= lo && r.getLong(5) <= hi) // min/max inside bin
    }
    assert(math.abs(rows.last.getDouble(7) - 1.0) < 1e-9)
    // cum_n telescopes
    assert(rows.map(_.getLong(3)).sum == rows.last.getLong(6))
  }

  test("var95: the k-th worst delta bounds the tail mean") {
    val r = q("q_ts_var95").head()
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(k == math.ceil(n * 0.05).toLong)
    val varC = r.getLong(2)
    val cvar = r.getDouble(4)
    assert(cvar >= varC - 1e-6) // mean of worst-k ≥ k-th worst loss
  }

  test("uuid5: RFC shape — length, dashes, version 3, variant [89ab]") {
    val rows = q("q_fn_uuid5").collect()
    assert(rows.length == 25)
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    rows.foreach { r =>
      val u = r.getString(2)
      assert(re.findFirstIn(u).isDefined, s"malformed uuid $u")
    }
    assert(rows.map(_.getString(2)).distinct.length == 25)
  }

  test("chunk overlap: every token covered, expansion in (1, 2]") {
    val rows = q("q_llm_chunk_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, raw) = (r.getLong(3), r.getLong(4))
      assert(tok >= raw)            // overlap only adds coverage
      assert(r.getDouble(5) <= 2.0 + 1e-9) // stride = window/2 ⇒ ≤ 2×
    }
    val totalRaw = rows.map(_.getLong(4)).sum
    val direct = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(totalRaw == direct)
  }
}
