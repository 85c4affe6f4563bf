package graft

import org.apache.spark.sql.functions._

class Extras42Spec extends QuerySuiteBase {
  Seq("q_ts_hurst", "q_ts_perm_entropy", "q_llm_bigram_entropy",
    "q_llm_lexicon_score", "q_llm_embed_outlier", "q_agg_bowley",
    "q_graph_adamic_adar")
    .foreach(checkDeclared(_))

  test("hurst: window counts partition the spine; H in a sane band") {
    val r = q("q_ts_hurst").head()
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(r.getLong(0) == days / 16)   // full 16-windows
    assert(r.getLong(2) == days / 64)   // full 64-windows
    val h = r.getDouble(6)
    assert(h > 0.0 && h < 1.1, s"hurst $h outside (0, 1.1)")
  }

  test("perm entropy: counts cover all triples; entropy ≤ log2(classes)") {
    val r = q("q_ts_perm_entropy").head()
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(r.getLong(0) == days - 2)
    val (classes, ent) = (r.getLong(1), r.getDouble(3))
    assert(ent >= 0.0 && ent <= math.log(classes.toDouble) / math.log(2.0)
      + 1e-6)
  }

  test("bigram entropy: bounded by unigram context entropy proxy") {
    val r = q("q_llm_bigram_entropy").head()
    val (nBigrams, nTypes, ent) =
      (r.getLong(0), r.getLong(1), r.getDouble(3))
    assert(nBigrams > 0 && nTypes > 0)
    assert(ent >= 0.0 && ent <= math.log(nTypes.toDouble) / math.log(2.0))
    // N = total tokens - one per doc
    val toks = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).as("k"))
      .agg(sum(col("k")), count(lit(1))).head()
    assert(nBigrams == toks.getLong(0) - toks.getLong(1))
  }

  test("lexicon score: hits never exceed tokens; recount one source") {
    val rows = q("q_llm_lexicon_score").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val s0 = rows.head.getString(0)
    val direct = Tables.documents(spark, sf)
      .where(col("source") === s0)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w").isin("table", "query", "join", "scan", "hash",
        "sort", "filter", "merge", "batch", "column"))
      .count()
    assert(direct == rows.head.getLong(2))
  }

  test("embed outlier: 5 per label, ranked by descending distance") {
    val rows = q("q_llm_embed_outlier").collect()
    val byLabel = rows.groupBy(_.getInt(0))
    byLabel.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val ds = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      ds.sliding(2).foreach {
        case Array(a, b) => assert(a >= b - 1e-12)
        case _ =>
      }
      assert(ds.forall(_ >= 0.0))
    }
  }

  test("bowley: quartiles ordered, skew in [-1, 1]") {
    val rows = q("q_agg_bowley").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (q1, q2, q3) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(q1 <= q2 && q2 <= q3)
      val b = r.getDouble(5)
      assert(b >= -1.0 - 1e-9 && b <= 1.0 + 1e-9)
    }
  }

  test("adamic adar: pairs match resource-alloc support; aa ≥ n_common/ln(maxdeg)") {
    val aa = q("q_graph_adamic_adar").collect()
    val ra = q("q_graph_resource_alloc").collect()
    // identical candidate pair sets (same Σdeg² join)
    assert(aa.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      ra.map(r => (r.getLong(0), r.getLong(1))).toSet)
    aa.foreach { r =>
      val (nc, v) = (r.getLong(2), r.getDouble(4))
      assert(v > 0.0 && v >= nc / math.log(1e6)) // deg < 1e6 ⇒ each term > 1/ln(1e6)
    }
  }
}
