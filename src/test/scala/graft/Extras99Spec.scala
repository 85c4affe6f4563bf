package graft

import org.apache.spark.sql.functions._

class Extras99Spec extends QuerySuiteBase {
  Seq("q_llm_yule_k", "q_llm_good_turing", "q_llm_mattr",
    "q_llm_heaps_law").foreach(checkDeclared(_))

  test("yule k: matches the direct repeat-rate computation") {
    val r = q("q_llm_yule_k").head()
    val freqs = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect().map(_.getLong(1))
    val n = freqs.sum.toDouble
    val k = 1e4 * (freqs.map(c => c.toDouble * c).sum - n) / (n * n)
    assert(r.getLong(0) == freqs.sum)
    assert(r.getLong(1) == freqs.length)
    assert(math.abs(r.getDouble(2) - k) < 1e-4)
  }

  test("good-turing: r* positive, r covers the low frequencies") {
    val rows = q("q_llm_good_turing").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 9)
      assert(r.getDouble(3) > 0)
    }
  }

  test("mattr: per-source means in (0, 1]") {
    val rows = q("q_llm_mattr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
      assert(r.getLong(1) > 0)
    }
  }

  test("mattr: closed-form equals brute-force sliding windows") {
    val docs = Tables.documents(spark, sf)
      .where(size(split(col("text"), " ")) >= 25)
      .select("source", "text").collect()
    val w = 25
    val bySource = docs.groupBy(_.getString(0)).map { case (src, rs) =>
      val micro = rs.map { r =>
        val ts = r.getString(1).split(" ")
        val ratios = (w to ts.length).map { e =>
          ts.slice(e - w, e).distinct.length.toDouble / w
        }
        math.round(ratios.sum / ratios.size * 1e6)
      }
      src -> micro.sum.toDouble / micro.size / 1e6
    }
    q("q_llm_mattr").collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - bySource(r.getString(0))) < 1e-5)
    }
  }

  test("heaps: beta in (0, 1) for natural vocabulary growth") {
    val r = q("q_llm_heaps_law").head()
    assert(r.getLong(0) == 20)
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 1.2)
  }
}
