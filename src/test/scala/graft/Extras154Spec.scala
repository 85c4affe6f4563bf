package graft

import org.apache.spark.sql.functions._

class Extras154Spec extends QuerySuiteBase {
  Seq("q_graph_bowtie", "q_graph_diameter", "q_win_session_window",
    "q_agg_kish_deff").foreach(checkDeclared(_))

  test("bowtie: regions partition the node set and shares sum to 1") {
    val rs = q("q_graph_bowtie").collect()
    val regions = rs.map(_.getString(0)).toSet
    assert(regions.subsetOf(Set("core", "in", "out", "other")))
    assert(regions.contains("core"), "giant SCC must be non-empty")
    val shares = rs.map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
  }

  test("diameter: 2-sweep invariants (ecc1 >= ecc0, endpoints reached)") {
    val r = q("q_graph_diameter").collect().head
    val (ecc0, diamLb) = (r.getLong(1), r.getLong(4))
    assert(diamLb >= ecc0,
      "the second sweep's eccentricity can never undercut the first")
    assert(r.getLong(2) >= 2, "component must have at least seed+one")
  }

  test("session_window: sessions split exactly at >= 30-minute gaps") {
    val rows = q("q_win_session_window").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // Rebuild sessions from raw events and compare boundaries.
    val gap = 1800000000L
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .where(pmod(col("user_id"), lit(17L)) === 0)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    val expect = raw.flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.foldLeft(List.empty[List[Long]]) {
        case (acc, t) if acc.nonEmpty && t - acc.head.head < gap =>
          (t :: acc.head) :: acc.tail
        case (acc, t) => List(t) :: acc
      }
      sessions.map(sess => (u, sess.min, sess.max))
    }.toSet
    assert(rows.toSet == expect)
  }

  test("kish: deff >= 1 and n_eff <= n (Cauchy-Schwarz)") {
    q("q_agg_kish_deff").collect().foreach { r =>
      assert(r.getDouble(4) >= 1.0 - 1e-9,
        s"deff ${r.getDouble(4)} < 1 for ${r.getString(0)}")
      assert(r.getDouble(5) <= r.getLong(1) + 1e-6)
    }
  }
}
