package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch-2 suite: GROUPS-frame emulation, months_between family,
  * rolling z-score, truncated EWMA, live stateful dedup, dataset mixing,
  * winnowing fingerprints. */
class Extras7Spec extends QuerySuiteBase {
  Seq("q_win_groups_frame", "q_fn_months", "q_ts_zscore", "q_ts_ewma",
    "q_stream_live_dedup", "q_llm_mix", "q_llm_winnow")
    .foreach(checkDeclared(_))

  test("GROUPS frame: n_frame counts ALL peers of g-1, g, g+1") {
    // Independent recomputation: per (flag, quantity-rank) peer-group
    // sizes, then n_frame must equal the sum of the neighbor groups.
    val li = Tables.lineitem(spark, sf)
    val g = dense_rank().over(
      Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity")))
    val sizes = li.select(col("l_returnflag"), col("l_quantity"))
      .withColumn("g", g)
      .groupBy(col("l_returnflag"), col("g"))
      .agg(count(lit(1)).as("sz"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expect = li.select(col("l_returnflag"), col("l_quantity"))
      .withColumn("g", g).collect().map { r =>
        val (f, gg) = (r.getString(0), r.getInt(2))
        (f, r.getDouble(1),
          sizes.getOrElse((f, gg - 1), 0L) + sizes((f, gg)) +
            sizes.getOrElse((f, gg + 1), 0L))
      }.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.head._3 }
    q("q_win_groups_frame").collect().foreach { r =>
      val k = (r.getString(2), r.getDouble(3))
      assert(r.getLong(4) == expect(k),
        s"n_frame for $k: ${r.getLong(4)} != ${expect(k)}")
    }
  }

  test("months_between: mb_same reflects the add_months clamp rule") {
    // Non-clamped dates give exactly 7.0; clamped ones (day > days in the
    // target month) add (day1-day2)/31 — never negative, always < 7.2.
    val df = q("q_fn_months")
    assert(df.where(col("mb_same") < 7.0 || col("mb_same") > 7.2).count() == 0)
    assert(df.where(col("mb_same") === 7.0).count() > 0, "no plain case")
    // mb_lastday is always an integer number of months.
    assert(df.where(col("mb_lastday") =!= floor(col("mb_lastday"))).count() == 0)
  }

  test("z-score: first row of every user is NULL, |z| bounded by sqrt(n)") {
    // A population z-score within its own window satisfies z² ≤ n-1.
    val df = q("q_ts_zscore")
    assert(df.where(col("n") === 1 && col("z").isNotNull).count() == 0,
      "n=1 must not score")
    assert(df.where(col("z") * col("z") > col("n") - 1 + lit(1e-6)).count() == 0,
      "z out of the algebraic bound")
  }

  test("EWMA equals the value itself on each user's first event") {
    // n_win = 1 ⇒ weights collapse to 1 ⇒ ewma = value (round-tripped
    // through cents, so compare at 2 dp exactly).
    val first = q("q_ts_ewma").where(col("n_win") === 1)
      .join(Tables.events(spark, sf), Seq("event_id"))
    assert(first.where(
      abs(col("ewma") - col("value")) > 1e-9).count() == 0)
    // And the weighted mean stays inside the window's value range.
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id").as("u"), col("ts"), col("value"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-15, 0)
    val bounds = ev.select(col("event_id"),
      min(col("value")).over(w).as("lo"), max(col("value")).over(w).as("hi"))
    assert(q("q_ts_ewma").join(bounds, Seq("event_id"))
      .where(col("ewma") < col("lo") - 1e-9 || col("ewma") > col("hi") + 1e-9)
      .count() == 0, "ewma escaped the window's [min, max]")
  }

  test("live dedup emits exactly the distinct key set") {
    assert(fingerprint(q("q_stream_live_dedup")) ==
      fingerprint(Tables.events(spark, sf)
        .select(col("user_id"), col("event_type")).distinct()
        .orderBy("user_id", "event_type")),
      "streaming dedup state diverged from batch DISTINCT")
  }

  test("mix rates: kept fraction tracks the per-source target ppm") {
    // Binomial bound: with n docs and rate p, observed k/n stays within
    // 5 sigma of p (deterministic hash ≈ uniform; fixture n is small, so
    // the bound is loose but catches rate-table or hash drift).
    q("q_llm_mix").collect().foreach { r =>
      val (ppm, n, k) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val p = ppm / 1e6
      val sigma = math.sqrt(p * (1 - p) * n)
      assert(math.abs(k - p * n) <= 5 * sigma + 1,
        s"${r.getString(0)}: kept $k of $n vs target $p")
    }
  }

  test("winnowing density: ~2/(w+1) of windows contribute, never more than all") {
    // n_fp ≤ n_windows by construction; and the expected distinct-min
    // density for random hashes is 2/(w+1) = 1/3 — assert a loose band.
    val agg = q("q_llm_winnow")
      .agg(sum(col("n_fp")).as("fp"), sum(col("n_windows")).as("win"))
      .head()
    val density = agg.getLong(0).toDouble / agg.getLong(1)
    assert(density > 0.15 && density < 0.6,
      s"winnow density $density outside the plausible band")
    assert(q("q_llm_winnow").where(col("n_fp") > col("n_windows")).count() == 0)
  }
}
