package graft

class Extras70Spec extends QuerySuiteBase {
  Seq("q_agg_kmv_theta", "q_evt_markov_entropy_rate", "q_agg_friedman")
    .foreach(checkDeclared(_))

  test("kmv theta: estimates within 50% of truth at k=64; inter <= union") {
    val r = q("q_agg_kmv_theta").head()
    val (trueA, trueB) = (r.getLong(3), r.getLong(4))
    val (estA, estB) = (r.getDouble(5), r.getDouble(6))
    // KMV with k=64 has ~1/sqrt(62) ≈ 13% stderr; 50% is a loose sanity bound
    assert(math.abs(estA - trueA) <= 0.5 * trueA, s"est_a $estA vs $trueA")
    assert(math.abs(estB - trueB) <= 0.5 * trueB, s"est_b $estB vs $trueB")
    assert(r.getLong(2) <= r.getLong(1)) // inter sample <= union sample
  }

  test("entropy rate: bounded by log2(n_states)") {
    val r = q("q_evt_markov_entropy_rate").head()
    val n = r.getLong(0)
    val h = r.getDouble(2)
    assert(h >= -1e-6)
    assert(h <= math.log(n.toDouble) / math.log(2.0) + 1e-6)
  }

  test("friedman: chi2 non-negative; doubled rank sums consistent") {
    val r = q("q_agg_friedman").head()
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) > 0)
    assert(r.getDouble(3) >= -1e-6)
  }
}
