package graft

import graft.streaming.StreamOps

/** Round-6 provider sweep: every graded live-streaming query runs under
  * the RocksDB state store provider (set centrally by
  * StreamOps.withCappedState — the provider a 100 TB cluster would run),
  * and results are provider-invariant: re-running under the default heap
  * provider yields identical fingerprints.
  *
  * q_stream_live_tws is exempt from the heap leg: transformWithState
  * REQUIRES RocksDB (STATE_STORE_INVALID_PROVIDER otherwise) — it is
  * asserted RocksDB-only instead.
  */
class RocksDbSweepSpec extends QuerySuiteBase {

  // Derived from SparkEntry (the ContractSpec lesson: a static copy of a
  // key family drifts) — every declared live key sweeps both providers
  // automatically; only the RocksDB-required transformWithState key is
  // carved out.
  private val sweepKeys = SparkEntry.queries.keys.toSeq.sorted
    .filter(_.startsWith("q_stream_live_"))
    .filterNot(_ == "q_stream_live_tws")

  test("live runners pin the RocksDB provider for the run, then restore") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StreamOps.withCappedState(spark) {
      assert(spark.conf.get(key).contains("RocksDBStateStoreProvider"),
        "withCappedState must pin the RocksDB provider")
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 8)
    }
    assert(spark.conf.getOption(key) == before, "provider conf leaked")
  }

  for (k <- sweepKeys)
    test(s"$k: RocksDB and heap providers produce identical results") {
      val rocks = fingerprint(q(k)) // default path = RocksDB
      val prop = "graft.stateStoreProvider"
      System.setProperty(prop,
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      try {
        val heap = fingerprint(q(k))
        assert(rocks == heap,
          s"$k diverged across state store providers: $rocks vs $heap")
      } finally System.clearProperty(prop)
    }

  test("q_stream_live_tws runs RocksDB regardless of the session default") {
    // transformWithState requires RocksDB; the query pins it itself.
    assert(fingerprint(q("q_stream_live_tws"))._1 > 0)
  }
}
