package graft

/** The 1000-executor guarantee, as a test: every declared query must
  * return BIT-IDENTICAL rows in identical order when the shuffle
  * partition count changes (4 → 7, a count that divides nothing). This
  * is the property that lets the same code run on local[4] and a large
  * cluster without result drift — decimal/integer exactness plus total
  * ordering make results independent of parallelism by construction, and
  * this spec re-proves it for the WHOLE declared surface on every run. */
class PartitionInvarianceSpec extends QuerySuiteBase {

  private lazy val other = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }

  /** percentile_approx's summary merge is not order-independent — the
    * estimator only promises an error bound. Since round 8 the query
    * emits exact percentiles plus tolerance BOOLEANS instead of the raw
    * estimates, so its output is partition-exact again unless the sketch
    * drifts right across the tolerance edge between partitionings —
    * which the generous bound (max(1.0, 2%) on a dense integer-valued
    * column) keeps unreachable. The set stays as a mechanism for future
    * genuinely-bounded emits. */
  private val boundedNotExact = Set.empty[String]

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name: identical result at shuffle=4 and shuffle=7") {
      val base = fingerprint(SparkEntry.queries(name)(spark, sf))
      val alt = fingerprint(SparkEntry.queries(name)(other, sf))
      if (boundedNotExact(name)) assert(base._1 == alt._1,
        s"$name row count depends on the shuffle partition count")
      else assert(base == alt,
        s"$name result depends on the shuffle partition count")
    }
  }
}
