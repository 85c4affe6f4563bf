package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Shared in-group pair enumeration (round 16) — the basket/co-occurrence
  * sibling of LlmOps.postingPairs: (key, value) rows become every
  * distinct value pair within a key group, WITHOUT a self-equi-join.
  *
  * Why not the join: a self-join on the group key shuffles the relation
  * twice more (join exchange per side, the input distinct a third) and
  * pays a sort-merge; this kernel pays ONE explicit hash repartition on
  * the key plus the downstream pair aggregate. The repartition is pinned
  * at the session's core parallelism because the enumeration emits
  * C(m,2) rows per group — superlinear per input byte — so AQE's
  * byte-based coalescing would serialize it onto one core at bench scale
  * (the postingPairs lesson, measured in round 16). Candidate volume is
  * Σ group², exactly as the join formulation — never |values|².
  *
  * The per-run sort means values arrive ordered: adjacent duplicates
  * collapse (the input distinct fused into the kernel) and pairs emit
  * (lo, hi)-normalized, so downstream order-free aggregates see the
  * identical multiset the distinct + a<b join produced.
  */
object PairKernel {

  /** Hot-key guard (round-17, verdict item 9): one group's DISTINCT values
    * buffer in a single task's ArrayBuffer, and the group emits C(m,2)
    * pairs — a degenerate key (one basket holding millions of items, one
    * shingle present in every document) would both pressure task memory
    * (§5) and serialize a quadratic enumeration no exact formulation can
    * parallelize. Past this bound the kernel fails LOUDLY with the routed
    * answer (the MinHash-LSH family is the 100 TB path for that corpus
    * shape) instead of grinding into an hours-long single task or an OOM.
    * 2^22 distinct values ≈ 64 MB buffered and ≈ 8.8e12 pairs — already
    * far past any feasible exact all-pairs budget, so the guard can never
    * clip a workload the kernel could actually serve. */
  private[operators] val MaxGroupValues: Int = 1 << 22

  private[operators] def guardGroup(key: Any, m: Int): Unit =
    if (m > MaxGroupValues) sys.error(
      s"PairKernel: group '$key' has $m distinct values (> $MaxGroupValues);" +
        " exact C(m,2) enumeration is infeasible for a key this hot —" +
        " route this corpus shape to the MinHash-LSH family instead")

  /** @param rel   two-column relation (key, value), both LONG
    * @param both  also emit (hi, lo) — the directed-rules variant
    * @return (a, b) pair instances, one per co-occurrence */
  def groupedPairs(rel: DataFrame, both: Boolean = false): DataFrame = {
    val s = rel.sparkSession
    import s.implicits._
    val c = rel.columns
    val p = s.sparkContext.defaultParallelism
    val ds: Dataset[(Long, Long)] = rel
      .repartition(p, col(c(0)))
      .sortWithinPartitions(col(c(0)), col(c(1)))
      .as[(Long, Long)]
    ds.mapPartitions { rows =>
      val buf = rows.buffered
      new Iterator[(Long, Long)] {
        private var out: Iterator[(Long, Long)] = Iterator.empty
        private def advance(): Unit =
          while (!out.hasNext && buf.hasNext) {
            val key = buf.head._1
            val v = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (buf.hasNext && buf.head._1 == key) {
              val x = buf.next()._2
              if (v.isEmpty || v.last != x) v += x // sorted: dedup adjacent
            }
            guardGroup(key, v.length)
            if (v.length >= 2) {
              val up = for {
                i <- v.indices.iterator
                j <- (i + 1 until v.length).iterator
              } yield (v(i), v(j))
              out = if (both)
                up.flatMap(t => Iterator(t, (t._2, t._1)))
              else up
            }
          }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): (Long, Long) = { advance(); out.next() }
      }
    }.toDF("a", "b")
      // the pair-count merge must not ride a byte-coalesced AQE read
      // either (same postingPairs measurement): this satisfies the
      // downstream aggregate's required distribution — one shuffle,
      // parallel final merge.
      .repartition(p, col("a"), col("b"))
  }

  /** String-valued variant (brand baskets). Values are ASCII dimension
    * labels, where JVM String ordering equals the UTF8String binary
    * ordering the column sort used — the (lo, hi) normalization is
    * engine-identical. */
  def groupedPairsStr(rel: DataFrame, both: Boolean = false): DataFrame = {
    val s = rel.sparkSession
    import s.implicits._
    val c = rel.columns
    val p = s.sparkContext.defaultParallelism
    val ds: Dataset[(Long, String)] = rel
      .repartition(p, col(c(0)))
      .sortWithinPartitions(col(c(0)), col(c(1)))
      .as[(Long, String)]
    ds.mapPartitions { rows =>
      val buf = rows.buffered
      new Iterator[(String, String)] {
        private var out: Iterator[(String, String)] = Iterator.empty
        private def advance(): Unit =
          while (!out.hasNext && buf.hasNext) {
            val key = buf.head._1
            val v = scala.collection.mutable.ArrayBuffer.empty[String]
            while (buf.hasNext && buf.head._1 == key) {
              val x = buf.next()._2
              if (v.isEmpty || v.last != x) v += x // sorted: dedup adjacent
            }
            guardGroup(key, v.length)
            if (v.length >= 2) {
              val up = for {
                i <- v.indices.iterator
                j <- (i + 1 until v.length).iterator
              } yield (v(i), v(j))
              out = if (both)
                up.flatMap(t => Iterator(t, (t._2, t._1)))
              else up
            }
          }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): (String, String) = { advance(); out.next() }
      }
    }.toDF("a", "b")
      .repartition(p, col("a"), col("b"))
  }
}
