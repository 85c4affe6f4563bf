package graft

import org.apache.spark.sql.DataFrame

/** Shared materialization boundary for every graded operator (round-15
  * ADVICE, medium): `DuckCast.rewrite` transforms only the FINAL
  * analyzed plan, so a decimal→double emission inside a stage that an
  * operator materializes early — `localCheckpoint()` in a driver loop
  * or shared-subtree cut — executed with Spark's NATIVE cast and was
  * invisible to both the twin and FenceProbe. `duckCkpt` closes that
  * hole at the single choke point all operators share: it applies the
  * emission twin BEFORE checkpointing, so the frozen rows already
  * carry DuckDB's conversion semantics at any magnitude. (Streaming
  * sinks, the other materialization boundary, get the same treatment
  * in StreamOps' runners.) Safe by DuckCast's monotonicity argument:
  * below 2^53 the twin IS the native cast bit-for-bit; above, it is
  * what the DuckDB oracle emits.
  */
package object operators {
  implicit final class DuckCkptOps(private val df: DataFrame)
      extends AnyVal {
    def duckCkpt(): DataFrame =
      DuckCast.rewrite(df.sparkSession, df).localCheckpoint()
  }
}
