package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Pins graft.DuckCast's emission twin to DUCKDB-COMPUTED constants
  * (each expected double below is the literal output of
  * `SELECT CAST(CAST(... AS DECIMAL(p,s)) AS DOUBLE)` in duckdb 1.x;
  * the model was additionally fuzz-validated on 240k+ random values —
  * DuckCast.scala scaladoc). Covers: sub-2^53 (twin == native cast),
  * 2^53+1 (first inexact), >2^64 both signs (the limb path, where the
  * naive models disagree with DuckDB), the upper==-1 special case,
  * a 36-digit hugeint, scaled decimal(38,4) both signs, and int64-
  * storage decimal(18,s) both signs. */
class DuckCastSpec extends QuerySuiteBase {

  // (unscaled-value string, scale, precision, duckdb double)
  private val cases: Seq[(String, Int, Int, Double)] = Seq(
    ("92233720368547758", 0, 38, 9.223372036854776e+16),
    ("9007199254740993", 0, 38, 9007199254740992.0),
    ("29492801096498034064", 0, 38, 2.9492801096498037e+19),
    ("-29492801096498034064", 0, 38, -2.9492801096498033e+19),
    ("-62732000679864428", 0, 38, -6.2732000679864424e+16),
    ("646040157072047817590359375624573390", 0, 38, 6.460401570720478e+35),
    ("5978102397715941016746", 4, 38, 5.978102397715941e+17),
    ("-5978102397715941016747", 4, 38, -5.978102397715941e+17),
    ("12345678901234567", 2, 18, 123456789012345.69),
    ("-9876543210987654", 4, 18, -987654321098.7654)
  )

  test("duckTwin equals DuckDB's cast on pinned boundary values") {
    cases.foreach { case (u, s, p, expect) =>
      val v = new java.math.BigDecimal(new java.math.BigInteger(u), s)
      val df = spark.range(1).select(
        lit(v).cast(DecimalType(p, s)).as("x"))
      val expr = DuckCast.duckTwin(
        ColumnBridge.expression(col("x")), DecimalType(p, s))
      val got = df.select(ColumnBridge.column(expr).as("d"))
        .head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(expect),
        s"u=$u s=$s p=$p got=$got expect=$expect")
    }
  }

  test("rewrite leaves sub-2^53 emissions bit-identical to native cast") {
    val df = spark.range(1, 1000).select(
      (col("id") * col("id") * 37).cast(DecimalType(38, 0)).as("x"),
      (col("id").cast(DecimalType(18, 6)) / 7).as("y"))
    val native = df.select(col("x").cast("double").as("a"),
      col("y").cast("double").as("b"))
    val twinned = DuckCast.rewrite(spark, native)
    val n = native.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val t = twinned.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(n.sameElements(t))
  }

  test("rewrite fires on decimal casts and is applied to graded keys") {
    // a key from the round-15 decimal sweep (grubbs sat at 4.7e24):
    // every decimal->double cast left in its wrapped plan must be a
    // twin INTERNAL (Pmod-limb or the upper==-1 complement — both
    // bounded < 2^64, the correctly-rounded-on-both-engines range);
    // no RAW operand may reach a bare cast
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Pmod,
      Subtract}
    import org.apache.spark.sql.types.{Decimal, DoubleType}
    // Twin internals are recognized by their FULL structural shape
    // including the 2^64 / 2^64−1 literals (round-15 ADVICE: an
    // any-Pmod whitelist would silently exempt a raw operator's own
    // modulus-bucketing cast from the no-bare-cast assertion).
    val two64 = Decimal(BigDecimal(2).pow(64))
    val two64m1 = Decimal(BigDecimal(2).pow(64) - 1)
    def isTwinInternal(c: org.apache.spark.sql.catalyst.expressions.Expression)
        : Boolean = c match {
      // lo limb: Pmod(u, 2^64)
      case Pmod(_, Literal(v: Decimal, _), _) => v == two64
      // upper==−1 branch: (2^64−1) − Pmod(u, 2^64)
      case Subtract(Literal(v1: Decimal, _),
          Pmod(_, Literal(v2: Decimal, _), _), _) =>
        v1 == two64m1 && v2 == two64
      case _ => false
    }
    def bareCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
      var bare = 0
      p.foreach(op => op.expressions.foreach(_.foreach {
        case Cast(c, DoubleType, _, _)
            if c.dataType.isInstanceOf[DecimalType] =>
          if (!isTwinInternal(c)) bare += 1
        case _ => ()
      }))
      bare
    }
    val raw = SparkEntry.rawQueries("q_agg_grubbs")(spark, sf)
      .queryExecution.analyzed
    val wrapped = SparkEntry.queries("q_agg_grubbs")(spark, sf)
      .queryExecution.analyzed
    assert(bareCount(raw) > 0, "probe key lost its decimal emissions")
    assert(bareCount(wrapped) == 0,
      s"${bareCount(wrapped)} bare decimal->double casts survived rewrite")
  }
}
