package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of a grid cell: (x, y) → distance along the
  * order-`order` Hilbert walk (the classic iterative quadrant-rotation
  * algorithm).
  *
  * Why an Expression and not a column formula: the per-round recurrence
  * feeds x and y into several CASE branches of the NEXT round, so an
  * unrolled Column expression duplicates each round's subtrees into the
  * next — the tree grows exponentially with the order (measured: minutes
  * of driver-side analysis at order 8 for a data-independent plan). As a
  * codegen'd primitive the whole walk is a constant-size tight integer
  * loop per row — the same shape LongArrayDot uses, inside whole-stage
  * codegen, no shuffle.
  *
  * The DuckDB oracle runs the identical recurrence as chained CTE rounds
  * (Extras9.hilbertRoundsSql), so the cross-engine check still covers the
  * math with two independent implementations.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31, s"hilbert order $order out of range")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT args, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.walk(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex.walk($a, $b, $order);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column-API entry point; x and y must be BIGINT in [0, 2^order). */
  def hilbert(x: Column, y: Column, order: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y), order))

  /** Shared by eval and generated code (public + Java-callable). Inputs
    * outside the grid are masked to it (callers pmod first anyway). */
  def walk(xIn: Long, yIn: Long, order: Int): Long = {
    val mask = (1L << order) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the walk stays contiguous
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
