package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static numeric kernels called from generated code. */
object VectorOps {
  /** Left-to-right dot product of two double arrays — the pinned
    * accumulation order the DuckDB oracles replicate with
    * `list_reduce`. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** `dot_product(array<double>, array<double>) → double` as a native
  * Catalyst expression: `doGenCode` emits a direct static call, so the
  * O(dim) inner loop runs inside whole-stage codegen instead of the
  * interpreted `zip_with`+`aggregate` higher-order pipeline (which
  * allocates an intermediate array per row). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(l, r)
}

object DotProduct {
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
