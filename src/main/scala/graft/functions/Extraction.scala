package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static extraction kernel called from generated code — one regex pass
  * per row, no boxing beyond the result array.
  *
  * Semantics follow the reference price-candidate scanner
  * (um/re/utils/PriceParcer.scala:15-37 `findFast`): every
  * non-overlapping match of `([0-9,\.]*[0-9])(?:[^0-9,\.])`, with the
  * ±50-char snippets and the 0-based match start as location. The
  * trailing non-numeric char is consumed by the match (so a number at
  * end-of-input is NOT a candidate) and is included as the first char
  * of `text_after` — both reference quirks preserved.
  */
object PriceExtract {
  private val SnippetSize = 50
  private val NumPattern = java.util.regex.Pattern.compile("([0-9,\\.]*[0-9])(?:[^0-9,\\.])")

  def extract(html: UTF8String): ArrayData = {
    val s = html.toString
    val m = NumPattern.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (m.find()) {
      val price = m.group(1)
      val start = m.start
      val end = m.end
      val before = s.substring(math.max(start - SnippetSize, 0), start)
      val after = s.substring(end - 1, math.min(end + SnippetSize - 1, s.length))
      out += InternalRow(
        UTF8String.fromString(price),
        UTF8String.fromString(before),
        UTF8String.fromString(after),
        start)
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `price_candidates(html)` →
  * `array<struct<candidate,text_before,text_after,location>>`.
  *
  * A native Catalyst expression (not a UDF): `doGenCode` emits a direct
  * static call into [[PriceExtract]], so the extraction stays inside
  * whole-stage codegen — no serialization, no Row boxing, safe to run
  * in the 100 TB scan stage. */
case class PriceCandidates(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PriceCandidates.schema
  override def nullSafeEval(html: Any): Any =
    PriceExtract.extract(html.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PriceExtract.extract($c)")
  override protected def withNewChildInternal(c: Expression): PriceCandidates = copy(c)
}

object PriceCandidates {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("candidate", StringType, nullable = false),
    StructField("text_before", StringType, nullable = false),
    StructField("text_after", StringType, nullable = false),
    StructField("location", IntegerType, nullable = false))), containsNull = false)

  /** Column-API entry point (Spark 4 classic Column↔Expression bridge). */
  def priceCandidates(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PriceCandidates(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
