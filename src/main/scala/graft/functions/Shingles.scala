package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static shingling kernel called from generated code. */
object ShingleOps {
  /** Word k-shingles over single-space-tokenized text; fewer than k
    * tokens degenerates to the whole text (mirrors the declarative
    * `when(size(toks) >= k, ...) otherwise array(text)` formulation). */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) {
      new GenericArrayData(Array[Any](text.copy()))
    } else {
      val n = toks.length - k + 1
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

object CharGramOps {
  /** Char n-grams with the reference's quirky bounds (Utils.scala:40-52
    * gramsByN): 1-based start positions 2..len-n — the first char never
    * starts a gram and the last gram stops one short, so gram count =
    * len-n-1; strings shorter than n+2 yield no grams. */
  def charGrams(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len < n + 2) new GenericArrayData(Array.empty[Any])
    else {
      val count = len - n - 1
      val out = new Array[Any](count)
      var i = 0
      while (i < count) { out(i) = text.substringSQL(i + 2, n); i += 1 }
      new GenericArrayData(out)
    }
  }
}

/** `char_grams(text, n)` → array<string>, codegen'd — replaces the
  * interpreted transform(sequence(...), substr) higher-order pipeline
  * in the candidate-featurization hot path (hundreds of grams per row
  * × corpus size). n is fixed at plan time. */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    CharGramOps.charGrams(text.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharGramOps.charGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharGrams = copy(child = c)
}

object CharGrams {
  def charGrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CharGrams(org.apache.spark.sql.graft.ColumnBridge.expression(c), n))
}

/** `word_shingles(text, k)` → array<string> as a native codegen'd
  * expression — replaces the interpreted transform/element_at
  * higher-order pipeline in the MinHash/Jaccard hot path (per-row
  * object churn × corpus size). k is fixed at plan time. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    ShingleOps.wordShingles(text.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.wordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object WordShingles {
  def wordShingles(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WordShingles(org.apache.spark.sql.graft.ColumnBridge.expression(c), k))
}
