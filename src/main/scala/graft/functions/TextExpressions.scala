package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-token shingles of a space-separated string, as one native expression.
  *
  * Semantically identical to
  * `transform(sequence(1, size(t)-k+1), i -> concat_ws(' ', t[i..i+k-1]))`
  * over `t = split(text, ' ')`, but the HOF chain is interpreted per
  * element (transform/element_at are CodegenFallback) and dominated the
  * shingle-dedup bench queries. One primitive pass here; empty result for
  * strings with fewer than k tokens (the HOF form's filtered guard).
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = tokens.length - k + 1
    if (n <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder(tokens(i))
        var j = 1
        while (j < k) { sb.append(' ').append(tokens(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object TextExpressions {
  def shingles(text: Column, k: Int = 3): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(text), k))
}
