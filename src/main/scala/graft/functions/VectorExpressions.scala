package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The higher-order-function form
  * (`aggregate(zip_with(a,b,(x,y)=>x*y),0d,_+_)`) is semantically identical
  * but interpreted (HOFs are CodegenFallback in Spark), which made the
  * all-pairs cosine queries the bench hotspot (~3µs/pair at 64 dims). This
  * expression generates a tight primitive loop inside whole-stage codegen —
  * the SURVEY §7 "benchmark-gated custom Expression" upgrade path: compose
  * builtins first, drop to a native Expression only where measured.
  *
  * Summation order is the same left-to-right fold as the HOF form and the
  * DuckDB oracle's loop, so results stay bit-identical.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level entry: codegen'd dot(a, b) for array<double> columns. */
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
