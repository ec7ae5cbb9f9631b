package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates an intermediate array and runs the lambda interpreter per
  * element — measured as the bottleneck of the embedding-similarity
  * queries (hundreds of thousands of 64-dim products). This expression
  * generates a tight primitive loop inside whole-stage codegen: no
  * allocation, no virtual calls, same left-to-right double accumulation
  * order (bit-identical results to the fold, so oracle parity and the
  * brute-force/LSH rankings are unchanged).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double>; both entry points cast (apply() below
  // and the graft_dot registration builder), so array<float> inputs get
  // correct reads, never raw-byte getDouble misreads.
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point: dot(a, b); inputs are cast to
    * array<double> (exact for float embeddings).
    */
  def apply(a: Column, b: Column): Column =
    Shim.column(DotProduct(
      Shim.expression(a.cast("array<double>")),
      Shim.expression(b.cast("array<double>"))))
}
