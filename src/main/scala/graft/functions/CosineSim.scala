package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst cosine similarity over two `array<double>` columns —
  * the fused form of `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`.
  *
  * The three-[[DotProduct]] composition traverses each array three times
  * per pair; candidate scoring is O(candidate pairs) traversals, the hot
  * loop of every similarity query. This expression makes ONE pass with
  * three accumulators (plus tail loops when lengths differ: the dot runs
  * to min(len), each norm over its FULL array, exactly like the composed
  * form and the oracle). Each accumulator folds left-to-right exactly
  * like its standalone dot product, and the final combine uses the same
  * association `dot / (sqrt(na) * sqrt(nb))` — so results are
  * bit-identical to the composed form and the DuckDB oracle's three
  * index-order `list_sum`s (oracle parity unchanged).
  *
  * Inputs must be array<double>; both entry points cast — [[apply]] on
  * the DataFrame side, the `graft_cosine` registration builder on the SQL
  * side — so array<float> embeddings get correct reads, never raw-byte
  * getDouble misreads.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    while (i < nx) { val xi = x.getDouble(i); na += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getDouble(i); nb += yi * yi; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |for (; $i < $nx; $i++) { double $xi = $a.getDouble($i); $na += $xi * $xi; }
         |for ($i = $n; $i < $ny; $i++) { double $yi = $b.getDouble($i); $nb += $yi * $yi; }
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-level entry point: cosine(a, b); inputs are cast to
    * array<double> (exact for float embeddings).
    */
  def apply(a: Column, b: Column): Column =
    Shim.column(CosineSim(
      Shim.expression(a.cast("array<double>")),
      Shim.expression(b.cast("array<double>"))))
}
