package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of N grid cells — the locality-preserving
  * alternative to the Morton code for multi-dimensional clustering
  * (Databricks' liquid clustering and Iceberg's hilbert-sort use the
  * same curve for the same reason): consecutive curve positions are
  * ALWAYS adjacent cells, so range-partitioning a table on the index
  * yields file bounding boxes with strictly better worst-case aspect
  * ratios than Morton's (which jumps across the space at power-of-two
  * boundaries).
  *
  * Algorithm: Skilling's transpose method (J. Skilling, "Programming
  * the Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard
  * public-domain construction): Gray-decode + axis exchange/invert per
  * bit plane, then interleave the transposed axes MSB-first.
  */
object Hilbert {

  /** Hilbert index of cell `coords` (each 0 ≤ c < 2^bits). Mutates a
    * COPY — callers' arrays are untouched. n·bits must be ≤ 63.
    */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = java.util.Arrays.copyOf(coords, n)
    // axes → transpose (Skilling): inverse-undo then Gray
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p // invert low bits of axis 0
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave transposed bits MSB-first: bit j of axis i lands ahead
    // of bit j of axis i+1
    var out = 0L
    var j = bits - 1
    while (j >= 0) {
      var d = 0
      while (d < n) { out = (out << 1) | ((x(d) >>> j) & 1L); d += 1 }
      j -= 1
    }
    out
  }
}

/** `hilbert_index(bits, c0, c1, …)` as a codegen'd Catalyst expression:
  * evaluates [[Hilbert.index]] over the child cell values per row — a
  * static-method call from generated code, no boxing beyond the one
  * coords array, no UDF machinery. NULL cells pin to 0 (mirroring
  * [[graft.sources.Layout]]'s NULL convention) so the expression never
  * returns NULL and the range exchange downstream sees a total order.
  */
case class HilbertIndex(bits: Int, children: Seq[Expression])
    extends Expression {
  require(children.nonEmpty && children.size <= 8,
    s"hilbert_index supports 1..8 dimensions, got ${children.size}")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits=$bits over ${children.size} dims overflows a long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.find(_.dataType != LongType)
    if (bad.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_index needs LONG cells, got ${bad.get.dataType.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      coords(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    Hilbert.index(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hilbertCoords")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      code"""
        ${e.code}
        $arr[$i] = ${e.isNull} ? 0L : ${e.value};"""
    }.reduce(_ + _)
    ev.copy(
      code = code"""
        long[] $arr = new long[${children.size}];
        $fills
        long ${ev.value} = graft.functions.Hilbert.index($arr, $bits);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
