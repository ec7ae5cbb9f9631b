package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions: dot product, norm, cosine similarity
  * over `array<float>`/`array<double>` columns.
  *
  * Built on the higher-order functions `zip_with` + `aggregate` (codegen'd,
  * no UDF, no driver round-trips). Inputs are cast to array<double> first so
  * accumulation happens in double precision with left-to-right order —
  * deterministic and reproducible by a SQL oracle summing in index order.
  */
object VecFns {

  /** Cast to array<double> (exact for float inputs). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: sum_i a(i)*b(i), left-to-right. Backed by the native
    * codegen'd [[DotProduct]] expression; accumulation order (and hence
    * the exact double result) matches the equivalent
    * `aggregate(zip_with(..))` fold and the SQL oracle's index-order sum.
    */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity in double precision. Backed by the fused
    * [[CosineSim]] expression: one array pass with three accumulators
    * instead of three [[DotProduct]] traversals, bit-identical results
    * (same per-accumulator fold order and final association).
    */
  def cosine(a: Column, b: Column): Column = CosineSim(a, b)
}
