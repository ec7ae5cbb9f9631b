package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters (top frequent strings) as a custom Catalyst
  * aggregate — a Misra-Gries summary per partition, merged by pointwise
  * count addition (the mergeable-summaries construction, Agarwal et al.,
  * PODS 2012).
  *
  * Why an aggregate EXPRESSION and not a groupBy: the exact formulation
  * (`groupBy(term).count.orderBy(desc).limit(k)`) shuffles every distinct
  * term — at 100 TB of text that is the full vocabulary, and the
  * aggregation state is O(distinct terms) per task. This sketch holds at
  * most `capacity` counters per partial buffer, ships `O(partitions ×
  * capacity)` bytes total, and guarantees every term with true frequency
  * > n/(capacity+1) survives with estimate error ≤ n/(capacity+1) — the
  * classic trade every corpus-analysis pipeline makes for "what are the
  * dominant tokens/domains/fingerprints".
  *
  * Determinism: per-partition updates fold in partition row order
  * (deterministic for a given input layout), and the merge is pointwise
  * addition over surviving keys — commutative and associative — so the
  * final estimates do not depend on the nondeterministic order in which
  * Spark merges partial buffers. Pruning to `capacity` happens only
  * inside partitions, and `eval` emits the top `emit` by (estimate DESC,
  * term ASC).
  *
  * Output: `array<struct<term string, est bigint>>`, size ≤ `emit`.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    emit: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0 && emit > 0 && emit <= capacity,
    "need 0 < emit <= capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < capacity => buf(s) = 1L
        case None =>
          // Misra-Gries step: decrement every counter, dropping zeros —
          // O(capacity), amortized O(1) per distinct-miss
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c == 0L) dead += k else buf(k) = c
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Pointwise addition, NO pruning: keeps the merge commutative and the
    * result independent of merge order; merged size is bounded by
    * (#partials × capacity), which eval reduces to `emit`.
    */
  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(emit)
    new GenericArrayData(top.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object HeavyHitters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Shim

  /** Column API: `heavyHitters($"term", capacity, emit)` as an aggregate
    * column usable in `agg(...)`.
    */
  def heavyHitters(c: Column, capacity: Int, emit: Int): Column =
    Shim.column(
      HeavyHitters(Shim.expression(c), capacity, emit).toAggregateExpression())
}
