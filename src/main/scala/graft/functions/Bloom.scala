package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter pre-filtering — the explicit-operator form of
  * the runtime-filter pattern Spark's `InjectRuntimeFilter` applies to
  * shuffle joins, built on the same Catalyst pieces
  * (`BloomFilterAggregate` to build, `BloomFilterMightContain` to probe,
  * both over `xxhash64` of the key).
  *
  * Scale story (the reason this exists as a first-class operator): when a
  * huge probe side joins a small-but-not-tiny build side — benchmark
  * decontamination over a 100 TB corpus is the canonical case — the
  * filter is a few MB regardless of probe size, ships to every executor
  * once, and its `might_contain` probe is a codegen'd predicate evaluated
  * INSIDE the probe-side scan stage, before the shuffle. No false
  * negatives (every build key passes), so composing it with an exact
  * confirm join afterwards preserves exact semantics while the shuffle
  * moves only the ~fpp fraction of non-matching rows.
  */
object BloomFns {

  /** Aggregate column building a Bloom filter (serialized binary) over
    * `xxhash64(c)`. Mergeable partials — a map-side-combinable
    * `TypedImperativeAggregate`, one small binary to the driver.
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val child = new XxHash64(Seq(Shim.expression(c)), 42L)
    Shim.column(new BloomFilterAggregate(
      child, Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Build the serialized filter over `keys`'s `c` column. Runs one
    * aggregate job; only the sketch (≈`1.2·n·log2(1/fpp)` bits) reaches
    * the driver. Returns None for an empty build side (Spark's aggregate
    * yields NULL there) — the caller's contract is "nothing can match".
    */
  def buildFilter(keys: DataFrame, c: Column,
                  expectedItems: Long, fpp: Double): Option[Array[Byte]] =
    Option(keys.agg(bloomAgg(c, expectedItems, fpp)).head.getAs[Array[Byte]](0))

  /** Codegen'd `might_contain` predicate over a pre-built filter: true ⇒
    * maybe present, false ⇒ DEFINITELY absent. The serialized filter is
    * embedded as a binary literal, deserialized once per task, not per
    * row. `None` (empty build side) yields `false` — nothing matches.
    */
  def mightContain(filter: Option[Array[Byte]], c: Column): Column =
    filter match {
      case Some(bytes) =>
        Shim.column(BloomFilterMightContain(
          Literal(bytes, BinaryType), new XxHash64(Seq(Shim.expression(c)), 42L)))
      case None => org.apache.spark.sql.functions.lit(false)
    }
}
