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

  /** The ONE place the hash seed and bit sizing live: both the Column
    * API below and the SQL surface (`graft_bloom_agg` /
    * `graft_might_contain` in GraftExtensions) build through these, so
    * a filter built on either surface probes correctly on the other —
    * seed or sizing drift between the two would surface as false
    * negatives, the one error class a Bloom filter must never have.
    */
  private[graft] def mkAgg(
      key: org.apache.spark.sql.catalyst.expressions.Expression,
      expectedItems: Long, fpp: Double)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate clamps its sizing to the session's runtime-
    // filter caps with Math.min — SILENTLY, which would realize a worse
    // fpp than requested exactly when the build side is large. Fail loud
    // instead: the caller must raise the conf (or accept a larger fpp)
    // knowingly, because exactness downstream relies only on the confirm
    // join but the shuffle-volume win relies on the requested fpp.
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxBits = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val maxItems = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    require(numBits <= maxBits && expectedItems <= maxItems,
      s"Bloom sizing (items=$expectedItems, bits=$numBits for fpp=$fpp) exceeds " +
      s"the session caps (maxNumItems=$maxItems, maxNumBits=$maxBits); Spark " +
      "would silently clamp and weaken the fpp. Raise spark.sql.optimizer." +
      "runtime.bloomFilter.{maxNumItems,maxNumBits} or request a larger fpp.")
    new BloomFilterAggregate(new XxHash64(Seq(key), 42L),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
  }

  private[graft] def mkMightContain(
      filter: org.apache.spark.sql.catalyst.expressions.Expression,
      value: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    BloomFilterMightContain(filter, new XxHash64(Seq(value), 42L))

  /** Aggregate column building a Bloom filter (serialized binary) over
    * `xxhash64(c)`. Mergeable partials — a map-side-combinable
    * `TypedImperativeAggregate`, one small binary to the driver.
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    Shim.column(mkAgg(Shim.expression(c), expectedItems, fpp))

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
        Shim.column(mkMightContain(Literal(bytes, BinaryType), Shim.expression(c)))
      case None => org.apache.spark.sql.functions.lit(false)
    }
}
