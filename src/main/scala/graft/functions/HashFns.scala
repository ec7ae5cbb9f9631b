package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-based dedup primitives: shingling, MinHash, SimHash.
  *
  * All hashing routes through md5 (portable: identical hex output in every
  * engine) rather than engine-private hash functions, so oracle SQL can
  * reproduce signatures bit-for-bit. At 100 TB these run as
  * explode → hash-aggregate pipelines with map-side partial aggregation;
  * candidate generation is always via equi-join on shingle/band keys —
  * never an all-pairs cross join.
  */
object HashFns {

  /** Word 3-gram shingles (distinct), as an array column. Caller must
    * filter docs with fewer than 3 tokens first (sequence() needs a
    * non-negative range).
    */
  def shingles3(toks: Column): Column =
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ",
          element_at(toks, i + 1),
          element_at(toks, i + 2),
          element_at(toks, i + 3))))

  /** Exploded (doc_id, shingle) pairs for docs with >= 3 tokens. */
  def explodedShingles(documents: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    documents
      .filter(size(toks) >= 3)
      .select(col("doc_id"), explode(shingles3(toks)).as("s"))
  }

  /** The i-th MinHash function: lexicographic min over shingles of
    * md5("<i>|" + shingle). md5-keyed so SQL oracles can reproduce it.
    */
  def minhashCol(i: Int): Column =
    min(md5(concat(lit(s"$i|"), col("s")).cast("binary"))).as(s"h$i")

  /** MinHash signatures: one row per doc, columns h0..h<k-1>. */
  def minhashSignatures(documents: DataFrame, k: Int): DataFrame =
    explodedShingles(documents)
      .groupBy("doc_id")
      .agg(minhashCol(0), (1 until k).map(minhashCol): _*)

  /** LSH band keys from a signature frame: `bands` bands of `rows` hashes
    * each; band key = md5("<band>|" + h_i + .. + h_j). Output:
    * (doc_id, band, key) — join on (band, key) to get candidate pairs.
    */
  def bandKeys(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    val banded = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"h$i"))
      sig.select(
        col("doc_id"),
        lit(b).as("band"),
        md5(concat_ws("|", cols: _*).cast("binary")).as("key"))
    }
    banded.reduce(_ unionByName _)
  }

  /** 60-bit integer hash of a token from its md5 prefix (15 hex chars) —
    * `conv(hex,16,10)`; SQL mirror: `('0x' || substr(md5(t),1,15))::BIGINT`.
    */
  def tokenHash60(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")

  /** `bits`-bit SimHash over the distinct tokens of each doc: per bit
    * position sum +1/-1 over token-hash bits, set the bit if the sum is
    * positive. Returns (doc_id, simhash) with one hash-aggregate pass.
    */
  def simhash(documents: DataFrame, bits: Int): DataFrame = {
    val hv = tokenHash60(col("t"))
    val sums = (0 until bits).map { j =>
      sum(when(shiftright(hv, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sim = (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    documents
      .select(col("doc_id"), explode(array_distinct(TextFns.tokens(col("text")))).as("t"))
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }
}
