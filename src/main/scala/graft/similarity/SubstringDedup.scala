package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Exact-substring dedup — the third grain in the dedup ladder, between
  * d01 (whole-doc exact) and d17 (fixed-chunk fuzzy): overlapping
  * stride-1 token windows, duplicated iff the EXACT window recurs in
  * another document. This is the windowed-hash approximation of the
  * suffix-array ExactSubstr pass ("Deduplicating Training Data Makes
  * Language Models Better", Lee et al. 2022): a cross-document repeat of
  * >= `w` tokens is caught regardless of alignment, because every
  * alignment is its own window. d17's non-overlapping chunks miss a
  * repeat that straddles a chunk boundary; stride-1 windows cannot.
  *
  * Consecutive duplicated windows merge into SPANS (the unit ExactSubstr
  * actually removes): a repeat of L >= w tokens produces L-w+1 adjacent
  * duplicated positions = one span of L tokens. The verdict reports
  * per-doc window/span counts plus the longest duplicated run so a
  * curation policy can either drop the doc (high dup fraction) or cut
  * the spans.
  *
  * Scale shape: one explode to (doc, pos, window-hash) — rows ∝ corpus
  * tokens, each carrying a fixed 32-hex key, never the window text —
  * then one map-side-combinable aggregate over hashes, one equi-join
  * back, and a per-document window function (bounded by doc length) for
  * the span merge. Nothing is all-pairs and nothing is quadratic in the
  * corpus; shuffle bytes ∝ tokens × 32 B. The true suffix array is a
  * single-machine construction; this windowed form is the one that
  * distributes.
  */
object SubstringDedup {

  /** (doc_id, pos, h): md5 of each `w`-token window at 1-based token
    * position `pos`, stride 1. Docs shorter than `w` tokens carry no
    * window and drop out (mirrors d17 dropping sub-shingle tails).
    */
  def windows(documents: DataFrame, w: Int): DataFrame = {
    require(w >= 2, s"window of $w tokens cannot catch a repeat")
    val t = TextFns.tokens(col("text"))
    documents
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("t")) - (w - 1)),
          i => md5(concat_ws(" ", slice(col("t"), i, lit(w))).cast("binary")))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("h"))
  }

  /** Per-document verdict: window count, duplicated-window count (hash
    * shared with at least one OTHER document — an in-doc repeat alone is
    * not duplication), span count (maximal runs of consecutive
    * duplicated positions), longest duplicated span in TOKENS
    * (run_length + w - 1), duplicate fraction (raw double — caller
    * applies its rounding parity), and keep = dup_frac < keepBelow.
    */
  def verdict(documents: DataFrame, w: Int = 15,
              keepBelow: Double = 0.5): DataFrame = {
    val win = graft.CacheRegistry.track(windows(documents, w).cache())
    // cross-doc duplication via aggregate + equi-join (same shape as
    // ParagraphDedup: map-side combinable, join key is the fixed-width
    // hash, duplicated hashes are the rare case)
    val dup = win.groupBy("h")
      .agg(countDistinct("doc_id").as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("h"), lit(true).as("__dup"))
    val marked = win.join(dup, Seq("h"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("__dup"), lit(false)).as("is_dup"))
    val totals = marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_windows"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_windows"))
    // gaps-and-islands span merge: consecutive dup positions share
    // (pos - row_number) within a doc. The window is per-document — its
    // cost is bounded by the longest document, not the corpus.
    val grp = Window.partitionBy("doc_id").orderBy("pos")
    val spans = marked.filter(col("is_dup"))
      .withColumn("__g", col("pos") - row_number().over(grp))
      .groupBy("doc_id", "__g").agg(count(lit(1)).as("__run"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_spans"),
        (max(col("__run")) + (w - 1)).as("max_span_tokens"))
    totals.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        (col("n_dup_windows").cast("double") / col("n_windows")).as("dup_frac"),
        (col("n_dup_windows").cast("double") / col("n_windows") < keepBelow).as("keep"))
  }
}
