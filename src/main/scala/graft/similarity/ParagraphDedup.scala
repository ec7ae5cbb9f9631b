package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFns, TextFns}

/** Paragraph-grain fuzzy dedup — the CCNet/RefinedWeb-style pass a
  * pretraining pipeline runs between doc-exact dedup (d01) and doc-fuzzy
  * MinHash (d03): boilerplate and templated spans repeat across documents
  * that are NOT near-duplicates as wholes, so the span grain catches what
  * both doc-grain passes miss.
  *
  * The corpus' documents are single-line token streams (no \n\n), so the
  * "paragraph" is a fixed token-count chunk (`paraSize`) — the span
  * blocking CCNet applies to paragraph breaks, applied to windows.
  * Each paragraph gets a k=4 MinHash signature (md5-sliced like
  * HashFns.minhashSignatures, so a SQL oracle reproduces it
  * bit-for-bit); two paragraphs are fuzzy-equal iff their FULL
  * signatures match — near-identical chunks collide, unrelated chunks
  * collide with probability ~2^-128.
  *
  * Scale shape: explode to (doc, para, shingle) → one hash-aggregate to
  * signatures (map-side combinable) → one grouped count over signatures →
  * one equi-join back. Nothing is all-pairs; the signature join key is
  * 32 fixed hex chars. At 100 TB this is the same two-aggregate +
  * equi-join pipeline as doc-grain MinHash, ~5× the row count (one row
  * per paragraph instead of per doc).
  */
object ParagraphDedup {

  /** Fixed-size token chunks: (doc_id, para_idx, ptoks). Chunks shorter
    * than 3 tokens (tail of a document) carry no 3-shingle and are
    * dropped — n_paras downstream counts signature-bearing chunks.
    */
  def paragraphs(documents: DataFrame, paraSize: Int): DataFrame = {
    require(paraSize >= 3, "a paragraph must fit at least one 3-shingle")
    val toks = TextFns.tokens(col("text"))
    val nP = floor((size(toks) + lit(paraSize - 1)) / lit(paraSize)).cast("int")
    documents
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nP - 1),
          i => slice(toks, i * paraSize + 1, lit(paraSize)))))
      .filter(size(col("col")) >= 3)
      .select(col("doc_id"), col("pos").cast("long").as("para_idx"),
        col("col").as("ptoks"))
  }

  /** k=4 MinHash signature per paragraph, as ONE 32-hex-char key (the
    * four 8-char md5 slices concatenated — fixed width, so minima and
    * equality behave identically to the tuple form but shuffle cheaper).
    */
  def signatures(documents: DataFrame, paraSize: Int): DataFrame =
    signaturesOfChunks(paragraphs(documents, paraSize))

  /** [[signatures]] from an already-chunked (doc_id, para_idx, ptoks)
    * frame — lets [[removeBoilerplate]] tokenize the corpus ONCE and
    * feed both its chunk and signature branches from the same frame.
    * Sub-3-token chunks carry no 3-shingle and are filtered here.
    */
  private def signaturesOfChunks(chunks: DataFrame): DataFrame = {
    val d = md5(col("s").cast("binary"))
    chunks
      .filter(size(col("ptoks")) >= 3)
      .select(col("doc_id"), col("para_idx"),
        explode(HashFns.shingles3(col("ptoks"))).as("s"))
      .groupBy("doc_id", "para_idx")
      .agg(concat(
        min(substring(d, 1, 8)), min(substring(d, 9, 8)),
        min(substring(d, 17, 8)), min(substring(d, 25, 8))).as("sig"))
  }

  /** Per-document verdict: paragraph count, duplicate-paragraph count
    * (signature shared with at least one OTHER document), duplicate
    * fraction (raw double — caller applies its rounding parity), and
    * the keep decision (`dup_frac < keepBelow`).
    */
  def verdict(documents: DataFrame, paraSize: Int = 20,
              keepBelow: Double = 0.5): DataFrame = {
    val sigs = graft.CacheRegistry.track(
      signatures(documents, paraSize).cache())
    // cross-doc rule via aggregate + equi-join (Spark has no
    // count-distinct window; the aggregate is map-side combinable and
    // the join key is the signature — no skew, dup signatures are rare)
    val dupSigs = sigs.groupBy("sig")
      .agg(countDistinct("doc_id").as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("sig"), lit(true).as("__dup"))
    sigs.join(dupSigs, Seq("sig"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_paras"))
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
        (col("n_dup_paras").cast("double") / col("n_paras")).as("dup_frac"),
        (col("n_dup_paras").cast("double") / col("n_paras") < keepBelow)
          .as("keep"))
  }

  /** Cross-document boilerplate REMOVAL — where [[verdict]] scores a
    * document, this rewrites it (the CCNet deduplicated-output pass:
    * headers, footers, templated spans recur across many documents that
    * are not near-duplicates as wholes; dropping the repeated spans and
    * keeping the rest salvages the document instead of discarding it).
    * A chunk is removed iff its MinHash signature occurs in at least
    * `minDocs` DISTINCT documents; the signature-less short tail chunk
    * (< one 3-shingle) is always kept — no evidence, no removal. Output
    * per doc: chunk counts, the cleaned text (surviving chunks re-joined
    * in order), and its token count; a fully-boilerplate document comes
    * back with empty text, letting a downstream filter drop it.
    *
    * Scale shape: the [[signatures]] pipeline plus one small aggregate
    * (boilerplate signatures only — the `__nd >= minDocs` survivors),
    * one equi-join back, and a per-doc reassembly aggregate whose state
    * is bounded by the document's own length (the same cost class as
    * having read the document). Nothing is all-pairs. The two branches
    * (reassembly chunks, signatures) each tokenize the corpus — MEASURED
    * cheaper at sf0.1 than caching the shared chunk frame (columnar
    * encoding of token arrays cost more than the saved pass: 5.0–5.4 s
    * cached vs 3.9–4.6 s recomputed, fresh JVMs); the small signature
    * frame IS cached (used by both the hot-set aggregate and the
    * mark join). Fresh-JVM times are stable — the 8× median/min spread
    * seen in shared-JVM bench passes is allocation-pressure
    * interference from neighboring queries, not a plan property
    * (SCALING.md round-11 addendum).
    */
  def removeBoilerplate(documents: DataFrame, paraSize: Int = 20,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2,
      "minDocs < 2 would drop every signature-bearing chunk")
    val toks = TextFns.tokens(col("text"))
    val nP = floor((size(toks) + lit(paraSize - 1)) / lit(paraSize)).cast("int")
    // ALL chunks, including the signature-less tail paragraphs() drops —
    // removal must reassemble the full document, not just the scored part
    val chunks = documents
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nP - 1),
          i => slice(toks, i * paraSize + 1, lit(paraSize)))))
      .select(col("doc_id"), col("pos").cast("long").as("para_idx"),
        col("col").as("ptoks"))
    val sigs = graft.CacheRegistry.track(
      signatures(documents, paraSize).cache())
    val hot = sigs
      .groupBy("sig")
      .agg(countDistinct("doc_id").as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("sig"), lit(true).as("__hot"))
    val marked = chunks
      .join(sigs, Seq("doc_id", "para_idx"), "left")
      .join(hot, Seq("sig"), "left")
      .withColumn("__drop", coalesce(col("__hot"), lit(false)))
    marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_paras"),
      sum(when(col("__drop"), 1L).otherwise(0L)).as("n_removed"),
      concat_ws(" ", flatten(
        array_sort(collect_list(when(!col("__drop"),
          struct(col("para_idx"), col("ptoks")))))
          .getField("ptoks"))).as("text_clean"),
      coalesce(sum(when(!col("__drop"), size(col("ptoks")).cast("long"))),
        lit(0L)).as("n_tok_clean"))
  }
}
