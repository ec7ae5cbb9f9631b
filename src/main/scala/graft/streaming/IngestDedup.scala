package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.HashFns
import graft.sources.TxLog

/** Streaming dedup-on-ingest — the d23 batch operator run continuously:
  * each micro-batch of documents is MinHash-signed, probed against the
  * transactional signature index, within-batch deduplicated, and the
  * survivors' signatures are appended to the index EXACTLY ONCE
  * ([[TxLog.idempotentAppend]] under the stream's (appId, batchId)
  * watermark) before the surviving documents are handed to the caller's
  * sink. Per-batch cost is ∝ batch size plus one streamed index scan
  * (the batch's signature set is broadcast into it) — the base corpus
  * is never re-read as the index grows.
  *
  * Replay determinism: a crashed-and-restarted query re-delivers a
  * batch whose survivors are ALREADY in the index — probing the latest
  * snapshot would now flag the batch's own documents as duplicates and
  * emit a different (empty) survivor set than the original run. The
  * probe therefore resolves the index AS OF the version BEFORE this
  * batch's own append ([[TxLog.txnCommitVersion]]): a replayed batch
  * re-derives byte-identical survivors, the index append no-ops on the
  * watermark, and the caller's sink sees the same rows again —
  * at-least-once for the sink (make it idempotent, e.g. another
  * idempotentAppend), exactly-once for the index.
  */
object IngestDedup {

  /** Full-signature MinHash dedup key per document (d23's key). Docs
    * with < 3 tokens have no shingles, hence no signature: they are
    * OUTSIDE the dedup domain — absent from survivors and the index,
    * same contract as the batch operator (route them around the dedup
    * stage upstream if they must be kept).
    */
  def signatures(docs: DataFrame, k: Int = 8): DataFrame =
    HashFns.minhashSignatures(docs, k)
      .select(col("doc_id"),
        concat_ws("|", (0 until k).map(i => col(s"h$i")): _*).as("sig"))

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("sig", StringType)))

  /** One micro-batch of the pipeline, exposed for direct testing:
    * returns the surviving (doc_id, sig) rows AND appends them to the
    * index idempotently. `docs` must be a batch DataFrame with
    * (doc_id, text).
    */
  def dedupBatch(docs: DataFrame, indexTable: String, appId: String,
                 batchId: Long, k: Int = 8): DataFrame = {
    val s = docs.sparkSession
    val sigs = signatures(docs, k)
    // replay-stable index snapshot: the state BEFORE this batch's own
    // append (see scaladoc); vc == 1 means this batch CREATED the
    // index — its pre-state is empty
    val idx = TxLog.txnCommitVersion(s, indexTable, appId, batchId) match {
      case Some(vc) if vc > 1 => TxLog.readAsOf(s, indexTable, vc - 1)
      case Some(_) => s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), sigSchema)
      case None => TxLog.read(s, indexTable)
    }
    val hits = idx
      .join(broadcast(sigs.select("sig").distinct()), Seq("sig"))
      .select("sig").distinct()
    val survivors = sigs
      .join(broadcast(hits.withColumn("__hit", lit(true))), Seq("sig"), "left")
      .filter(coalesce(col("__hit"), lit(false)) === false)
      .withColumn("__rk",
        row_number().over(Window.partitionBy("sig").orderBy("doc_id")))
      .filter(col("__rk") === 1)
      .select("doc_id", "sig")
    TxLog.idempotentAppend(survivors, indexTable, appId, batchId)
    survivors
  }

  /** Run the pipeline over a streaming `docs` frame (columns
    * doc_id, text). `survivorSink` receives each batch's surviving
    * DOCUMENT rows with their signatures, plus the batch id — at-least-
    * once under replay; pair it with an idempotent write.
    */
  def start(docs: DataFrame, indexTable: String, appId: String,
            checkpoint: String, k: Int = 8)(
            survivorSink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = dedupBatch(batch, indexTable, appId, batchId, k)
        survivorSink(
          batch.join(broadcast(kept.select("doc_id", "sig")), Seq("doc_id")),
          batchId)
        ()
      }
      .start()
}
