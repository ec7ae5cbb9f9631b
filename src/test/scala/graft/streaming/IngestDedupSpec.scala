package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TxLog

/** Streaming dedup-on-ingest: per-batch survivors vs the growing
  * signature index, exactly-once index maintenance, and byte-identical
  * survivor re-derivation under full checkpoint-wipe replay.
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  private val T1 = "alpha beta gamma delta"
  private val N1 = "epsilon zeta eta theta"
  private val N2 = "iota kappa lambda mu nu"

  /** srcDir with two parquet files written in order; maxFilesPerTrigger=1
    * keeps file → batch assignment deterministic across runs.
    */
  private def writeSource(): String = {
    val srcDir = Files.createTempDirectory("graft-ingdedup-src").toString
    // file 1: a cross dup of the seeded index (10), a novel doc (11),
    // and its within-batch duplicate (12)
    Seq((10L, T1), (11L, N1), (12L, N1)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/f1")
    // file 2: a dup of batch-1's survivor (13) and a novel doc (14)
    Seq((13L, N1), (14L, N2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/f2")
    srcDir
  }

  private def runOnce(srcDir: String, idx: String, checkpoint: String)
      : Map[Long, Set[Long]] = {
    val got = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
    val q = IngestDedup.start(stream, idx, appId = "ingest-spec",
        checkpoint = checkpoint) { (survivors, id) =>
      val ids = survivors.select("doc_id").as[Long].collect().toSet
      got.synchronized { got += id -> ids }
      ()
    }
    q.awaitTermination(120000)
    got.toMap
  }

  test("per-batch dedup against the growing index; exactly-once; replay-stable") {
    val idx = Files.createTempDirectory("graft-ingdedup-idx").resolve("t").toString
    val srcDir = writeSource()
    // seed the index with the base corpus' signatures (docs 1, 2)
    TxLog.overwrite(
      IngestDedup.signatures(Seq((1L, T1), (2L, N2 + " xi")).toDF("doc_id", "text")), idx)

    val cp1 = Files.createTempDirectory("graft-ingdedup-cp").toString
    val run1 = runOnce(srcDir, idx, cp1)
    // batch 0 (file 1): 10 is a cross dup of doc 1's T1, 11 survives,
    // 12 loses the within-batch tie; batch 1 (file 2): 13 is now a
    // cross dup of 11's indexed signature, 14 survives
    assert(run1 == Map(0L -> Set(11L), 1L -> Set(14L)), s"got $run1")
    val afterRun1 = TxLog.read(spark, idx).as[(Long, String)].collect().toSet
    assert(afterRun1.map(_._1) == Set(1L, 2L, 11L, 14L))

    // same checkpoint, no new files: nothing re-delivered
    assert(runOnce(srcDir, idx, cp1).isEmpty)

    // full replay (wiped checkpoint): survivors re-derive byte-identical
    // even though their signatures are ALREADY indexed — the probe reads
    // the pre-append snapshot per batch — and the index does not grow
    val cp2 = Files.createTempDirectory("graft-ingdedup-cp").toString
    val replay = runOnce(srcDir, idx, cp2)
    assert(replay == run1, s"replay diverged: $replay vs $run1")
    assert(TxLog.read(spark, idx).as[(Long, String)].collect().toSet == afterRun1,
      "replay must not double-append to the index")
  }

  test("dedupBatch contract: short docs outside the dedup domain; batch parity with d23 semantics") {
    val idx = Files.createTempDirectory("graft-ingdedup-idx2").resolve("t").toString
    TxLog.overwrite(
      IngestDedup.signatures(Seq((1L, T1)).toDF("doc_id", "text")), idx)
    val batch = Seq((20L, T1), (21L, "xy"), (22L, N1)).toDF("doc_id", "text")
    val kept = IngestDedup.dedupBatch(batch, idx, appId = "b", batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    // 20 cross-dups, 21 has < 3 tokens (no signature -> not tracked),
    // 22 survives and lands in the index
    assert(kept == Set(22L))
    assert(TxLog.read(spark, idx).as[(Long, String)].collect()
      .map(_._1).toSet == Set(1L, 22L))
    // re-running the same batchId appends nothing and re-derives the
    // same survivors (replay path through txnCommitVersion)
    val again = IngestDedup.dedupBatch(batch, idx, appId = "b", batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == Set(22L))
    assert(TxLog.read(spark, idx).count() == 2L)
  }
}
