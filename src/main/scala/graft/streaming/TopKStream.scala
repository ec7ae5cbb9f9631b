package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuously-maintained per-key top-k over a stream — the streaming
  * counterpart of the batch `plans/TopKPerKey` operator, with the same
  * ordering contract (value DESC, event_id ASC as the total order).
  *
  * State per key is the current top-k list — O(k), never the events — so
  * state size scales with key cardinality × k exactly like the batch
  * operator's heap memory, and an unbounded stream never grows it. Each
  * micro-batch emits a key's refreshed ranking only when that key saw
  * events (Update mode semantics); on a bounded Dataset the single
  * invocation emits the exact final top-k, which the spec checks against
  * the batch operator.
  */
object TopKStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Entry(value: Double, event_id: Long)

  /** Bounded per-key state: the current top-k entries, kept sorted. */
  case class TopKState(entries: Seq[Entry])

  case class Ranked(user_id: Long, rank: Int, event_id: Long, value: Double)

  /** value DESC, event_id ASC — mirrors q50's TopKPerKey ordering with
    * Spark SQL's double semantics: NaN sorts as the LARGEST value (rank 1
    * under DESC) and -0.0 == +0.0 (tie falls through to event_id). A
    * naive `Ordering.by(-value)` breaks both: -NaN is still NaN (sorts
    * last) and -(-0.0) > -(+0.0).
    */
  private val ord: Ordering[Entry] = new Ordering[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val va = if (a.value == 0.0) 0.0 else a.value // maps -0.0 to +0.0
      val vb = if (b.value == 0.0) 0.0 else b.value
      // Double.compare: NaN greater than everything, so DESC = reversed
      val c = java.lang.Double.compare(vb, va)
      if (c != 0) c else java.lang.Long.compare(a.event_id, b.event_id)
    }
  }

  private[streaming] def updateUser(k: Int)(
      userId: Long, events: Iterator[Event],
      state: GroupState[TopKState]): Iterator[Ranked] = {
    val merged =
      (state.getOption.map(_.entries).getOrElse(Seq.empty) ++
        events.map(e => Entry(e.value, e.event_id)))
        .sorted(ord).take(k)
    state.update(TopKState(merged))
    merged.iterator.zipWithIndex.map { case (e, i) =>
      Ranked(userId, i + 1, e.event_id, e.value)
    }
  }

  /** Maintain the top-`k` events per user. Streaming output mode:
    * Update (a key's ranking is re-emitted whenever it changes).
    */
  def topK(events: Dataset[Event], k: Int): Dataset[Ranked] = {
    implicit val rankedEnc = Encoders.product[Ranked]
    implicit val stateEnc = Encoders.product[TopKState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        updateUser(k))
  }
}
