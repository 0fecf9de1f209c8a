package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication with custom keyed state
  * (`flatMapGroupsWithState`) — the training-data-pipeline primitive of
  * dropping already-seen documents across an unbounded stream, state
  * being a per-fingerprint seen marker.
  *
  * Differs from `dropDuplicates` on a stream in that the state handling
  * is explicit: first occurrence wins deterministically within a batch
  * (smallest doc_id), and the seen-set lives in the state store —
  * partitioned by fingerprint, scaling horizontally with executors.
  * [[dedupStreamTTL]] bounds the horizon: per-fingerprint state expires
  * via `GroupStateTimeout.EventTimeTimeout` once the watermark passes
  * first-seen + TTL, so unbounded streams hold only a TTL-wide window of
  * fingerprints (the 100 TB requirement — an un-TTL'd seen-set grows
  * forever).
  */
object StreamingDedup {

  case class DocRecord(doc_id: Long, fp: String, text: String)

  /** TTL variant's record shape: carries the event time the TTL clock
    * runs on (caller applies `withWatermark("event_time", ...)`).
    */
  case class DocEvent(doc_id: Long, fp: String, text: String,
      event_time: java.sql.Timestamp)

  implicit private val docEnc: Encoder[DocRecord] = Encoders.product[DocRecord]
  implicit private val docEvEnc: Encoder[DocEvent] = Encoders.product[DocEvent]

  def dedupStream(docs: Dataset[DocRecord]): Dataset[DocRecord] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, DocRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DocRecord], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic keep: smallest doc_id in this batch's group
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }

  /** Bounded-horizon dedup: a fingerprint seen once is dropped until the
    * event-time watermark passes first-seen + `ttl`, at which point its
    * state is evicted and the fingerprint may be emitted again. Input
    * must carry a watermark on `event_time`.
    */
  def dedupStreamTTL(docs: Dataset[DocEvent],
      ttl: java.time.Duration): Dataset[DocEvent] = {
    import docs.sparkSession.implicits._
    val ttlMs = ttl.toMillis
    docs
      .groupByKey(_.fp)
      // state = (kept doc_id, first-seen event-time ms). Spark CLEARS a
      // group's timeout on every invocation, so the duplicate branch must
      // re-arm it from first-seen or a dup arrival would disarm the TTL
      // and the state would never expire.
      .flatMapGroupsWithState[(Long, Long), DocEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[DocEvent], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed first-seen + ttl with no new data: evict
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            state.setTimeoutTimestamp(state.get._2 + ttlMs)
            Iterator.empty // duplicate within the TTL horizon
          } else {
            val kept = rows.minBy(_.doc_id)
            state.update((kept.doc_id, kept.event_time.getTime))
            state.setTimeoutTimestamp(kept.event_time.getTime + ttlMs)
            Iterator.single(kept)
          }
      }
  }
}
