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
  * (Production would add a state TTL via `GroupStateTimeout` when the
  * dedup horizon is bounded.)
  */
object StreamingDedup {

  case class DocRecord(doc_id: Long, fp: String, text: String)

  implicit private val docEnc: Encoder[DocRecord] = Encoders.product[DocRecord]

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
}
