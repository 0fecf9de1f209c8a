package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import StreamingDedup.DocRecord

/** Streaming exact dedup on Spark 4's ARBITRARY-STATE API v2
  * (`transformWithState` + [[StatefulProcessor]]) — the modernized twin
  * of [[StreamingDedup.dedupStream]] (flatMapGroupsWithState). Same
  * semantics: first occurrence per fingerprint wins (smallest doc_id
  * within a batch), repeats drop against the keyed seen-marker.
  *
  * Why both exist: v2 is where streaming state is headed — typed
  * per-key state variables (value/list/map), timers, and a
  * RocksDB-only runtime (the ≥10⁹-key tier [[StateStores]] routes to).
  * At 100 TB the seen-set lives on executor-local SSD with bounded
  * heap. Bounded-horizon (TTL) dedup stays on the v1 path
  * ([[StreamingDedup.dedupStreamTTL]]) — its horizon is EVENT-time
  * (watermark-driven), which v2's processing-time TTLConfig does not
  * express.
  */
object StreamingDedupV2 {

  /** Per-fingerprint seen marker. */
  private class DedupProcessor
      extends StatefulProcessor[String, DocRecord, DocRecord] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[DocRecord],
        timerValues: TimerValues): Iterator[DocRecord] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        Iterator.single(rows.minBy(_.doc_id))
      }
    }
  }

  /** v2 dedup stream. The query it runs in must use the RocksDB state
    * store provider (wrap with `StateStores.withProvider(spark,
    * "rocksdb")` — transformWithState supports no other).
    */
  def dedupStreamV2(docs: Dataset[DocRecord]): Dataset[DocRecord] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.fp)
      .transformWithState(new DedupProcessor,
        TimeMode.None(), OutputMode.Append(),
        Encoders.product[DocRecord])
  }
}
