package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.SpaceSavingBuffer

/** Streaming heavy-hitters: a SpaceSaving sketch maintained across
  * micro-batches via `transformWithState` (reference analog: the serving
  * layer's "top cities" loops, server.py:52-77, as continuous state).
  *
  * 100 TB shape: a single global sketch key would funnel the whole stream
  * through one task. Instead the stream is SHARDED BY ITEM HASH into
  * `shards` state keys — the same item always routes to the same shard,
  * so per-item counts are never split across sketches and each shard's
  * overestimate-only bound (`est ≥ true ≥ est − err`) is preserved.
  * Each micro-batch every touched shard emits its current top entries;
  * the global top-k is a query-side merge (tiny: shards × k rows,
  * sort+take) — exactly how the batch aggregate's partials merge, but
  * with state that lives across batches.
  */
object StreamingTopK {

  case class TopEntry(shard: Int, item: String, est: Long, err: Long)

  final class Processor(k: Int)
      extends StatefulProcessor[Int, String, TopEntry] {

    @transient private var sketch: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Array[Byte]](
        "sketch", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[String],
        timerValues: TimerValues): Iterator[TopEntry] = {
      val buf =
        if (sketch.exists()) SpaceSavingBuffer.fromBytes(sketch.get(), k)
        else new SpaceSavingBuffer(k)
      rows.foreach(buf.add)
      sketch.update(SpaceSavingBuffer.toBytes(buf))
      buf.sorted.iterator.map { case (item, est, err) => TopEntry(key, item, est, err) }
    }
  }

  /** items → per-shard running top entries (update mode). Global top-k =
    * sort the latest per-item rows by est desc and take k — shard routing
    * by item hash guarantees one row per item per batch.
    */
  def run(items: Dataset[String], k: Int = 64, shards: Int = 16): Dataset[TopEntry] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(item => (item.hashCode & Int.MaxValue) % shards)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Update())
  }
}
