package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running statistics via `transformWithState` — the Spark 4
  * arbitrary-state API (successor of mapGroupsWithState, RocksDB-backed):
  * for each city, a running record count and exponential moving average
  * of temperature across all micro-batches.
  *
  * State is two scalars per key regardless of input volume — the O(1)
  * custom-state shape the reference's serving layer needs for "latest
  * stats per city" without re-aggregating history.
  */
object RunningStats {

  case class Reading(city: String, temp: Double)
  case class CityStats(city: String, n: Long, ema: Double)

  final class Processor(alpha: Double)
      extends StatefulProcessor[String, Reading, CityStats] {

    @transient private var nState: ValueState[Long] = _
    @transient private var emaState: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
      emaState = getHandle.getValueState[Double]("ema", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Reading],
        timerValues: TimerValues): Iterator[CityStats] = {
      var n = if (nState.exists()) nState.get() else 0L
      var ema = if (emaState.exists()) emaState.get() else Double.NaN
      rows.foreach { r =>
        n += 1
        ema = if (ema.isNaN) r.temp else alpha * r.temp + (1 - alpha) * ema
      }
      nState.update(n)
      emaState.update(ema)
      Iterator.single(CityStats(key, n, ema))
    }
  }

  def run(readings: Dataset[Reading], alpha: Double = 0.5): Dataset[CityStats] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.city)
      .transformWithState(new Processor(alpha), TimeMode.None(), OutputMode.Update())
  }
}
