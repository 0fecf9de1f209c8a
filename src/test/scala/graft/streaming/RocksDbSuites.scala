package graft.streaming

import org.scalatest.{BeforeAndAfterAll, Suite}

import graft.SharedSpark.spark

/** A second full pass of the stateful streaming suites under the RocksDB
  * state-store provider — the provider a 100 TB deployment actually runs
  * (on-heap state is fatal at ≥10⁹ keys; see [[StateStores]]). The
  * provider conf is read at QUERY START, so setting it around the whole
  * suite routes every query the inherited tests start; the tests
  * themselves are unchanged, which is the point: identical semantics
  * must hold under both providers, not just the on-heap default the
  * shared session uses.
  */
trait RocksDbProvider extends BeforeAndAfterAll { this: Suite =>
  private var prior: Option[String] = None
  override def beforeAll(): Unit = {
    super.beforeAll()
    prior = spark.conf.getOption(StateStores.ProviderConf)
    spark.conf.set(StateStores.ProviderConf, StateStores.RocksDb)
  }
  override def afterAll(): Unit = {
    prior match {
      case Some(v) => spark.conf.set(StateStores.ProviderConf, v)
      case None    => spark.conf.unset(StateStores.ProviderConf)
    }
    super.afterAll()
  }
}

/** T1–T6 parity (watermark, tumble, late data, upsert, session windows,
  * checkpoint restart) under RocksDB.
  */
class StreamingSpecRocksDb extends StreamingSpec with RocksDbProvider

/** Stream-stream interval joins (watermark-bounded join state) under
  * RocksDB.
  */
class StreamJoinSpecRocksDb extends StreamJoinSpec with RocksDbProvider

/** transformWithState running aggregates under RocksDB. */
class RunningStatsSpecRocksDb extends RunningStatsSpec with RocksDbProvider

/** Bounded top-k stream state under RocksDB. */
class StreamingTopKSpecRocksDb extends StreamingTopKSpec with RocksDbProvider
