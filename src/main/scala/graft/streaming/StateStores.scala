package graft.streaming

import org.apache.spark.sql.SparkSession

/** The streaming STATE-STORE scale seam.
  *
  * Every keyed streaming operator here (dedup seen-sets in
  * [[StreamingDedup]], session windows in WeatherPipeline.sessionAgg,
  * stream-stream join buffers) holds its state in the provider named by
  * `spark.sql.streaming.stateStore.providerClass`. The default
  * (HDFS-backed) provider keeps every key ON-HEAP per executor — fine to
  * ~10⁷ keys, fatal at the ≥10⁹-fingerprint seen-sets a 100 TB corpus
  * dedup carries (SCALE.md §state). RocksDB spills state to local SSD
  * with bounded heap, which is the Spark-native answer at that scale
  * (same provider Databricks/Delta Live ship for large state).
  *
  * The seam is a NAME → provider-class resolution plus a scoped setter:
  * the conf is read at QUERY START, so `withProvider(spark, "rocksdb") {
  * ... start queries ... }` routes exactly the queries started inside.
  * Nothing else in the operator code changes — state size becomes a
  * deployment decision, not a rewrite (StateStoreSpec proves the same
  * dedup semantics hold under both providers).
  */
object StateStores {

  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  /** Spark's bundled RocksDB provider (rocksdbjni ships with Spark). */
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The default on-heap provider. */
  val Memory =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Resolve a short name ("rocksdb" | "memory") or a fully-qualified
    * provider class.
    */
  def providerClass(name: String): String = name.toLowerCase match {
    case "rocksdb"          => RocksDb
    case "memory" | "hdfs"  => Memory
    case _ if name.contains(".") => name
    case other => throw new IllegalArgumentException(
      s"unknown state-store provider '$other' (expected rocksdb|memory|fqcn)")
  }

  /** Run `body` with the session's state-store provider set; queries
    * STARTED inside use it. The prior setting is restored after.
    */
  def withProvider[T](spark: SparkSession, name: String)(body: => T): T = {
    val prior = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, providerClass(name))
    try body
    finally prior match {
      case Some(v) => spark.conf.set(ProviderConf, v)
      case None    => spark.conf.unset(ProviderConf)
    }
  }
}
