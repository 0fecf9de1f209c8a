package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.{BloomIndex, Bucketed, Generator, LakeIO}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers an [[Op]] in one of the module
  * registries below; `queries`/`oracleSql` are derived from them so the
  * two maps can never drift apart.
  */
object SparkEntry {

  def allOps: Seq[Op] =
    EventOps.ops ++ Generator.ops ++ LakeIO.ops ++ BloomIndex.ops ++ Bucketed.ops ++ RelationalOps.ops ++
      TextOps.ops ++ Dedup.ops ++ Similarity.ops ++ Multimodal.ops ++ RetrievalOps.ops ++
      TemporalJoins.ops ++ CorpusOps.ops ++ CurationOps.ops ++ graft.plans.Mv.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Batch form of the reference's one real query — 5 s tumbling window ×
    * key → AVG/COUNT (reference: flink/sql/weather-aggregation.sql:38-49).
    */
  def entry(spark: SparkSession): DataFrame =
    EventOps.tumbleAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(o => o.key -> o.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(o => o.oracle.map(o.key -> _)).toMap
}
