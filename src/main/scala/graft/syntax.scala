package graft

import org.apache.spark.sql.{ColumnName, DataFrame}

/** `$"col"` interpolator for code outside a SparkSession scope (the same
  * syntax `spark.implicits._` provides, minus the session dependency).
  */
object syntax {
  implicit class DollarCol(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }

  /** Fan a narrow scan out to the cores ONLY when it is actually narrow
    * (r14, guide §2.5 input skew / §1.2 "the distributed algorithm
    * first"): a demo-scale table is one parquet file, so a CPU-heavy
    * consumer (all-pairs dot products, Expand multi-distinct, n-gram
    * explode) runs single-threaded on a 32-core host — measured 3.0 s
    * single-task vs ~0.4 s fanned for embedding_dedup_exact at sf0.1.
    * At production scale the scan already has thousands of splits, the
    * condition is false, and NO extra exchange is added — this must stay
    * conditional; an unconditional repartition would re-shuffle the
    * full table at 100 TB for nothing. Results are partitioning-
    * invariant for every caller (aggregates / joins / keyed windows).
    */
  def fanOutNarrowScan(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
