// Dump `.explain("formatted")` output for the r14 optimization targets
// into plans/r14/<query>_<suffix>.txt (suffix from SPARK_GRAFT_PLAN_SUFFIX,
// default "before"). Run exactly like gen_plans.scala:
//   /opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=8 \
//     --conf spark.sql.warehouse.dir=/tmp/graft_wh_plans \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf spark.driver.extraClassPath=target/scala-2.13/classes \
//     -I scripts/dump_plans_r14.scala
// Keys come from SPARK_GRAFT_PLAN_KEYS (comma-separated) or the default
// list below (the r14 examination set).
val defaultKeys = Seq(
  "q2_min_cost_supplier", "q3_top_orders", "q8_market_share",
  "q18_large_orders", "q9_profit_by_nation", "q11_important_parts",
  "hybrid_rrf", "hybrid_rrf_ann", "hybrid_rrf_sql", "hybrid_rrf_indexed",
  "lake_branch_read", "bm25_index_tombstoned", "similarity_recall",
  "lm_score_bigram", "contamination_ngram", "tokenize_bpe", "bpe_train",
  "profile_table", "embedding_dedup_exact", "quality_classifier_lr",
  "lake_incremental_agg_cdc", "dedup_cluster", "similarity_quantized",
  "lake_update_where_mor", "lake_merge_upsert_mor", "lake_rename_read",
  "sample_importance", "tfidf_top_terms", "similarity_ivfpq_follow",
  "lake_changefeed")
// parens: -I runs line-interpreted, a split chain silently truncates
val keys = (sys.env.get("SPARK_GRAFT_PLAN_KEYS")
  .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
  .getOrElse(defaultKeys))
val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
val d = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.01")
java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r14"))
for (k <- keys) {
  try {
    val df = graft.SparkEntry.queries(k)(spark, d)
    df.count() // materialize the AQE final plan
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"plans/r14/${k}_$suffix.txt"), plan)
    println(s"[plans] wrote plans/r14/${k}_$suffix.txt")
  } catch {
    case e: Throwable => println(s"[plans] $k FAILED: $e")
  }
}
println("[plans] done: " + keys.size)
sys.exit(0)
