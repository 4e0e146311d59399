package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries
  * (source for PLANS.md). Usage: runMain graft.DumpPlans [sfDir] */
object DumpPlans {
  val keys = Seq(
    "q_scan_pushdown", "q_agg_group", "q_join_multiway", "q_join_theta",
    "q_join_asof", "q_dedup_minhash", "q_similarity_cosine",
    "q_join_salted", "q_subquery_scalar", "q_ann_ivf", "q_dedup_embedding",
    "q_dedup_embedding_lsh", "q_embedding_quantize", "q_heavy_hitters",
    "q_decontaminate", "q_pack_sequences", "q_outlier_zscore",
    "q_ks_drift", "q_join_bucketed", "q_scan_partition_pruned",
    "q_dedup_incremental", "q_ann_ivfpq", "q_source_orc", "q_semdedup",
    "q_record_linkage", "q_semdedup_pipeline", "q_dedup_fuzzy_edit",
    "q_bm25_search",
    "q_rfm_segments", "q_win_rolling_time", "q_distinct_incremental",
    // graph + series families (q_pagerank / q_graph_components stay
    // hand-audited: with the eager checkpoints disabled for plan dumps
    // their explains are full multi-round lazy chains — shape is
    // documented in the bullets instead)
    "q_affinity_pairs", "q_triangle_count", "q_recommend_items",
    "q_link_predict", "q_degree_hist", "q_graph_stats",
    "q_changepoint_cusum", "q_session_features", "q_markov_transition",
    // round-11 layout/serving/privacy family
    "q_zorder_layout", "q_skyline_pareto", "q_k_anonymity",
    "q_affinity_incremental")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.allowQuadratic", "true") // plan dump, not a run
      // do NOT execute sketch jobs (eager localCheckpoint) just to dump
      // a plan — and keep the dumped plan the real pipeline, not the
      // degenerate post-checkpoint LogicalRDD scan
      .config("spark.graft.skipEagerMaterialize", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      println(SparkEntry.queries(k)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
