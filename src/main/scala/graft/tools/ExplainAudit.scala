package graft.tools

/** Prints formatted physical plans for representative queries so the
  * scan/pushdown/join strategies can be audited (PushedFilters, ReadSchema,
  * broadcast vs shuffle joins, WholeStageCodegen spans).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSet
    else Set("p1_time_filter", "q3_top_orders", "j1_config_join", "j2_asof_nearest",
      "qc_pipeline_flags", "sim_cosine_topk", "sim_lsh_buckets", "sim_ivf_topk",
      "dd_ngram_pairs", "t_winnow_fingerprints", "w8_chunked_zscore",
      "t_phrase_search", "q_labelprop", "q_modularity", "dd_substring")
    graft.SparkEntry.all.filter(q => names(q.name)).foreach { q =>
      println(s"\n===================== ${q.name} =====================")
      q.query(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
