package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints `explain("formatted")` for the scale-critical
  * queries so pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be inspected per round (the "is this the
  * plan you'd want at 100 TB" loop).
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("q01_edges_scan", "q04_features", "q05_features_by_window",
        "q08_two_hop_pairs", "q09_two_hop_mids", "q15_topk_parts_per_brand",
        "q23_minhash_pairs", "q25_ngram_jaccard", "q27_simsearch_topk",
        "q30_events_hourly", "q39_smurf_recall", "q40_simsearch_ivf",
        "q41_event_sessions", "q42_event_props", "q49_repetition_stats",
        "q50_simsearch_ivfpq", "q58_smurfgen_background", "q59_hash_split",
        "q60_cluster_representative", "q61_token_budget",
        "q62_features_approx", "q63_sequence_packing", "q64_contamination",
        "q65_substring_dup", "q66_tfidf_keywords", "q67_source_profile",
        "q68_langid_eval", "q69_semdedup", "q70_zipf_vocab",
        "q71_source_mix", "q72_pii_scrub", "q73_unigram_xent",
        "q74_gopher_filter", "q75_jsonl_roundtrip", "q76_span_dedup",
        "q77_ppl_buckets", "q78_importance_weights",
        "q79_asof_prev_order", "q80_weighted_sample",
        "q81_interval_concurrency", "q82_bigram_xent",
        "q83_ngram_novelty", "q84_bloom_incremental",
        "q85_quality_classifier", "q86_scalar_quantize",
        "q87_ann_recall", "q88_mixture_epoch", "q89_session_overlap",
        "q90_simhash_pairs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
