package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB determinism contract, as a permanent test: every result
  * is BIT-identical at any shuffle parallelism (fixed-point aggregation,
  * total orderings, exact integer sketches) — which is what keeps
  * outputs stable under AQE re-planning and arbitrary cluster sizing.
  * Runs the most numerically-sensitive queries at two shuffle widths
  * and compares row sets exactly (double bits included, via toString).
  */
class ParallelismInvarianceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("par-inv-spec")

  private val sfDir = "/root/testdata/sf0.01"

  // double-heavy aggregates, sketches, iterative clustering, k-means
  private val picks = Seq(
    "d02_minhash_lsh", "e01_embedding_dedup", "s03_ivf_ann",
    "q06_moving_avg", "q22_monthly_rollup", "q24_hourly_baselines",
    "t02_quality_score", "p01_corpus_clean", "p02_token_budget",
    // h01: decimal harmonic sum must not depend on partial-agg order;
    // c05: Misra-Gries candidates vary with partitioning, output must not;
    // h03: count-min cells are integer sums; g01: iterative integer ranks
    "h01_hll_distinct", "c05_heavy_hitters", "h03_countmin_freq", "g01_pagerank",
    // b01: bloom build/probe bit ops; c06: deletion-blocking candidates;
    // h02: bin cumsums; s05: two composed quantizers + shortlist
    "b01_bloom_prune", "c06_typo_pairs", "h02_histogram_quantiles",
    "s05_ivfpq_ann",
    // round-5 additions: s07 residual codebooks (L2 Lloyd + coarse term);
    // e02 clustered components; c08 bucketed global prefix sums;
    // g02 degree-oriented wedge enumeration
    "s07_residual_ivfpq", "e02_semantic_dedup", "c08_weighted_sample",
    "g02_triangles",
    // round-6 additions: c11 sharded sequential packing (the repartition
    // must make assignments independent of INPUT partitioning); c12
    // substring-window dup counts; m04 decoded-pixel hashes; g03
    // pointer-doubled components; g04 coefficient division
    "c11_sequence_packing", "c12_substring_dedup", "m04_image_dedup",
    "g03_components", "g04_clustering_coeff",
    // round-6 batch 3: g05 level-sync BFS frontiers; c16 integer BM25
    // (postings/df aggs + grouped top-10); h04 bottom-k under partial
    // TakeOrdered merges + IEEE estimate chain; q60 the custom merge
    // exec (held-row state must not depend on partition boundaries)
    "g05_bfs_hops", "c16_bm25", "h04_kmv_setops", "q60_asof_exec",
    // c17/c18 bucketed global prefix-sums/ranks; q61 decimal moments;
    // g06 peeling fixpoint; z02 native hilbert codegen
    "c17_concat_chunks", "c18_negative_pairs", "q61_regression",
    "g06_kcore", "z02_hilbert_layout",
    // q63: collect_set arrival order varies with partitioning — the
    // array_distinct size must not; q65: recursive UnionLoop batches;
    // g07: seed-teleport integer iteration
    "q63_windowed_distinct", "q65_recursive_cte", "g07_trustrank",
    // round-7: g08 Bellman-Ford min-agg fixpoint; q68 bottom-k window
    // merges under partial TakeOrdered/WindowGroupLimit; c20/c21 the
    // per-round pair-count argmax must not depend on agg merge order
    "g08_sssp_weighted", "q68_kmv_windowed_distinct", "c20_bpe_merges",
    "c21_bpe_tokenize", "z03_clustered_prune",
    // round-8: g09 argmin-parent forest + path-following joins; q70
    // rebuilds and incrementally refreshes the partitioned pyramid lake
    // (fixed-point layer math must survive both widths end-to-end)
    "g09_sssp_paths", "q70_incremental_pyramid",
    // q72: the typed-aggregate sketch folds through arbitrary
    // partial/final merge orders — the serialized-buffer path itself
    // must be order-free, not just the DataFrame sketch
    "q72_kmv_native_agg",
    // round-8 batch 3: q80 source-side partial aggregation merges across
    // however many slices/tasks; q82 the lake lifecycle — COW rewrite
    // file boundaries change with write parallelism but row content and
    // time-travel counts must not
    "q80_agg_pushdown", "q82_lake_lifecycle")

  test("query results are bit-identical across shuffle parallelism") {
    assume(new java.io.File(sfDir).isDirectory)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try picks.foreach { name =>
      val fn = SparkEntry.queries(name)
      // drop memoized BPE trainings: both widths must RETRAIN, or the
      // narrow run would just replay the wide run's merge table
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      graft.queries.CorpusOps.clearBpeCache()
      val wide = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      graft.queries.CorpusOps.clearBpeCache()
      val narrow = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
      assert(wide == narrow, s"$name output depends on parallelism")
      assert(wide.nonEmpty)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
