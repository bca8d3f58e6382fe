package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over the `sfDir` parquet tables; `oracleSql` holds the equivalent
  * DuckDB SQL for the hash-compare gate. Queries without an oracle entry are
  * model-dependent (LSH/MinHash) and are pinned by ScalaTest golden/property
  * tests instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's raison d'être: two-phase LSH kNN for one stored vector
    * (SURVEY.md §2.A A7 / §3.3) — served from the PERSISTED index layout
    * (build-once, then partition-pruned probes), the A3→A7 lifecycle a real
    * user of the reference runs.
    */
  def entry(spark: SparkSession): DataFrame =
    Knn.lshTopKIndexed(spark, "/root/testdata/sf0.001", queryMaxId = 1, k1 = 100, k2 = 10)

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every entry routes through the PREPARED-QUERY layer ([[graft.Plans]]).
    * By DEFAULT each call builds a fresh plan (fresh leaf instances via
    * [[graft.Readers]]), so returned frames compose freely — join, union,
    * self-join are all in contract. A harness that executes each result
    * STANDALONE (the bench) may opt into instance reuse via
    * [[graft.Plans.enableInstanceReuse]], after which a repeated (session,
    * query, sfDir) invocation re-serves the already-analyzed plan instance
    * instead of re-paying ~12–17 ms of Catalyst analysis per call — the
    * statement-cache behavior of the serving engine this library
    * re-expresses. COMPOSING two instance-reuse results into one plan is
    * outside that opt-in's contract (shared plan instances are the r5
    * wrong-results class — Readers scaladoc), though PlansSpec pins that
    * even that composition currently matches fresh-built results with
    * constraint propagation ON. Builds that pin blocks are auto-excluded
    * and lifecycle bumps invalidate; see the Plans scaladoc.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (n, f) =>
      n -> ((s: SparkSession, d: String) => graft.Plans.cached(n, s, d)(f(s, d)))
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ Text.all ++ Events.all ++ Vectors.all ++ Media.all ++
      AsOf.all ++ Sources.all ++ Stats.all ++ Retrieval.all ++ Pq.all ++
      Sketches.all ++ Components.all ++ Bpe.all ++ Curation.all ++ Audit.all ++
      Map[String, (SparkSession, String) => DataFrame](
      "q19_sql_vector_knn" -> ((s, dir) => KnnExact.topKSql(s, dir)),
      "q20_knn_exact" -> ((s, dir) => KnnExact.topK(s, dir)),
      "q21_knn_cosine" -> ((s, dir) => KnnExact.topKCosine(s, dir)),
      "q95_knn_dot" -> ((s, dir) => KnnExact.topKDot(s, dir)),
      "q105_matryoshka_knn" -> ((s, dir) => KnnExact.topKCosineTrunc(s, dir)),
      "q118_knn_filtered" -> ((s, dir) => KnnExact.topKFiltered(s, dir)),
      "q119_range_search" -> ((s, dir) => KnnExact.rangeSearch(s, dir)),
      "q128_hard_negatives" -> ((s, dir) => KnnExact.hardNegatives(s, dir)),
      "q130_knn_label_eval" -> ((s, dir) => KnnExact.knnLabelEval(s, dir)),
      "q139_ndcg_eval" -> ((s, dir) => KnnExact.ndcgEval(s, dir)),
      // Greedy-sequential re-rank: rows-only (recursion not SQL-expressible);
      // pinned by RetrievalSpec λ=1-parity / planted-dup / recompute tests.
      "q123_mmr_rerank" -> ((s, dir) => KnnExact.mmrRerank(s, dir)),
      // Model-dependent LSH ops: no SQL oracle (driver records rows-only);
      // pinned by LshSpec golden + recall tests instead.
      "q22_lsh_hash" -> ((s, dir) => Lsh.hashQuery(s, dir)),
      "q23_lsh_knn" -> ((s, dir) => Knn.lshTopKIndexed(s, dir)),
      "q28_lsh_multiprobe" -> ((s, dir) => Knn.lshTopKIndexed(s, dir, multiprobe = true)),
      "q120_knn_filtered_indexed" -> ((s, dir) => Knn.lshTopKFilteredIndexed(s, dir)),
      "q166_knn_by_vector" -> ((s, dir) => Knn.lshTopKByVector(s, dir)),
      // A10 recall measurement: rows-only (LSH leg model-dependent);
      // recall floor pinned in MiscSpec.
      "q125_recall_benchmark" -> ((s, dir) => Knn.recallBenchmark(s, dir)),
      "q140_recall_ivf" -> ((s, dir) => Knn.recallBenchmarkIvf(s, dir)),
      "q158_recall_bq" -> ((s, dir) => Knn.recallBenchmarkBq(s, dir)),
      "q172_recall_pq" -> ((s, dir) => Knn.recallBenchmarkPq(s, dir)),
      "q173_recall_sq8" -> ((s, dir) => Knn.recallBenchmarkSq8(s, dir)),
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Text.oracles ++ Events.oracles ++ Vectors.oracles ++
      Media.oracles ++ AsOf.oracles ++ Sources.oracles ++ Stats.oracles ++
      Retrieval.oracles ++ Components.oracles ++ Curation.oracles ++
      Audit.oracles ++ Map(
      "q19_sql_vector_knn" -> KnnExact.oracle(queryMaxId = 4),
      "q20_knn_exact" -> KnnExact.oracle(),
      "q21_knn_cosine" -> KnnExact.oracleCosine(),
      "q95_knn_dot" -> KnnExact.oracleDot(),
      "q105_matryoshka_knn" -> KnnExact.oracleCosineTrunc(),
      "q118_knn_filtered" -> KnnExact.oracleFiltered(),
      "q119_range_search" -> KnnExact.oracleRange(),
      "q128_hard_negatives" -> KnnExact.oracleHardNegatives(),
      "q130_knn_label_eval" -> KnnExact.oracleLabelEval(),
      "q139_ndcg_eval" -> KnnExact.oracleNdcgEval(),
    )
}
