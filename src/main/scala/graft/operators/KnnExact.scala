package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.sql.graft.VectorExpressions

/** Exact (brute-force) k-nearest-neighbor search — the correctness baseline
  * the reference's approximate two-phase search is measured against
  * (SURVEY.md §2.A A10: recall@k of LSH vs brute force).
  *
  * Shape: a small query set Q is broadcast against the full embedding table;
  * distance is a codegen-friendly higher-order expression; per-query top-k is
  * the window row_number pattern with deterministic (dist, id) tie-break.
  *
  * Scale notes (100 TB): the broadcast-nested-loop side is O(|Q|·N) — correct
  * only for small |Q|. Large |Q| goes through the LSH path (Knn.scala), which
  * turns the cross product into an equi-join on hash buckets.
  */
object KnnExact {

  import org.apache.spark.sql.Column

  /** The one brute-force scaffold every metric variant shares: project the
    * query side (optionally transformed), broadcast it against the corpus,
    * score with the given expression, window-rank with the deterministic
    * (score, id) tie-break, keep top-k. Variants differ ONLY in the
    * embedding projection, the scoring expression, and the sort direction —
    * a tie-break or join-shape fix lands once, for all of them.
    */
  private def topKScaffold(
      spark: SparkSession,
      sfDir: String,
      queryMaxId: Long,
      k: Int,
      proj: Column => Column,
      score: (Column, Column) => Column,
      ascending: Boolean,
      corpusFilter: Column = lit(true),
      scoreFilter: Column => Column = _ => lit(true),
      carry: Seq[Column] = Nil): DataFrame =
    topKScaffoldOf(Tables.embeddings(spark, sfDir), queryMaxId, k, proj,
      score, ascending, corpusFilter, scoreFilter, carry)

  private[operators] def topKScaffoldOf(
      emb: DataFrame,
      queryMaxId: Long,
      k: Int,
      proj: Column => Column,
      score: (Column, Column) => Column,
      ascending: Boolean,
      corpusFilter: Column = lit(true),
      scoreFilter: Column => Column = _ => lit(true),
      carry: Seq[Column] = Nil): DataFrame = {
    val q = emb
      .filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), proj(col("embedding")).as("qv"))
    val scored = emb
      .filter(corpusFilter)
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        Seq(col("query_id"), col("vec_id").as("neighbor_id"),
          score(col("qv"), proj(col("embedding"))).as("score")) ++ carry: _*)
      // score-band predicate (hard-negative mining) applies BEFORE the
      // rank window, so only qualifying (ids, score) rows reach the
      // exchange
      .filter(scoreFilter(col("score")))
    val ord = if (ascending) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("query_id")).orderBy(ord, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Top-k L2 neighbors for each query vector, self excluded.
    * Output: (query_id, neighbor_id, rank, dist4).
    */
  def topK(spark: SparkSession, sfDir: String, queryMaxId: Long = 8, k: Int = 10): DataFrame =
    topKScaffold(spark, sfDir, queryMaxId, k, identity, VectorExpressions.l2, ascending = true)
      .select(col("query_id"), col("neighbor_id"), col("rank"), Det.display(col("score"), 4).as("dist4"))
      .orderBy(col("query_id"), col("rank"))

  def oracle(queryMaxId: Long = 8, k: Int = 10): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), d AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_distance(CAST(e.embedding AS DOUBLE[]), q.qv) AS dist
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, neighbor_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS INTEGER) AS rank,
       |       floor(dist * 10000.0 + 0.5) / 10000.0 AS dist4
       |FROM d
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** q19 — the exact-kNN baseline expressed through the SQL SURFACE with the
    * registered native function (`GraftFunctions.register` →
    * `l2_distance(...)` inside `spark.sql`): exactly what a SQL user of this
    * library writes, planned into the same codegen expression as the Column
    * API path. Oracle: the same [[oracle]] SQL.
    */
  def topKSql(spark: SparkSession, sfDir: String, queryMaxId: Long = 4, k: Int = 10): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings_sql")
    spark.sql(
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings_sql WHERE vec_id < $queryMaxId
         |)
         |SELECT query_id, neighbor_id, rank,
         |       floor(dist * 1e4 + 0.5) / 1e4 AS dist4 FROM (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         l2_distance(q.qv, e.embedding) AS dist,
         |         row_number() OVER (
         |           PARTITION BY q.query_id
         |           ORDER BY l2_distance(q.qv, e.embedding) ASC, e.vec_id ASC) AS rank
         |  FROM embeddings_sql e JOIN q ON e.vec_id <> q.query_id
         |) WHERE rank <= $k
         |ORDER BY query_id, rank""".stripMargin)
  }

  /** Top-k cosine-similarity neighbors (embeddings are unit-norm, so the rank
    * order matches L2, but the expression path — dot/norm — differs).
    */
  def topKCosine(spark: SparkSession, sfDir: String, queryMaxId: Long = 4, k: Int = 10): DataFrame =
    topKScaffold(spark, sfDir, queryMaxId, k, identity, VectorExpressions.cosine, ascending = false)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))

  /** Top-k MAX-INNER-PRODUCT neighbors (the retrieval metric of
    * dot-product-trained embedding models, where magnitude carries salience
    * and MIPS ≠ cosine ≠ L2 ranking in general). Completes the metric triad;
    * output is ids+rank (float-ranking discipline, like cosine).
    */
  def topKDot(spark: SparkSession, sfDir: String, queryMaxId: Long = 4, k: Int = 10): DataFrame =
    topKScaffold(spark, sfDir, queryMaxId, k, identity, VectorExpressions.dot, ascending = false)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))

  /** q105 — MATRYOSHKA-style truncated-dimension search: rank by cosine over
    * only the first `dims` of the embedding (Kusupati et al. 2022,
    * "Matryoshka Representation Learning": MRL-trained models pack the
    * salient signal into the leading dimensions, so a prefix of the vector
    * is a usable lower-cost representation). The cheapest rung of the scale
    * ladder next to SQ8/PQ: at 100 TB, halving `dims` halves both the
    * scanned bytes (columnar slice) and the per-pair FLOPs with NO codebook
    * to train — and composes with either (truncate, then quantize).
    *
    * Cosine over a prefix renormalizes by the PREFIX norms (a prefix of a
    * unit vector is not unit), which the cosine expression does by
    * definition. Output ids+rank (float-ranking discipline, like q21);
    * recall vs the full-dim ranking is measured in [[graft.tools.RecallSweep]]
    * and bounded in VectorsSpec.
    */
  def topKCosineTrunc(
      spark: SparkSession,
      sfDir: String,
      dims: Int = 32,
      queryMaxId: Long = 4,
      k: Int = 10): DataFrame =
    topKScaffold(spark, sfDir, queryMaxId, k,
      e => slice(e, 1, dims), VectorExpressions.cosine, ascending = false)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))

  def oracleCosineTrunc(dims: Int = 32, queryMaxId: Long = 4, k: Int = 10): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id,
       |         CAST(embedding[1:$dims] AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), d AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(e.embedding[1:$dims] AS DOUBLE[]), q.qv) AS sim
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, neighbor_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
       |FROM d
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  def oracleDot(queryMaxId: Long = 4, k: Int = 10): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), d AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) AS ip
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, neighbor_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS INTEGER) AS rank
       |FROM d
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  def oracleCosine(queryMaxId: Long = 4, k: Int = 10): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), d AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, neighbor_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
       |FROM d
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** q118 — FILTERED kNN: exact top-k L2 neighbors restricted to a metadata
    * predicate (label ∈ `labels`) — the "bool filter + knn" composition an
    * Elasticsearch user of the reference writes (metadata narrows the
    * candidate space, THEN similarity ranks it). The predicate applies
    * BEFORE scoring, so the top-k is exact over the filtered population —
    * post-filtering an unfiltered k-list under-fills whenever more than
    * zero of the k fail the predicate — and the label filter is a pushed
    * parquet scan predicate (PlanSpec-locked): at 100 TB with
    * label-partitioned or stats-clustered files, pruning happens before a
    * single vector is read.
    */
  def topKFiltered(
      spark: SparkSession,
      sfDir: String,
      queryMaxId: Long = 8,
      k: Int = 10,
      labels: Seq[Int] = Seq(1, 2, 3)): DataFrame =
    topKScaffold(spark, sfDir, queryMaxId, k, identity, VectorExpressions.l2,
      ascending = true, corpusFilter = col("label").isin(labels.map(Integer.valueOf): _*))
      .select(col("query_id"), col("neighbor_id"), col("rank"), Det.display(col("score"), 4).as("dist4"))
      .orderBy(col("query_id"), col("rank"))

  def oracleFiltered(queryMaxId: Long = 8, k: Int = 10, labels: Seq[Int] = Seq(1, 2, 3)): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), d AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_distance(CAST(e.embedding AS DOUBLE[]), q.qv) AS dist
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id AND e.label IN (${labels.mkString(", ")})
       |)
       |SELECT query_id, neighbor_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS INTEGER) AS rank,
       |       floor(dist * 10000.0 + 0.5) / 10000.0 AS dist4
       |FROM d
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** q119 — RANGE SEARCH: every neighbor within L2 `radius` of each query
    * (the fixed-threshold dual of top-k — "all matches above a similarity
    * bar", the shape deduplication and recommendation filters want when the
    * match COUNT is the unknown). No window, no rank: score, filter,
    * order — the filter is a scan-side predicate on the scored expression,
    * so the result size is data-driven and the plan has no per-query state
    * at all. Radius 1.2 on unit-norm vectors ≡ cosine ≥ 0.28 — chosen to
    * return a non-trivial, non-exhaustive row set on the fixtures.
    */
  def rangeSearch(
      spark: SparkSession,
      sfDir: String,
      queryMaxId: Long = 8,
      radius: Double = 1.2): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb
      .filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    emb
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        VectorExpressions.l2(col("qv"), col("embedding")).as("dist"))
      .filter(col("dist") <= radius)
      .select(col("query_id"), col("neighbor_id"), Det.display(col("dist"), 4).as("dist4"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  def oracleRange(queryMaxId: Long = 8, radius: Double = 1.2): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |)
       |SELECT q.query_id, e.vec_id AS neighbor_id,
       |       floor(list_distance(CAST(e.embedding AS DOUBLE[]), q.qv) * 10000.0 + 0.5)
       |         / 10000.0 AS dist4
       |FROM embeddings e, q
       |WHERE e.vec_id <> q.query_id
       |  AND list_distance(CAST(e.embedding AS DOUBLE[]), q.qv) <= $radius
       |ORDER BY query_id, neighbor_id""".stripMargin

  // ---------------------------------------------------------------- q128

  /** q128 — HARD-NEGATIVE MINING: for each anchor, the k most-similar
    * vectors whose cosine falls in a similarity BAND `[lo, hi)` — close
    * enough to be informative negatives for contrastive embedding
    * training, but below the near-duplicate bar where they'd be false
    * negatives (the standard dense-retrieval recipe: mine negatives near
    * the decision boundary, exclude probable positives). The band is the
    * q119 range-search predicate composed with the q21 top-k rank; ids and
    * ranks out, so no float crosses the oracle compare (band boundary
    * comparisons are single IEEE ops on identically-derived doubles, the
    * q119 contract).
    *
    * Scale shape: identical to the exact-kNN scaffold — broadcast anchor
    * set, score in the scan projection, band filter BEFORE the rank
    * window so only in-band (ids, score) rows reach the exchange.
    */
  def hardNegatives(
      spark: SparkSession,
      sfDir: String,
      queryMaxId: Long = 4,
      k: Int = 10,
      lo: Double = 0.05,
      hi: Double = 0.25): DataFrame =
    topKScaffold(spark, sfDir, queryMaxId, k, identity,
        VectorExpressions.cosine, ascending = false,
        scoreFilter = s => s >= lo && s < hi)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))

  def oracleHardNegatives(
      queryMaxId: Long = 4, k: Int = 10,
      lo: Double = 0.05, hi: Double = 0.25): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), s AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, neighbor_id,
       |       CAST(row_number() OVER (
       |         PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
       |         AS INTEGER) AS rank
       |FROM s
       |WHERE sim >= $lo AND sim < $hi
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q130

  /** q130 — kNN LABEL-VOTE EVALUATION: classify each held-out query vector
    * by the majority label of its k nearest cosine neighbors and report
    * per-label accuracy — the standard embedding-quality probe (Fix &
    * Hodges' classic kNN classifier as an EVAL, the "linear probe"
    * companion every embedding pipeline runs before trusting a new model
    * drop: if nearest-neighbor labels can't predict a vector's own label,
    * the space is not organized enough to dedup or retrieve against).
    * Complements A10: recall measures how well the APPROXIMATE index
    * reproduces exact neighbors; this measures whether the exact neighbors
    * are any good.
    *
    * Scale shape: the corpus-sized work is the one scaffold scan (broadcast
    * query set, score in the scan projection, per-query top-k window) with
    * the neighbor LABEL carried through the projection — no corpus-sized
    * label join afterward; everything past the scaffold runs on |Q|·k
    * rows, and the query-label join broadcasts the |Q|-row query side.
    *
    * Determinism: neighbor sets are the q21 (sim, id)-tie-broken ranking;
    * votes are integer counts with (count desc, label asc) tie-break;
    * accuracy is integer ppm — no float crosses the oracle compare.
    */
  def knnLabelEval(
      spark: SparkSession,
      sfDir: String,
      queryMaxId: Long = 32,
      k: Int = 10): DataFrame =
    knnLabelEvalOf(Tables.embeddings(spark, sfDir), queryMaxId, k)

  /** The vote-eval core over ANY (vec_id, embedding, label) frame — the
    * gate wrapper binds the fixture table; specs drive it with planted
    * tight clusters (accuracy must be 100%) and planted mislabels.
    */
  def knnLabelEvalOf(emb: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    val hits = topKScaffoldOf(emb, queryMaxId, k, identity,
      VectorExpressions.cosine, ascending = false,
      carry = Seq(col("label").as("n_label")))
    val queryLabels = emb
      .filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("n_label").asc)
    hits
      .groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .join(broadcast(queryLabels), "query_id")
      .groupBy(col("q_label").as("label"))
      .agg(
        count(lit(1)).as("n_queries"),
        sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("n_correct * 1000000L div n_queries"))
      .orderBy(col("label"))
  }

  def oracleLabelEval(queryMaxId: Long = 32, k: Int = 10): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, label AS q_label,
       |         CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), d AS (
       |  SELECT q.query_id, q.q_label, e.label AS n_label,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim,
       |         e.vec_id AS neighbor_id
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id
       |), topk AS (
       |  SELECT query_id, q_label, n_label,
       |         row_number() OVER (
       |           PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM d QUALIFY rank <= $k
       |), v AS (
       |  SELECT query_id, q_label, n_label, count(*) AS n_votes
       |  FROM topk GROUP BY query_id, q_label, n_label
       |), p AS (
       |  SELECT query_id, q_label, n_label,
       |         row_number() OVER (
       |           PARTITION BY query_id ORDER BY n_votes DESC, n_label) AS vr
       |  FROM v
       |)
       |SELECT q_label AS label, count(*) AS n_queries,
       |       CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_correct,
       |       (CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
       |          AS BIGINT) * 1000000)
       |         // count(*) AS acc_ppm
       |FROM p WHERE vr = 1
       |GROUP BY q_label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q139

  /** Scaled-integer DCG position weights, `floor(1e6 / log2(i+1))` for
    * ranks 1..10, and their prefix sums (the ideal-DCG table). Computed
    * ONCE here and injected as literals into BOTH the Spark plan and the
    * oracle SQL — the transcendental log never runs on either engine at
    * query time, so nDCG stays bit-exact despite its real-valued
    * definition (the same fixed-constant trick as the q103 sqrt scaling).
    */
  private val dcgW: Seq[Long] =
    (1 to 10).map(i => (1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
  private val dcgCum: Seq[Long] = dcgW.scanLeft(0L)(_ + _).tail

  /** q139 — nDCG@k RETRIEVAL EVALUATION: for each query vector, the
    * normalized discounted cumulative gain of its cosine top-k under
    * binary same-label relevance — the standard graded retrieval metric
    * completing the eval triad (q125 recall: does the index reproduce
    * exact neighbors; q130 accuracy: do neighbor labels vote right; q139:
    * are the relevant hits ranked EARLY, which is what a RAG context
    * window actually consumes). Ideal DCG counts the query's corpus
    * relevant population (label size − self), capped at k; a query whose
    * label is a singleton has no achievable ideal and reports NULL.
    *
    * Determinism: neighbor sets are the q21 tie-broken ranking; gains and
    * ideals are sums of the fixed integer literals above; the one division
    * is integer ppm at the end.
    *
    * Scale shape: the q130 scaffold scan (label carried through the
    * projection) plus two broadcast-tiny joins (|Q| query labels,
    * label-cardinality corpus counts); everything past the scan is |Q|·k
    * rows.
    */
  def ndcgEval(
      spark: SparkSession,
      sfDir: String,
      queryMaxId: Long = 32,
      k: Int = 10): DataFrame =
    ndcgEvalOf(Tables.embeddings(spark, sfDir), queryMaxId, k)

  /** The eval core over ANY (vec_id, embedding, label) frame — specs
    * drive it with planted rankings of known gain.
    */
  def ndcgEvalOf(emb: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    require(k == dcgW.length, s"weight table is pinned for k=${dcgW.length}")
    val hits = topKScaffoldOf(emb, queryMaxId, k, identity,
      VectorExpressions.cosine, ascending = false,
      carry = Seq(col("label").as("n_label")))
    val queryLabels = emb
      .filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
    val labelCounts = emb.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("lbl_n"))
    hits
      .join(broadcast(queryLabels), "query_id")
      .withColumn("w", element_at(array(dcgW.map(lit): _*), col("rank")))
      .groupBy(col("query_id"), col("q_label"))
      .agg(sum(when(col("n_label") === col("q_label"), col("w"))
        .otherwise(0L)).as("dcg"))
      .join(broadcast(labelCounts), "q_label")
      .withColumn("r", least(col("lbl_n") - 1, lit(k.toLong)).cast("int"))
      .withColumn("ndcg_ppm",
        when(col("r") <= 0, lit(null).cast("long"))
          .otherwise(expr("dcg * 1000000L div " +
            s"element_at(array(${dcgCum.mkString("L,")}L), r)")))
      .select(col("query_id"), col("q_label").as("label"),
        col("dcg"), col("ndcg_ppm"))
      .orderBy(col("query_id"))
  }

  def oracleNdcgEval(queryMaxId: Long = 32, k: Int = 10): String = {
    require(k == dcgW.length, s"weight table is pinned for k=${dcgW.length}")
    val wCase = dcgW.zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }.mkString(" ")
    val cumCase = dcgCum.zipWithIndex
      .map { case (c, i) => s"WHEN ${i + 1} THEN $c" }.mkString(" ")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, label AS q_label,
       |         CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |), d AS (
       |  SELECT q.query_id, q.q_label, e.label AS n_label,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim,
       |         e.vec_id AS neighbor_id
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id
       |), topk AS (
       |  SELECT query_id, q_label, n_label,
       |         row_number() OVER (
       |           PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM d QUALIFY rank <= $k
       |), g AS (
       |  SELECT query_id, q_label,
       |         CAST(sum(CASE WHEN n_label = q_label
       |                       THEN CASE rank $wCase ELSE 0 END
       |                       ELSE 0 END) AS BIGINT) AS dcg
       |  FROM topk GROUP BY query_id, q_label
       |), c AS (
       |  SELECT label, count(*) AS lbl_n FROM embeddings GROUP BY label
       |)
       |SELECT query_id, q_label AS label, dcg,
       |       CASE WHEN least(lbl_n - 1, $k) <= 0 THEN NULL
       |            ELSE (dcg * 1000000)
       |              // (CASE least(lbl_n - 1, $k) $cumCase END) END
       |         AS ndcg_ppm
       |FROM g JOIN c ON c.label = g.q_label
       |ORDER BY query_id""".stripMargin
  }

  // ---------------------------------------------------------------- q123

  /** q123 — MMR DIVERSE RE-RANK (Maximal Marginal Relevance, Carbonell &
    * Goldstein 1998, public paper): re-rank a relevance-ordered candidate
    * pool so each pick balances relevance against redundancy with what was
    * already picked — `argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s)`. The
    * RAG / context-selection step after retrieval: a plain top-k hands the
    * model k near-copies of the best hit; MMR hands it k DIFFERENT
    * relevant passages.
    *
    * Two stages, matching the repo's bounded-collect budget:
    *  1. POOL (distributed): top-`pool` candidates by cosine relevance to
    *     the query — a broadcast-query scan + TakeOrderedAndProject, the
    *     same class as the A6 re-rank. This is the only corpus-sized work.
    *  2. GREEDY (driver): MMR selection is inherently sequential (pick i+1
    *     depends on picks 1..i), so it runs on the collected pool — `pool`
    *     rows by `dim` floats, the same k1-bounded budget as the A6 rerank
    *     set and the BPE argmax collects. O(k·pool) driver cosines.
    *
    * Determinism: relevance and pairwise similarities are scaled to integer
    * ppm (half-away-from-zero, the CentroidAgg convention) BEFORE the
    * argmax, so selection compares exact longs — `λppm·rel_ppm −
    * (1e6−λppm)·maxsim_ppm` — with smaller-id tie-breaks; the driver loop
    * is single-threaded. Rows-only gate (greedy recursion is not
    * reasonably SQL-expressible); pinned by RetrievalSpec: λ=1 ≡ pure
    * relevance ranking, planted-duplicate eviction, pool-subset, and a
    * driver recompute.
    */
  def mmrRerank(
      spark: SparkSession,
      sfDir: String,
      queryId: Long = 0L,
      pool: Int = 50,
      k: Int = 10,
      lambdaPpm: Long = 500000L): DataFrame =
    mmrRerankOf(spark, Tables.embeddings(spark, sfDir), queryId, pool, k, lambdaPpm)

  /** The pool + greedy core over ANY (vec_id, embedding) frame — the gate
    * wrapper binds the fixture table; specs drive it with planted pools.
    */
  def mmrRerankOf(
      spark: SparkSession,
      emb: DataFrame,
      queryId: Long,
      pool: Int,
      k: Int,
      lambdaPpm: Long): DataFrame = {
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L, s"lambdaPpm out of [0,1e6]: $lambdaPpm")
    import spark.implicits._
    val qdf = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    val cand = emb
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qdf))
      .select(col("vec_id"),
        col("embedding"),
        VectorExpressions.cosine(col("embedding"), col("qv")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(pool)
      .collect()
    def ppm(x: Double): Long =
      math.floor(x * 1e6 + 0.5).toLong // house half-up quantizer (Det.quant)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val remaining = scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Long)]()
    cand.foreach(r =>
      remaining += ((r.getLong(0), r.getSeq[Float](1).toArray, ppm(r.getDouble(2)))))
    // Per-candidate running max similarity to the chosen set, updated with
    // ONLY the newly chosen vector each round — O(k·pool) driver cosines
    // total; recomputing the full chosen set per candidate per round would
    // be O(k²·pool) for identical selections.
    val maxSimPpm = scala.collection.mutable.ArrayBuffer.fill(remaining.length)(Long.MinValue)
    var anyChosen = false
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      var bestIdx = -1
      var bestScore = Long.MinValue
      var bestId = Long.MaxValue
      var i = 0
      while (i < remaining.length) {
        val (id, _, relPpm) = remaining(i)
        val maxSim = if (!anyChosen) 0L else maxSimPpm(i)
        val score = lambdaPpm * relPpm - (1000000L - lambdaPpm) * maxSim
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestIdx = i; bestScore = score; bestId = id
        }
        i += 1
      }
      val (id, v, relPpm) = remaining.remove(bestIdx)
      maxSimPpm.remove(bestIdx)
      anyChosen = true
      var j = 0
      while (j < remaining.length) {
        val s = ppm(cos(remaining(j)._2, v))
        if (s > maxSimPpm(j)) maxSimPpm(j) = s
        j += 1
      }
      out += ((rank, id, relPpm, bestScore))
      rank += 1
    }
    out.toSeq.toDF("rank", "vec_id", "rel_ppm", "mmr_score")
  }
}
