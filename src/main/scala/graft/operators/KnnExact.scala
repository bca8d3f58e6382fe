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
      corpusFilter: Column = lit(true)): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb
      .filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), proj(col("embedding")).as("qv"))
    val scored = emb
      .filter(corpusFilter)
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        score(col("qv"), proj(col("embedding"))).as("score"))
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
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("score"), 4).as("dist4"))
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
       |       round(dist, 4) AS dist4
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
         |SELECT query_id, neighbor_id, rank, round(dist, 4) AS dist4 FROM (
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
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("score"), 4).as("dist4"))
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
       |       round(dist, 4) AS dist4
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
      .select(col("query_id"), col("neighbor_id"), round(col("dist"), 4).as("dist4"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  def oracleRange(queryMaxId: Long = 8, radius: Double = 1.2): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $queryMaxId
       |)
       |SELECT q.query_id, e.vec_id AS neighbor_id,
       |       round(list_distance(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS dist4
       |FROM embeddings e, q
       |WHERE e.vec_id <> q.query_id
       |  AND list_distance(CAST(e.embedding AS DOUBLE[]), q.qv) <= $radius
       |ORDER BY query_id, neighbor_id""".stripMargin
}
