package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Connected components over a pair list — the step that turns near-duplicate
  * PAIRS into dedup GROUPS (a training-data pipeline keeps one document per
  * component, not per pair: pairs (a,b) and (b,c) must collapse to one
  * cluster even though (a,c) was never emitted).
  *
  * Algorithm: iterative min-label propagation on DataFrames — every vertex
  * starts as its own label; each round takes the min of its own and its
  * neighbors' labels; fixpoint when no label changes. Converges in
  * O(component diameter) rounds; near-dup graphs are dense clique-ish blobs,
  * so the diameter is tiny (2-3 rounds on the fixtures).
  *
  * Scale notes (100 TB): each round is one equi-join of the edge list with
  * the label table plus a min-aggregate — all shuffle-partitionable on vertex
  * id, no driver-side graph. Each round is pinned via [[Materialize]] so
  * the plan stays flat — executor-local checkpoint by default, recomputable
  * DISK_ONLY under `spark.graft.reliableMaterialize=true` for cluster runs
  * where executor loss is routine. For graphs whose diameter is
  * genuinely large, the classic fix is the small-star/large-star alternation
  * (Kiveris et al., "Connected Components in MapReduce", public) — same
  * join-per-round shape, fewer rounds; unnecessary for near-dup clustering.
  */
object Components {

  /** (vertex, component) for every vertex, component = min vertex id
    * reachable through `edges` (i, j). Vertices not in any edge keep their
    * own id.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val bidir = Materialize.stable(
      edges.select(col("i").as("src"), col("j").as("dst"))
        .union(edges.select(col("j").as("src"), col("i").as("dst"))), eager = true)
    var labels = Materialize.stable(
      vertices.select(col("v"), col("v").as("label")), eager = true)
    // The PINNED frame backing `labels` — released per round. (`labels`
    // itself becomes a projection over it; releasing the projection would
    // miss the persisted-mode cache entry, whose key is the pinned plan.)
    var pinned = labels
    var changed = 1L
    while (changed > 0) {
      val nbrMin = bidir
        .join(labels.select(col("v").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("v"))
        .agg(min(col("nl")).as("mn"))
      // The change flag rides the propagation join, so detecting the
      // fixpoint is a trivial aggregate over the checkpointed round — not a
      // second join against the previous labels.
      // Lazy checkpoint: the fixpoint aggregate below is the action that
      // materializes the round (one job, not materialize-then-aggregate);
      // later rounds read the cached blocks.
      val next = labels
        .join(nbrMin, Seq("v"), "left")
        .select(
          col("v"),
          least(col("label"), coalesce(col("mn"), col("label"))).as("label"),
          coalesce(col("mn") < col("label"), lit(false)).as("chg"))
        .transform(Materialize.stable(_))
      // coalesce: sum over zero rows is NULL — an empty vertex set must
      // terminate, not NPE
      changed = next.agg(coalesce(sum(when(col("chg"), 1L).otherwise(0L)), lit(0L)))
        .first().getLong(0)
      // The fixpoint aggregate above materialized this round's blocks, so
      // the previous round's are dead — free them now, or every round of
      // every call leaks storage memory for the session's lifetime.
      Materialize.release(pinned)
      pinned = next
      labels = next.drop("chg")
    }
    // The returned labels are materialized; the edge list served its last
    // propagation round.
    Materialize.release(bidir)
    labels
  }

  /** q68 — dedup clusters over the bounded near-dup sample: components of
    * the exact-Jaccard(≥0.8) pair graph, one row per sampled doc with its
    * cluster id (= min doc_id in the component) and a per-cluster canonical
    * flag. Oracle: DuckDB recursive-CTE transitive closure — exhaustively
    * correct on the bounded sample; at corpus scale the edge list comes from
    * [[Text.minhashNearDups]] instead and the oracle is the spec's
    * union-find cross-check.
    */
  def dedupClusters(
      spark: SparkSession,
      sfDir: String,
      maxDocId: Long = 100,
      threshold: Double = 0.8): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < maxDocId).select(col("doc_id").as("v"))
    val edges = Text.jaccardPairs(spark, sfDir, maxDocId, threshold)
      .select(col("i"), col("j"))
    connectedComponents(docs, edges)
      .select(
        col("v").as("doc_id"), col("label").as("cluster_id"),
        (col("v") === col("label")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  def dedupClustersOracle(maxDocId: Long = 100, threshold: Double = 0.8): String =
    s"""WITH RECURSIVE doc AS (SELECT * FROM documents WHERE doc_id < $maxDocId),
       |tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM doc),
       |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
       |  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT i, j FROM pairs
       |  JOIN sz sa ON i = sa.doc_id
       |  JOIN sz sb ON j = sb.doc_id
       |  WHERE common / (sa.sz + sb.sz - common) >= $threshold),
       |bidir AS (SELECT i AS src, j AS dst FROM edges
       |          UNION ALL SELECT j, i FROM edges),
       |reach AS (
       |  SELECT doc_id AS src, doc_id AS dst FROM doc
       |  UNION
       |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src)
       |SELECT src AS doc_id, min(dst) AS cluster_id,
       |       (src = min(dst)) AS is_canonical
       |FROM reach
       |GROUP BY src
       |ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_dedup_clusters" -> ((s: SparkSession, d: String) => dedupClusters(s, d)))

  val oracles: Map[String, String] = Map(
    "q68_dedup_clusters" -> dedupClustersOracle())
}
