package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** One policy for pinning a frame that feeds multiple consumers or iterative
  * rounds (the shingle unit table in [[Text]], the label/edge tables in
  * [[Components]]).
  *
  * Default: `localCheckpoint` — fastest (executor-local blocks, no
  * replication, lineage truncated so iterative plans stay flat). Its cost is
  * durability: lineage is GONE, so losing any executor kills every query
  * reading the blocks. Acceptable single-JVM; wrong for a 1000-executor run
  * where some loss is routine.
  *
  * Reliable mode (`spark.graft.reliableMaterialize=true`): persist to
  * DISK_ONLY with lineage KEPT — an executor loss recomputes the lost
  * partitions instead of failing the query, and corpus-sized intermediates
  * spill to disk instead of competing for storage memory. The tradeoff is
  * recompute-on-loss cost and non-truncated lineage (fine for the flat
  * producers used here; iterative callers re-pin every round, which also
  * bounds plan growth).
  */
object Materialize {

  val ConfKey = "spark.graft.reliableMaterialize"

  def reliable(spark: SparkSession): Boolean =
    spark.conf.getOption(ConfKey).exists(_.toBoolean)

  /** Pin a frame; `eager` forces materialization now (otherwise the
    * caller's first action does).
    */
  def stable(df: DataFrame, eager: Boolean = false): DataFrame =
    if (reliable(df.sparkSession)) {
      val p = df.persist(StorageLevel.DISK_ONLY)
      if (eager) p.count()
      p
    } else df.localCheckpoint(eager)

  /** Drop a pinned frame's blocks once no consumer remains. Covers both
    * modes: `unpersist` clears a persisted plan's cache entry;
    * checkpointed plans hold their blocks on the backing RDD, reachable
    * only through the internal accessor.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    org.apache.spark.sql.graft.GraftInternals.unpersistCheckpoint(df)
  }
}
