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

  /** Every frame pinned since the last [[releaseAll]] drain. Producers whose
    * pinned frame escapes into a lazily-consumed query (the shingle unit
    * table in [[Text.bandedNearDups]], the final labels in
    * [[Components.connectedComponents]]) cannot release inline — without a
    * registry each call leaks a corpus-scale block set for the session's
    * lifetime (the r3-ADVICE leak class, generalized). Harness drain points:
    * Bench between timed queries, Verify between dumps.
    */
  private val pinnedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Monotone count of [[stable]] calls this JVM — lets a caller detect
    * "did building this frame pin anything?" ([[graft.Plans]] refuses to
    * cache such plans: their blocks are drained by the harness'
    * releaseAll() between queries, and a cached plan over released
    * checkpoint blocks fails on re-execution).
    */
  private val pinCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  def pinCount: Long = pinCounter.get()

  /** Pin a frame; `eager` forces materialization now (otherwise the
    * caller's first action does).
    */
  def stable(df: DataFrame, eager: Boolean = false): DataFrame = {
    pinCounter.incrementAndGet()
    val p =
      if (reliable(df.sparkSession)) {
        val d = df.persist(StorageLevel.DISK_ONLY)
        if (eager) d.count()
        d
      } else df.localCheckpoint(eager)
    pinnedFrames.add(p)
    p
  }

  /** Pin a CORPUS-DERIVED frame and probe whether it fits a row ceiling:
    * one bounded `limit(max+1).count()` job on the pinned artifact (the
    * [[Components.DriverSolveMaxEdges]] bounded-budget discipline — never
    * an unbounded count or collect) decides the caller's broadcast-vs-
    * shuffle branch. The pin means the deciding probe and the downstream
    * join consume ONE materialization of the producer, not two. Shared by
    * every operator whose small side scales with CORPUS properties rather
    * than a dimension's (the q192/q193 duplicated-line dictionary, the
    * q126 cluster-assignment table): dimension tables broadcast
    * unconditionally, corpus-derived ones must prove they fit.
    */
  def pinnedFits(df: DataFrame, maxRows: Long): (DataFrame, Boolean) = {
    val pinned = stable(df, eager = true)
    val probeN = math.min(maxRows, Int.MaxValue.toLong - 1).toInt
    (pinned, pinned.limit(probeN + 1).count() <= probeN)
  }

  /** Drop blocks of every registered pin. Safe at any point where no pinned
    * frame is still lazily pending (both release paths are idempotent, so
    * frames already released inline by their producer are no-ops here).
    */
  def releaseAll(): Unit = {
    var d = pinnedFrames.poll()
    while (d != null) {
      release(d)
      d = pinnedFrames.poll()
    }
  }

  /** Drop a pinned frame's blocks once no consumer remains. Covers both
    * modes: `unpersist` clears a persisted plan's cache entry;
    * checkpointed plans hold their blocks on the backing RDD, reachable
    * only through the internal accessor.
    *
    * Also removes the frame from the registry (Dataset has no `equals`
    * override, so `remove` matches by identity — exactly the instance
    * [[stable]] enqueued). Without this, producers that DO release inline
    * (e.g. [[graft.operators.Index.append]], called once per micro-batch by
    * the streaming append sinks, forever) still grow the queue by one
    * released-but-referenced plan graph per call — an unbounded driver-heap
    * leak in long-running streams that no harness drain point ever serves.
    */
  def release(df: DataFrame): Unit = {
    pinnedFrames.remove(df)
    df.unpersist(blocking = false)
    org.apache.spark.sql.graft.GraftInternals.unpersistCheckpoint(df)
  }
}
