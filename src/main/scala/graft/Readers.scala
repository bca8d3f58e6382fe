package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memoized parquet readers — the engine's (tiny) catalog cache.
  *
  * Every `spark.read.parquet(path)` resolves the source from scratch: a
  * driver file listing plus a footer schema-inference job. Per call that is
  * only tens of milliseconds, but the bench surface re-reads the same ~10
  * fixture tables and ~15 persisted store/index layouts for EVERY query, so
  * the resolution jobs alone were a measurable slice of total bench time —
  * and on a real cluster the same pattern is an object-store LIST + GET per
  * query against paths whose schema never changes. A catalog (Hive
  * metastore, Delta log) is the production answer; this memo is the same
  * idea scoped to path-based reads: resolve once per (session, path), hand
  * back the immutable logical plan.
  *
  * Staleness contract: fixture tables are immutable (additionally keyed by
  * mtime so a rewritten test fixture re-resolves), but index/store layouts
  * MUTATE through the lifecycle ops (append/delete/compact/vacuum/adopt and
  * the store swap protocol). A memoized DataFrame pins its file-listing
  * snapshot, so every mutation entry point calls [[bump]], which
  * invalidates the whole memo (coarse on purpose: mutations are rare
  * maintenance events; queries are the hot path — re-resolving everything
  * after a mutation costs one listing round, while a forgotten path-scoped
  * invalidation would serve stale rows). All mutations in this codebase go
  * through [[graft.operators.Lifecycle]] / [[graft.operators.Index]] /
  * the store builders, each of which bumps.
  */
object Readers {

  private val epoch = new AtomicLong(0L)
  private val memo = new ConcurrentHashMap[String, DataFrame]()

  /** Invalidate every memoized reader (called by lifecycle mutations). */
  def bump(): Unit = {
    epoch.incrementAndGet()
    memo.clear()
  }

  private def keyOf(spark: SparkSession, path: String, extra: String): String =
    s"${System.identityHashCode(spark)}:${epoch.get()}:$extra:$path"

  /** Memoized `spark.read.parquet(path)` for a MUTABLE layout dir —
    * invalidated by [[bump]] on any lifecycle mutation. A dir carrying a
    * live `_spark_metadata` sink log is NEVER memoized: a bootstrap
    * streaming sink appends files without any lifecycle hook to bump, so
    * each read must re-list. (Local-fs probe; on a remote fs the adopt
    * step's bump is the contract.)
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(stripScheme(path), "_spark_metadata").exists())
      spark.read.parquet(path)
    else
      memo.computeIfAbsent(keyOf(spark, path, ""), _ => spark.read.parquet(path))

  /** Memoized read for an IMMUTABLE fixture file/dir — additionally keyed
    * by mtime, so a rewritten test fixture re-resolves without a bump.
    */
  def fixtureParquet(spark: SparkSession, path: String): DataFrame = {
    val mtime = new java.io.File(stripScheme(path)).lastModified
    memo.computeIfAbsent(keyOf(spark, path, mtime.toString),
      _ => spark.read.parquet(path))
  }

  private def stripScheme(path: String): String =
    if (path.startsWith("file:")) path.stripPrefix("file:") else path
}
