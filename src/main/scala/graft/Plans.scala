package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** PREPARED-QUERY cache — the statement-cache layer every serving engine
  * puts in front of a per-request query compiler (the reference's ES
  * parses+compiles a query per request but caches filters, weights, and
  * segment structures; a SQL engine keeps prepared statements). Spark has
  * no such cache: every `queries(name)(spark, dir)` call rebuilds the
  * DataFrame operator by operator, and EVERY intermediate Dataset is
  * eagerly analyzed, so a ~30-operator gate query pays ~29 analyzer
  * invocations per call — measured at 12–17 ms of Catalyst rule time per
  * query per invocation over the gate surface (tools/RuleTiming:
  * ResolveReferences + DeduplicateRelations + ResolveFunctions dominate),
  * re-paid identically on each of the bench's 3 reps and by every caller
  * of a repeated query.
  *
  * This memo hands the SAME DataFrame instance back for a repeated
  * (session, epoch, query, sfDir) key — re-executing one identical plan
  * instance is the ordinary `df.count(); df.count()` pattern and shares
  * nothing ACROSS queries, so the r5 shared-plan-instance hazard
  * ([[Readers]] scaladoc: a leaf instance appearing in two DIFFERENT
  * composed plans trips a Catalyst constraint-inference bug) does not
  * apply: each cached entry was built through [[Readers]]' fresh
  * `newInstance()` leaf copies and is never composed into another plan by
  * this layer.
  *
  * Exclusions and invalidation:
  *   - A build that PINNED frames ([[graft.operators.Materialize.stable]]
  *     during construction — the q175 delivery pin, the shingle unit
  *     tables) is returned UNCACHED: the harness drains pins between
  *     queries (releaseAll), and a cached plan over released localCheckpoint
  *     blocks fails on re-execution. Detected via [[Materialize.pinCount]]
  *     around the build — zero per-query bookkeeping.
  *   - [[Readers.bump]] clears this cache (the key also carries the epoch,
  *     so a stale entry is unreachable even mid-race): every lifecycle
  *     mutation re-prepares, the same staleness contract as the relation
  *     memo. The key additionally carries every fixture's mtime, so a
  *     fixture regenerated within a session re-prepares WITHOUT a bump
  *     (PlansSpec pins it).
  */
object Plans {

  private val memo = new ConcurrentHashMap[String, DataFrame]()

  private[graft] def clear(): Unit = memo.clear()

  def cached(name: String, spark: org.apache.spark.sql.SparkSession, sfDir: String)(
      build: => DataFrame): DataFrame = {
    // The key carries every fixture's mtime (10 local stats, ~26 µs each):
    // a fixture regenerated WITHIN a session re-prepares without a bump —
    // the same per-call freshness the relation memo's fixture keys give,
    // lifted to the whole prepared plan (whose ensure* artifact paths were
    // resolved at build time and would otherwise go stale together).
    val fixtures = Tables.names
      .map(t => Tables.fixtureMtime(spark, s"$sfDir/$t.parquet"))
      .mkString(",")
    val key = Readers.planKey(spark, s"$name:$sfDir:$fixtures")
    val hit = memo.get(key)
    if (hit != null) hit
    else {
      // Build OUTSIDE any lock: builders run Spark jobs (ensure* artifact
      // builds, model fits) — the Memo.once discipline. A racing double
      // build is benign (equal plans; first insert wins) EXCEPT that the
      // loser's plan is simply returned uncached.
      val pinsBefore = graft.operators.Materialize.pinCount
      val df = build
      if (graft.operators.Materialize.pinCount != pinsBefore) df
      else {
        val prev = memo.putIfAbsent(key, df)
        if (prev != null) prev else df
      }
    }
  }
}
