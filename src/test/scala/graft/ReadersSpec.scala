package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions.col

/** The schema/artifact memo's contracts: memoization, bump invalidation,
  * re-entrant loads (a loader that loads another artifact must not hit a
  * "Recursive update" on the shared map), and the sink-live-dir probe.
  */
class ReadersSpec extends SparkSpec {

  test("artifact memo: loads once, bump invalidates, post-bump lookups reload") {
    val loads = new AtomicInteger(0)
    def load(): String = { loads.incrementAndGet(); "model-doc" }
    val p = s"/graft-test/readers-memo-${System.nanoTime()}"
    assert(Readers.artifact(spark, p)(load()) == "model-doc")
    assert(Readers.artifact(spark, p)(load()) == "model-doc")
    assert(loads.get() == 1, "second lookup must be served from the memo")
    Readers.bump()
    assert(Readers.artifact(spark, p)(load()) == "model-doc")
    assert(loads.get() == 2, "bump must invalidate the memoized artifact")
  }

  test("relation memo: fresh expression ids per call; self-joins and the HOF/constraint class stay sound") {
    // Two reads of one fixture must NOT share attribute ids — the relation
    // memo hands out newInstance() copies precisely so downstream plans see
    // what a fresh spark.read produces (the r5 shared-plan-instance bug
    // class: shared leaf lazy state + InferFiltersFromConstraints mis-
    // pushed a higher-order-function filter; memoizing instances is how it
    // was triggered).
    val a = Tables.documents(spark, sf0001)
    val b = Tables.documents(spark, sf0001)
    assert(a.queryExecution.analyzed.output.head.exprId !=
      b.queryExecution.analyzed.output.head.exprId,
      "memoized reads must not share expression ids")
    // a self-join built from two independent reads resolves and executes
    val n = a.select(col("doc_id"))
      .join(b.select(col("doc_id").as("d2")), col("doc_id") === col("d2"))
      .count()
    assert(n == a.count(), "fixture self-join must match row-for-row")
    // the r5 trigger shape — a forall() HOF filter over a cross join of a
    // memoized read with a broadcast local relation — must optimize and run
    // even with constraint propagation ENABLED (the canonical sessions turn
    // it off for planning speed, not correctness; a library user may not)
    val conf = spark.conf
    val prev = conf.get("spark.sql.constraintPropagation.enabled")
    try {
      conf.set("spark.sql.constraintPropagation.enabled", "true")
      val got = graft.operators.Retrieval.percolate(spark, sf0001).collect()
      assert(got.nonEmpty, "percolate must return every registered query row")
    } finally conf.set("spark.sql.constraintPropagation.enabled", prev)
  }

  test("parquet: an out-of-band file append re-resolves WITHOUT a bump") {
    // The child-listing signature safety net: an external writer dropping a
    // file into a mutable layout dir (no bump(), no lifecycle hook) must
    // not be served the stale memoized listing. Covers the two blind spots
    // of the old dir-mtime key — a same-mtime-tick rewrite (length change)
    // and a file landing after the dir was first memoized.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-readers-oob-").toString
    Seq(1L, 2L, 3L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    assert(Readers.parquet(spark, dir).count() == 3)
    // out-of-band append: copy the existing part file under a new name —
    // exactly what an external writer (another JVM, a manual cp) does
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir, "part-external-copy.parquet").toPath)
    assert(Readers.parquet(spark, dir).count() == 6,
      "appended file must be visible without a bump (child-listing key)")
    // and removal re-resolves too
    new java.io.File(dir, "part-external-copy.parquet").delete()
    assert(Readers.parquet(spark, dir).count() == 3)
  }

  test("artifact memo: a loader may itself load another artifact (re-entrancy)") {
    // Under the old computeIfAbsent shape this pattern could throw
    // IllegalStateException("Recursive update") or deadlock when the two
    // keys hash to one bin — the load now runs outside the map lock, so a
    // composite artifact (e.g. an index doc that pulls its quantizer doc)
    // is legal by contract, whatever the bin layout.
    val t = System.nanoTime()
    val outer = Readers.artifact(spark, s"/graft-test/outer-$t") {
      val inner = Readers.artifact(spark, s"/graft-test/inner-$t")("inner-doc")
      s"outer-wraps-$inner"
    }
    assert(outer == "outer-wraps-inner-doc")
    // and the inner artifact is itself memoized for direct lookups
    assert(Readers.artifact(spark, s"/graft-test/inner-$t")("NEVER") == "inner-doc")
  }

  test("artifact memo: a bump racing the load window is never stale-served") {
    // Keys carry the epoch, so a load that started pre-bump inserts under
    // the OLD epoch's key; the first post-bump lookup must run its loader.
    val p = s"/graft-test/readers-race-${System.nanoTime()}"
    val raced = Readers.artifact(spark, p) {
      Readers.bump() // a lifecycle mutation lands mid-load
      "pre-bump-doc"
    }
    assert(raced == "pre-bump-doc", "the in-flight caller keeps its own load")
    assert(Readers.artifact(spark, p)("post-bump-doc") == "post-bump-doc",
      "a post-bump lookup must reload, not see the raced pre-bump insert")
  }

  test("Memo.once: loads once, serves cached, and tolerates re-entrant loads") {
    val map = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val loads = new AtomicInteger(0)
    def load(): String = { loads.incrementAndGet(); "model" }
    assert(Memo.once(map, "a")(load()) == "model")
    assert(Memo.once(map, "a")(load()) == "model")
    assert(loads.get() == 1, "second lookup must hit the memo")
    // a loader that loads through the SAME map (the model-cache chain
    // pattern, e.g. a composite fit pulling a sub-model) must not throw
    // ConcurrentHashMap's "Recursive update"
    val nested = Memo.once(map, "outer")(Memo.once(map, "inner")("sub") + "+outer")
    assert(nested == "sub+outer" && map.get("inner") == "sub")
  }

  test("Memo.onceExclusive: same-key loads serialize to exactly one loader run") {
    // The side-effecting-loader variant (artifact WRITES on the miss path):
    // N racing threads on one key must produce ONE load, not a benign-
    // double-load race of Overwrite jobs on one artifact directory.
    val map = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val loads = new AtomicInteger(0)
    val key = s"excl-${System.nanoTime()}"
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val v = Memo.onceExclusive(map, key) {
          loads.incrementAndGet()
          Thread.sleep(50) // widen the race window the lock must close
          "artifact"
        }
        assert(v == "artifact")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(loads.get() == 1, s"side-effecting loader ran ${loads.get()} times")
    // distinct keys never block each other's or this key's cached reads
    assert(Memo.onceExclusive(map, key)("NEVER") == "artifact")
  }

  test("parquet: schema memo serves until bump; sink-live probe holds across URI forms") {
    val dir = java.nio.file.Files.createTempDirectory("graft-readers-mut").toString
    val one = spark.range(1).select(col("id").as("a"))
    one.write.mode("overwrite").parquet(dir)
    assert(Readers.parquet(spark, dir).columns.toSeq == Seq("a"))
    // a layout REWRITE is detected even WITHOUT its lifecycle bump on a
    // local fs: the relation/schema memo keys by the dir's own mtime, so
    // the rewrite re-resolves (on an object store the dir mtime
    // degenerates to a constant and the bump contract alone carries
    // invalidation — the pre-r8 behavior)...
    one.select(col("a").as("b")).write.mode("overwrite").parquet(dir)
    assert(Readers.parquet(spark, dir).columns.toSeq == Seq("b"))
    // ...and a bump re-resolves regardless of mtime
    Readers.bump()
    assert(Readers.parquet(spark, dir).columns.toSeq == Seq("b"))

    // the sink probe: false for a plain layout, true once a _spark_metadata
    // log appears — including through a scheme-qualified URI, which the old
    // java.io.File probe could only handle for the local scheme (a remote
    // URI silently probed false and memoized a sink-live dir's schema)
    assert(!Readers.sinkLive(spark, dir))
    assert(!Readers.sinkLive(spark, s"file:$dir"))
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir, "_spark_metadata"))
    assert(Readers.sinkLive(spark, dir))
    assert(Readers.sinkLive(spark, s"file:$dir"))
    assert(Readers.sinkLive(spark, s"file://$dir"))
    // unreachable path: probe false, no throw — the read raises the error
    assert(!Readers.sinkLive(spark, s"$dir/definitely/absent"))
  }
}
