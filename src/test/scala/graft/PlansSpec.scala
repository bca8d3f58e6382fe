package graft

/** The prepared-query cache's contracts ([[Plans]]): instance reuse for
  * repeated invocations, result equality with a fresh build, pin-during-
  * build exclusion (the harness drains pins between queries), and bump
  * invalidation.
  */
class PlansSpec extends SparkSpec {

  test("repeated invocation serves the prepared plan; results stay identical") {
    val a = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    val r1 = a.collect().map(_.toSeq).toSeq
    graft.operators.Materialize.releaseAll() // the bench's between-queries drain
    val b = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    assert(a eq b, "a repeated (session, query, sfDir) must reuse the prepared plan")
    assert(b.collect().map(_.toSeq).toSeq == r1,
      "re-executing the prepared plan must reproduce the rows")
  }

  test("a build that pins blocks is served uncached (drain-safe)") {
    // q175 pins its delivery during construction; caching it would hand a
    // released-checkpoint plan to the second invocation.
    val a = SparkEntry.queries("q175_prepare_corpus_increment")(spark, sf0001)
    val r1 = a.collect().map(_.toSeq).toSeq
    graft.operators.Materialize.releaseAll()
    val b = SparkEntry.queries("q175_prepare_corpus_increment")(spark, sf0001)
    assert(!(a eq b), "pin-building queries must not be cached")
    assert(b.collect().map(_.toSeq).toSeq == r1)
    graft.operators.Materialize.releaseAll()
  }

  test("a rewritten fixture re-prepares WITHOUT a bump (mtime in the key)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def writeDocs(sfDir: java.io.File, rows: Int): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("graft-plansspec-").toFile
      (1 to rows).map(_.toLong).toDF("doc_id")
        .select(col("doc_id"), concat(lit("text "), col("doc_id")).as("text"),
          lit("s").as("source"), lit("en").as("lang"))
        .coalesce(1).write.mode("overwrite").parquet(staging.getAbsolutePath)
      val part = staging.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(sfDir, "documents.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val sfDir = java.nio.file.Files.createTempDirectory("graft-plansspec-sf-").toFile
    writeDocs(sfDir, 10)
    val n1 = SparkEntry.queries("q32_exact_dedup")(spark, sfDir.getAbsolutePath).count()
    writeDocs(sfDir, 25) // regenerate — no bump()
    val n2 = SparkEntry.queries("q32_exact_dedup")(spark, sfDir.getAbsolutePath).count()
    assert(n1 != n2 && n2 > n1,
      s"rewritten fixture served stale prepared plan: n1=$n1 n2=$n2")
  }

  test("bump invalidates the prepared plan") {
    val a = SparkEntry.queries("q12_global_top_orders")(spark, sf0001)
    Readers.bump()
    val b = SparkEntry.queries("q12_global_top_orders")(spark, sf0001)
    assert(!(a eq b), "a lifecycle bump must re-prepare")
    assert(a.collect().map(_.toSeq).toSeq == b.collect().map(_.toSeq).toSeq)
  }
}
