package graft

import org.apache.spark.sql.functions._

/** The base-table ingest layout's cache contract ([[Tables.ensureIngested]]):
  * which sources re-lay (single files past the size floor), which bypass
  * (directories, small files), and how the cache key behaves under the
  * nasty rewrite case — a regenerated fixture landing within one
  * mtime-granularity tick of its predecessor.
  */
class TablesSpec extends SparkSpec {

  /** Write `rows` of incompressible ~200-char text as a SINGLE parquet FILE
    * at `sfDir/documents.parquet` — the driver's fixture shape (a file, not
    * a directory). Returns the file.
    */
  private def writeFixtureFile(sfDir: java.io.File, rows: Int, salt: String): java.io.File = {
    import spark.implicits._
    val staging = java.nio.file.Files.createTempDirectory("graft-tablesspec-stage-").toFile
    // sha2 hex of the salted id defeats parquet compression so the file
    // clears IngestRelayoutMinBytes with a modest row count
    (1 to rows).map(_.toLong).toDF("doc_id")
      .select(col("doc_id"),
        concat_ws("", (0 until 3).map(i =>
          sha2(concat(lit(salt), col("doc_id").cast("string"), lit(i)), 256)): _*)
          .as("text"))
      .coalesce(1)
      .write.mode("overwrite").parquet(staging.getAbsolutePath)
    val part = staging.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(sfDir, "documents.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst
  }

  test("ingest layout: a large single-file fixture re-lays; rows identical; probe layout greppable") {
    val sfDir = java.nio.file.Files.createTempDirectory("graft-tablesspec-sf-").toFile
    val f = writeFixtureFile(sfDir, rows = 2000, salt = "v1")
    assert(f.length() >= 256L * 1024, s"fixture must clear the re-layout floor, got ${f.length()}")
    val df = Tables.load(spark, sfDir.getAbsolutePath, "documents")
    assert(df.count() == 2000)
    // served from the engine-ingested layout, with the table name kept in
    // the layout dir so plans stay greppable by table
    val files = df.select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(files.forall(_.contains("graft-ingest-documents-")),
      s"expected the ingested layout, got ${files.take(2).mkString(",")}")
    assert(files.length > 1, "re-layout must yield a splittable multi-file table")
  }

  test("ingest layout: a same-mtime-tick rewrite serves the NEW rows (length in the cache key)") {
    val sfDir = java.nio.file.Files.createTempDirectory("graft-tablesspec-sf-").toFile
    val f1 = writeFixtureFile(sfDir, rows = 2000, salt = "gen1")
    val mtime1 = 1700000000000L // a coarse whole-second stamp
    assert(f1.setLastModified(mtime1))
    assert(Tables.load(spark, sfDir.getAbsolutePath, "documents").count() == 2000)
    // regenerate WITHIN the same mtime tick: new content, new length, the
    // OLD mtime forced back — the coarse-filesystem rewrite a pure-mtime
    // key is blind to
    val f2 = writeFixtureFile(sfDir, rows = 2500, salt = "gen2")
    assert(f2.setLastModified(mtime1))
    assert(Tables.load(spark, sfDir.getAbsolutePath, "documents").count() == 2500,
      "same-tick rewrite must re-lay (the length term of the cache signature)")
    // no bump() was needed; an explicit bump must of course also stay correct
    Readers.bump()
    assert(Tables.load(spark, sfDir.getAbsolutePath, "documents").count() == 2500)
  }

  test("ingest layout: a directory source bypasses re-layout; a small file is served as-is") {
    import spark.implicits._
    // directory source — already a multi-file layout, re-laying it would
    // re-copy the corpus for nothing
    val sfDir = java.nio.file.Files.createTempDirectory("graft-tablesspec-sf-").toFile
    val dir = new java.io.File(sfDir, "documents.parquet")
    (1 to 4000).map(_.toLong).toDF("doc_id")
      .select(col("doc_id"),
        concat_ws("", (0 until 3).map(i =>
          sha2(concat(col("doc_id").cast("string"), lit(i)), 256)): _*).as("text"))
      .repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val viaDir = Tables.load(spark, sfDir.getAbsolutePath, "documents")
    assert(viaDir.count() == 4000)
    val dirFiles = viaDir.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(dirFiles.forall(_.contains(dir.getName)) &&
      dirFiles.forall(!_.contains("graft-ingest-")),
      "a directory source must be served as-is")
    // sub-floor single file — the tiny-dimension-table branch
    val sfDir2 = java.nio.file.Files.createTempDirectory("graft-tablesspec-sf-").toFile
    val small = writeFixtureFile(sfDir2, rows = 5, salt = "tiny")
    assert(small.length() < 256L * 1024)
    val viaSmall = Tables.load(spark, sfDir2.getAbsolutePath, "documents")
    assert(viaSmall.count() == 5)
    assert(viaSmall.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).forall(!_.contains("graft-ingest-")),
      "a sub-floor file must be served as-is")
  }
}
