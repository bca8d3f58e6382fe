package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver-generated star schema + vector /
  * document / event fixtures (FIXTURES.md).
  *
  * All reads are plain `spark.read.parquet` so Catalyst can push filters and
  * prune columns into the scan. At cluster scale the same API reads a
  * partitioned directory tree; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    Readers.fixtureParquet(spark, s"$sfDir/$table.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Fixture mtime through the Hadoop FileSystem — the cache-key clock for
    * every build-once artifact (ensure* layouts, model fits, memoized
    * counts). `java.io.File.lastModified` returns a constant 0 for any
    * non-local URI, which would pin a rewritten REMOTE corpus's stale
    * artifact forever (the Readers.fixtureParquet pitfall, now solved once
    * for the whole ensure* family). On a local path the value is identical
    * to the File stat, so local cache keys are unchanged. A missing or
    * unreachable path keys as 0 and the builder raises the real error.
    */
  def fixtureMtime(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getModificationTime
    catch { case _: java.io.IOException => 0L }
  }

  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memoized corpus row count, keyed by (path, mtime) like every artifact
    * cache: scale-derived parameters (LSH bits, k-means k) need N once per
    * fixture, not one count JOB per query invocation — on the timed bench
    * path the repeated count was pure overhead. Loaded via [[Memo.once]]
    * (the count is a Spark job; never run one under a map bin lock).
    */
  def embeddingsCount(spark: SparkSession, sfDir: String): Long = {
    val srcMtime = graft.Tables.fixtureMtime(spark, s"$sfDir/embeddings.parquet")
    Memo.once(countMemo, s"$sfDir:$srcMtime")(
      java.lang.Long.valueOf(embeddings(spark, sfDir).count())).longValue()
  }

  /** The events fixture's `ts` physical type has varied across driver
    * rounds: nanosecond-precision parquet (arrives as Long ns-since-epoch
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, which Spark's
    * scanner otherwise rejects) and plain `timestamp[us]` without UTC
    * adjustment (arrives as TIMESTAMP_NTZ). This normalizer gives
    * downstream event-time ops one stable TimestampType regardless of
    * which shape the scan produced. Sessions pin timeZone=UTC, so the
    * NTZ wall clock IS the epoch instant and the cast is lossless.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // NB: `ts div 1000` (integer division) — a double division here would
      // round: epoch-ns values exceed double's 53-bit mantissa by ~2 decimal
      // digits, which showed up as ±1µs drift vs the DuckDB oracle.
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(load(spark, sfDir, "events"))
}
