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
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  private val countMemo = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Memoized corpus row count, keyed by (path, mtime) like every artifact
    * cache: scale-derived parameters (LSH bits, k-means k) need N once per
    * fixture, not one count JOB per query invocation — on the timed bench
    * path the repeated count was pure overhead.
    */
  def embeddingsCount(spark: SparkSession, sfDir: String): Long = {
    val src = new java.io.File(s"$sfDir/embeddings.parquet")
    countMemo.computeIfAbsent(s"$sfDir:${src.lastModified}",
      _ => embeddings(spark, sfDir).count())
  }

  /** events.ts is nanosecond-precision in parquet, which Spark's scanner
    * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` so it
    * arrives as Long ns-since-epoch, and this reader converts to a proper
    * micros timestamp at the scan boundary (FIXTURES.md caveat). Downstream
    * event-time ops see a stable TimestampType.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // NB: `ts div 1000` (integer division) — a double division here would
    // round: epoch-ns values exceed double's 53-bit mantissa by ~2 decimal
    // digits, which showed up as ±1µs drift vs the DuckDB oracle.
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
