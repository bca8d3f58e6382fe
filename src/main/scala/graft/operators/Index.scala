package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Vector ingest / index build (SURVEY.md §2.A A3): the persisted "index" is
  * a derived parquet layout — vectors + precomputed per-table hashes —
  * partitioned by a capped bucket of the table-0 hash so candidate lookups
  * prune directories, the parquet analog of ES's inverted hash-term index
  * (SURVEY §4.2 partition-pruning row).
  *
  * The partition column is `h0 % numBuckets`, NOT the raw hash: with B bits
  * the raw hash has 2^B values and partitionBy would explode the directory
  * count at high B (SURVEY §4.2 caveat).
  *
  * Scale notes (100 TB): hashing is a narrow map (executor-parallel); the
  * single shuffle is the partitionBy exchange, which buys static partition
  * pruning for every by-id or by-bucket lookup afterwards. At cluster scale
  * the same layout would use `bucketBy` into a table catalog; plain
  * `partitionBy` keeps it filesystem-only here.
  */
object Index {

  val BucketCol = "h0_bucket"

  /** Hash + write the index. Returns the indexed DataFrame as written. */
  def build(
      spark: SparkSession,
      embeddings: DataFrame,
      model: Lsh.LshModel,
      outDir: String,
      numBuckets: Int = 64): DataFrame = {
    val hashed = Lsh.withHashes(spark, embeddings, model)
      .withColumn(BucketCol, pmod(element_at(col("hashes"), 1), lit(numBuckets.toLong)))
    hashed.write
      .mode(SaveMode.Overwrite)
      .partitionBy(BucketCol)
      .parquet(outDir)
    hashed
  }

  /** Read an index written by [[build]]. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Doc-GET-by-id over the index (SURVEY §2.B scan row): a plain filter the
    * parquet source serves via min/max row-group stats.
    */
  def lookup(index: DataFrame, id: Long): DataFrame =
    index.filter(col("vec_id") === id)
}
