package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Index, Knn}

/** Ad-hoc timing harness for the persisted-index lifecycle: build vs warm
  * search vs multiprobe search, each phase timed separately. Findings that
  * shaped Index.build live in its scaladoc (per-directory commit cost on the
  * sandbox tmp fs ⇒ numBuckets default 64).
  */
object IndexTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val dir = time("ensure (cold or cached)") { Index.ensure(spark, sfDir) }
    time("kmeans fit (cold)") { graft.operators.Vectors.kmeansModel(spark, sfDir) }
    time("kmeans fit (memoized)") { graft.operators.Vectors.kmeansModel(spark, sfDir) }
    time("pq index ensure") { graft.operators.Pq.ensurePqIndex(spark, sfDir) }
    time("sq8 index ensure") { graft.operators.Pq.ensureSqIndex(spark, sfDir) }
    time("ivf-pq index ensure") { graft.operators.Pq.ensureIvfPqIndex(spark, sfDir) }
    time("bq index ensure") { graft.operators.Pq.ensureBqIndex(spark, sfDir) }
    time("vocab store ensure") { graft.operators.Retrieval.ensureVocabStore(spark, sfDir) }
    time("postings store ensure") { graft.operators.Retrieval.ensurePostingsStore(spark, sfDir) }
    time("search warm 1") { Knn.searchIndex(spark, dir, 8, 100, 10).count() }
    time("search warm 2") { Knn.searchIndex(spark, dir, 8, 100, 10).count() }
    time("multiprobe search") {
      Knn.searchIndex(spark, dir, 8, 100, 10, multiprobe = true).count()
    }
    spark.stop()
  }
}
