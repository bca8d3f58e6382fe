package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run named gate queries repeatedly and print per-run wall times,
  * to separate warm-path query cost from one-time setup (index builds, JVM
  * warmup) when chasing bench outliers.
  */
object QueryTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("q23_lsh_knn", "q28_lsh_multiprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      // 8, not cpus (r14): the bench session pins shuffle.partitions=8 and
      // this tool's whole purpose is A/B parity with the bench's timed loop
      // — at 32 the tool timed different post-shuffle task counts than any
      // number it was being compared against.
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // mirror the FULL canonical bench session (Bench.scala) — without
      // this flag the tool's numbers are not comparable to bench maps
      .config("spark.sql.constraintPropagation.enabled", "false")
    // Same experiment hook as Bench: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" layers
    // session confs for planner/runtime A/B runs (e.g. optimizer rule
    // exclusions) without editing the recorded methodology.
    val extraConf = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';').toSeq).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => (k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_EXTRA_CONF entry '$kv' is not k=v")
        }
      }
    val spark = extraConf
      .foldLeft(spark0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    // Builder.config entries are silently IGNORED when getOrCreate returns
    // a pre-existing session (tools run back-to-back in one JVM) — an A/B
    // run with a dropped conf must fail loudly, not time the wrong build
    // (r15, the r14 advisory).
    extraConf.foreach { case (k, v) =>
      val got = spark.conf.getOption(k)
      require(got.contains(v),
        s"SPARK_GRAFT_EXTRA_CONF $k=$v not applied (session has $got) — " +
          "getOrCreate returned an existing session; stop it first")
    }
    spark.sparkContext.setLogLevel("ERROR")
    // Mirror Bench: prepared-instance reuse is opt-in, and this tool's
    // whole purpose is A/B parity with the bench's timed loop.
    graft.Plans.enableInstanceReuse()
    try { graft.operators.Index.ensure(spark, sfDir) } catch { case _: Throwable => () }
    try { graft.operators.Vectors.ensureIvfIndex(spark, sfDir) } catch { case _: Throwable => () }
    // Optional: run each query once on a warm fixture first (mirrors the
    // bench's untimed codegen warm pass) to separate compile cost from
    // steady-state cost in the first timed rep.
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR")
    names.foreach { n =>
      warmDir.foreach { d =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, d).count() catch { case _: Throwable => () }
        println(f"WARM $n ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // mirror the bench's per-query cache drain so reps measure the
        // same cold-intermediate cost the bench reports
        graft.operators.Materialize.releaseAll()
        dt
      }
      println(f"TIMING $n reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
