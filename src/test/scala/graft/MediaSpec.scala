package graft

import graft.operators.Media

class MediaSpec extends SparkSpec {

  test("media table schema: binary payload + typed metadata") {
    val mt = Media.mediaTable(spark, sf0001)
    val fields = mt.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("payload") == "binary")
    assert(fields("kind") == "string")
    assert(fields("width") == "integer" && fields("height") == "integer")
    assert(mt.count() == 500)
  }

  test("feature extraction is deterministic and shape-correct") {
    val r1 = Media.mediaFeaturesQuery(spark, sf0001).collect()
    val r2 = Media.mediaFeaturesQuery(spark, sf0001).collect()
    assert(r1.toSeq == r2.toSeq)
    assert(r1.length == 500)
  }

  test("fake decode: L1-normalized 16-bin histogram") {
    val feats = Media.fakeDecode("hello world".getBytes("UTF-8"))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0) < 1e-9)
    assert(feats.forall(f => f >= 0.0 && f <= 1.0))
  }

  test("frame sampling: every 4th 64-byte chunk") {
    assert(Media.sampleFrames(new Array[Byte](64 * 8)) == 2)
    assert(Media.sampleFrames(new Array[Byte](10)) == 1)
  }

  test("resize: payloads honor the byte budget, short ones pass through, deterministic") {
    import org.apache.spark.sql.functions._
    // kernel properties
    val big = (0 until 1000).map(_.toByte).toArray
    val small = "tiny".getBytes("UTF-8")
    assert(Media.fakeResize(big, 256).length == 256)
    assert(Media.fakeResize(small, 256).toSeq == small.toSeq)
    assert(Media.fakeResize(big, 256).toSeq == Media.fakeResize(big, 256).toSeq)
    // pipeline stage: every payload bounded, metadata updated, decode still works
    val rz = Media.resized(spark, Media.mediaTable(spark, sf0001), maxBytes = 256)
    val rows = rz.select(col("media_id"), col("n_bytes"), length(col("payload"))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 256)
      assert(r.getLong(1) == r.getInt(2).toLong, "metadata must track the resized payload")
    }
    val feats = Media.extractFeatures(spark, rz).collect()
    assert(feats.length == rows.length)
  }

  test("metadata query on materialized media table prunes payload from scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    Media.mediaTable(spark, sf0001).write.mode("overwrite").parquet(dir)
    val agg = spark.read.parquet(dir)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_w"))
    val scanLine = agg.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("kind"), s"scan line: $scanLine")
    assert(!scanLine.contains("payload"), s"payload column not pruned: $scanLine")
  }

  test("phash near-dups: banding equals a driver brute force (pigeonhole exactness)") {
    import org.apache.spark.sql.functions._
    val maxHam = 7
    val got = Media.mediaPhashNearDups(spark, sf0001, maxHamming = maxHam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // driver brute force over all pairs on the same stub hashes
    val hashes = Media.mediaTable(spark, sf0001)
      .select(col("media_id"), col("payload")).collect()
      .map(r => (r.getLong(0), Media.dHash(r.getAs[Array[Byte]](1))))
    val expect = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHam
    } yield (ia, ib, d)).toSet
    assert(got == expect, s"banding missed or invented pairs: got ${got.size}, expect ${expect.size}")
    assert(expect.nonEmpty, "fixture near-duplicates must produce at least one perceptual pair")
    // identical payloads would collide at hamming 0; the fixtures plant
    // NEAR-duplicates (no byte-identical texts), so the found pairs sit in
    // (0, maxHam] — strictly closer than the unrelated-pair floor
    assert(got.forall(p => p._3 > 0 && p._3 <= maxHam))
  }

  test("phash near-dups: persisted-signature path equals the inline path") {
    // The q161 gate probes ensurePhashStore; the store rows are the same
    // deterministic dHash values the inline path computes, so the banding
    // tail must emit row-identical pairs.
    val inline = Media.mediaPhashNearDups(spark, sf0001).collect().map(_.toSeq).toSeq
    val indexed = Media.mediaPhashNearDupsIndexed(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(indexed == inline)
  }
}
