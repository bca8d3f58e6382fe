package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing — image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages (builder prompt; reference analog: the Keras MobileNet feature
  * extractor in the Kafka pipeline, SURVEY.md §2.A A9).
  *
  * No media codecs ship in this environment, so the DECODE STEP IS A STUB —
  * [[fakeDecode]] derives a deterministic byte stream from the payload in
  * place of a real `ImageIO`/ffmpeg call (clearly marked below). Everything
  * around it — the binary+metadata schema, the per-partition batch decode
  * shape (one model/codec init per partition, the Spark-side contract a real
  * decoder needs), partitioning, and the feature schema — is real and
  * gate-tested.
  *
  * Scale notes (100 TB): payloads stay opaque bytes end-to-end (no
  * row-by-row JVM object inflation); decode is a narrow `mapPartitions`
  * with per-partition initialization, the same execution shape as a GPU/
  * native-codec batch feature extractor; metadata-only queries never touch
  * payload bytes thanks to parquet column pruning.
  */
object Media {

  /** One media record: id + typed metadata + opaque payload. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      width: Int,
      height: Int,
      n_bytes: Long,
      payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      n_frames: Int,
      features: Array[Double])

  /** Build the media table from the documents fixture: text bytes stand in
    * for an encoded payload; metadata is derived deterministically. The
    * binary column is real (`encode(text) → BinaryType`), so schema,
    * pruning, and batch shape all behave exactly as with true media bytes.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val doc = Tables.documents(spark, sfDir)
    doc.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      (pmod(col("doc_id") * 37, lit(512)) + 64).cast("int").as("width"),
      (pmod(col("doc_id") * 53, lit(512)) + 64).cast("int").as("height"),
      length(col("text")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))
  }

  /** ======= STUB: deterministic stand-in for a real codec =======
    * A production build replaces this body with the actual decode
    * (ImageIO / javacv / a native batch API) behind the same signature:
    * bytes in → fixed-size feature vector out. The fake is a 16-bin byte
    * histogram, L1-normalized — deterministic, shape-correct, cheap.
    */
  private[graft] def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val n = math.max(1, payload.length).toDouble
    var b = 0
    while (b < 16) { bins(b) /= n; b += 1 }
    bins
  }

  /** Video frame sampling stub: every `stride`-th fixed-size chunk of the
    * payload is a "frame"; returns the number of sampled frames.
    */
  private[graft] def sampleFrames(payload: Array[Byte], frameSize: Int = 64, stride: Int = 4): Int = {
    val frames = math.max(1, payload.length / frameSize)
    (frames + stride - 1) / stride
  }

  /** Resize stub: a real build rescales the pixel buffer; the fake keeps a
    * deterministic uniform byte sample so the output honors the target byte
    * budget (the Spark-relevant property — payload bytes shrink BEFORE the
    * expensive decode, exactly where a production pipeline resizes).
    */
  private[graft] def fakeResize(payload: Array[Byte], maxBytes: Int): Array[Byte] =
    if (payload.length <= maxBytes) payload
    else {
      val out = new Array[Byte](maxBytes)
      var i = 0
      while (i < maxBytes) {
        // evenly spaced sample positions, deterministic integer arithmetic
        out(i) = payload((i.toLong * payload.length / maxBytes).toInt)
        i += 1
      }
      out
    }

  /** The resize stage as a narrow transformation over the media table:
    * payloads above `maxBytes` shrink, metadata records the new size. Runs
    * BEFORE [[extractFeatures]] in a production pipeline so the decoder
    * (the costly stage) reads bounded inputs.
    */
  def resized(spark: SparkSession, media: DataFrame, maxBytes: Int = 256): DataFrame = {
    val rz = udf((p: Array[Byte]) => fakeResize(p, maxBytes))
    media
      .withColumn("payload", rz(col("payload")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
  }

  /** Batch decode + feature extraction as `mapPartitions`: codec/model
    * initialization happens once per partition (the expensive part with a
    * real decoder), then rows stream through. This is the Scala analog of
    * the Python `mapInPandas` batch-UDF shape.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // >>> per-partition init of the (stubbed) decoder goes here <<<
      rows.map { r =>
        val feats = fakeDecode(r.payload)
        val frames = if (r.kind == "video") sampleFrames(r.payload) else 1
        MediaFeatures(r.media_id, r.kind, r.n_bytes, frames, feats)
      }
    }
  }

  /** q50 — multimodal feature extraction (no SQL oracle — the decode stub
    * is not SQL-expressible; pinned by MediaSpec determinism/schema tests).
    * Output: id, kind, frame count, first 4 feature bins rounded.
    */
  def mediaFeaturesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(spark, mediaTable(spark, sfDir))
    feats.toDF()
      .select(
        col("media_id"), col("kind"), col("n_frames"),
        Det.display(element_at(col("features"), 1), 4).as("f0"),
        Det.display(element_at(col("features"), 2), 4).as("f1"),
        Det.display(element_at(col("features"), 3), 4).as("f2"),
        Det.display(element_at(col("features"), 4), 4).as("f3"))
      .orderBy(col("media_id"))
  }

  /** q51 — metadata-only media aggregate (oracle-checked). On a
    * *materialized* media table the equivalent query never reads payload
    * bytes (parquet column pruning — MediaSpec asserts the pruned scan);
    * this gate variant derives the table from documents inline, so it
    * additionally checks the metadata derivation itself.
    */
  def mediaMetaQuery(spark: SparkSession, sfDir: String): DataFrame = {
    mediaTable(spark, sfDir)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_w"),
        max(col("height")).as("max_h"))
      .orderBy(col("kind"))
  }

  val mediaMetaOracle: String =
    """SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |       count(*) AS n_media,
      |       CAST(sum(length(text)) AS BIGINT) AS total_bytes,
      |       CAST(max((doc_id * 37) % 512 + 64) AS INTEGER) AS max_w,
      |       CAST(max((doc_id * 53) % 512 + 64) AS INTEGER) AS max_h
      |FROM documents
      |GROUP BY 1
      |ORDER BY kind""".stripMargin

  /** ======= STUB-composed: perceptual hash =======
    * Gradient hash (dHash) over the resize stub's 64-byte thumbnail: bit i
    * set iff sample i strictly exceeds its cyclic successor — the
    * published dHash a production build computes on the decoded 9×8 pixel
    * grid (swap [[fakeResize]] for the real thumbnail; this function is
    * then UNCHANGED). Pure integer arithmetic ⇒ deterministic everywhere;
    * short payloads sample with wraparound so the hash is always 64-bit.
    *
    * dHash, not aHash, deliberately: a global-mean threshold (aHash)
    * SATURATES on low-contrast inputs — whole bytes of the hash go
    * all-ones/all-zeros together, so the q161 banding's chunk buckets
    * collapse onto a few values (measured at sf0.1: 3.7 M candidate pairs
    * from 5 000 media, chunk 0xFF holding ~17% of every band). Adjacent-
    * sample gradients split ~50/50 per bit regardless of the input's
    * brightness level, so bucket sizes stay near the uniform n/256 and
    * banding work stays linear — the same reason the real-image literature
    * prefers dHash. Bit i compares sample(i) to sample((i+1) mod 64), both
    * read through the same `mod n` wraparound, so a short payload hashes
    * identically to its explicit 64-byte cyclic tiling (PropertySpec), a
    * constant payload hashes to 0 (no strict > anywhere), and no hash can
    * be all-ones (a cyclic chain of strict > is impossible).
    */
  private[graft] def dHash(payload: Array[Byte]): Long = {
    val thumb = fakeResize(payload, 64)
    val n = thumb.length
    var h = 0L
    var i = 0
    while (i < 64) {
      val a = thumb(i % n) & 0xff
      val b = thumb(((i + 1) & 63) % n) & 0xff
      if (a > b) h |= (1L << i)
      i += 1
    }
    h
  }

  /** q161 — PERCEPTUAL near-dup pairs over media payloads: the CONTENT-level
    * complement of q138's byte-exact digests (a re-encoded/resized copy
    * changes every byte but barely moves its perceptual hash). dHash per
    * payload, then the q38 SimHash machinery verbatim: 8×8-bit band keys
    * (pigeonhole: Hamming ≤ 7 ⇒ at least one band equal, so banding is
    * EXACT at the gate threshold, not approximate), candidate band-join,
    * popcount verify, distinct pairs. The operating point (7 bits over
    * the 64-bit hash ≈ 11% tolerance) is calibrated on the fixtures'
    * near-duplicate documents, whose thumbnails land at Hamming 1-7 while
    * the unrelated-pair floor sits at 8+ — narrower bands raise the
    * candidate volume (8-bit keys already admit 1/256 of random pairs per
    * band), which is the usual banding precision/cost dial.
    *
    * Scale shape (100 TB): payloads are read once in the hashing scan and
    * NEVER shuffle — only (media_id, 8-byte hash) rows reach the band
    * exchange. Degenerate bands (flat-color thumbnails) are the same skew
    * class as q38's and take the same remedy ([[graft.operators.Skew
    * .capBuckets]] on the band-keyed candidates) past the fixture scale.
    * Rows-only gate (the hash is decode-stub-dependent); MediaSpec pins
    * set-equality with a driver brute force, which the pigeonhole argument
    * makes exact.
    */
  def mediaPhashNearDups(
      spark: SparkSession,
      sfDir: String,
      maxHamming: Int = 7,
      bandBits: Int = 8): DataFrame = {
    val ah = udf((p: Array[Byte]) => dHash(p))
    phashPairsFromSig(
      mediaTable(spark, sfDir)
        .select(col("media_id"), ah(col("payload")).as("ph")),
      maxHamming, bandBits)
  }

  /** The banding + verify tail shared VERBATIM by the inline
    * ([[mediaPhashNearDups]]) and persisted-signature
    * ([[mediaPhashNearDupsIndexed]]) paths over a (media_id, ph) frame —
    * one body, so the two paths cannot drift (MediaSpec pins equality too).
    */
  private def phashPairsFromSig(
      sig: DataFrame, maxHamming: Int, bandBits: Int): DataFrame = {
    require(64 % bandBits == 0, "bandBits must divide 64")
    val nBands = 64 / bandBits
    require(maxHamming < nBands, "pigeonhole recall guarantee needs maxHamming < nBands")
    val mask = (1L << bandBits) - 1
    // Pin the banding exchange to the session's shuffle-partition count
    // (REPARTITION_BY_NUM — exempt from AQE coalescing; the Text
    // bandCandidatePairs lesson): the collision join's cost is pair-
    // generation CPU, quadratic in bucket occupancy, which byte-based
    // coalescing cannot see — measured at 10× fixture scale as ONE task
    // holding 51 s of verify CPU over a 794 KB exchange
    // (plans/r15/q161_stage_metrics_{before,after}.txt). The join needs
    // this hash partitioning anyway, so the pin adds no exchange.
    val nPart = sig.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bands = sig.select(
      col("media_id"), col("ph"),
      posexplode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> shiftrightunsigned(ph, b * $bandBits) & $mask)"
      )).as(Seq("band", "chunk")))
      .repartition(nPart, col("band"), col("chunk"))
    // Hamming verify BEFORE the distinct: bit_count is a per-row codegen op
    // while distinct is an exchange, so filtering first shrinks the
    // deduplicating shuffle from every band collision (~1/256 of random
    // pairs per band) to just the true near-dups. hamming is a pure
    // function of the pair row, so filter∘distinct ≡ distinct∘filter.
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.media_id") < col("y.media_id"))
      .select(
        col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        bit_count(col("x.ph").bitwiseXOR(col("y.ph"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Build-once PERSISTED perceptual-hash signature store: payloads are
    * hashed ONCE at ingest (the scaladoc contract above — "payloads are
    * read once in the hashing scan and NEVER shuffle" — taken to its
    * deployment conclusion: they are read once per CORPUS LIFETIME, not
    * once per mining run) and the 8-byte (media_id, ph) rows live on disk.
    * Same ensure* discipline as [[graft.operators.Text.ensureShinglePairs]]:
    * keyed by fixture mtime + hash params, deterministic rebuild.
    */
  def ensurePhashStore(spark: SparkSession, sfDir: String): String = {
    val srcSig = graft.Tables.fixtureSig(spark, s"$sfDir/documents.parquet")
    val key = graft.operators.Index.cacheKey(
      s"$sfDir:$srcSig:phash:dhash:v${graft.operators.Index.LayoutVersion}")
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft-phash-$key")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val ah = udf((p: Array[Byte]) => dHash(p))
      mediaTable(spark, sfDir)
        .select(col("media_id"), ah(col("payload")).as("ph"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(dir.getAbsolutePath)
    }
    dir.getAbsolutePath
  }

  /** q161 gate path — perceptual near-dup pairs over the PERSISTED
    * signature store ([[ensurePhashStore]]): the banding self-join reads
    * 16-byte signature rows from disk instead of re-deriving + re-hashing
    * every payload per run, then the identical tail ([[phashPairsFromSig]]).
    * Results identical to [[mediaPhashNearDups]] by construction (one
    * shared tail over the same deterministic hashes; MediaSpec pins it).
    */
  def mediaPhashNearDupsIndexed(
      spark: SparkSession,
      sfDir: String,
      maxHamming: Int = 7,
      bandBits: Int = 8): DataFrame =
    phashPairsFromSig(
      // No pre-spread of the store scan: the r12 repartition(media_id)
      // here was REPARTITION_BY_COL, which AQE byte-coalesced straight
      // back to one read task — the shared tail's REPARTITION_BY_NUM
      // banding exchange (phashPairsFromSig) is what actually carries the
      // join/verify parallelism, and a second exchange in front of it is
      // pure overhead.
      graft.Readers.parquet(spark, ensurePhashStore(spark, sfDir)),
      maxHamming, bandBits)

  /** q138 — MEDIA PAYLOAD DEDUP: exact duplicate detection over the BINARY
    * payload column, summarized per kind — the multimodal twin of q32/q135
    * (web image corpora duplicate heavily: re-hosted thumbnails, CDN
    * copies; every curation pipeline digest-dedups payloads before the
    * expensive decode). The digest (`sha2` over `BinaryType`) runs in the
    * scan projection, so only (kind, 32-byte digest) rows cross the
    * exchange — the payload bytes never shuffle, the same contract as the
    * text-dedup family (PlanSpec-locked). Perceptual (near-) dedup of
    * decoded content composes the q50 feature stub with the embedding
    * near-dup family instead; this gate pins the byte-exact tier.
    *
    * The oracle replays the same statistic by grouping the payload's
    * source text (UTF-8 encoding is injective, so text equality IS payload
    * equality on the derived table); the Spark side hashes the actual
    * binary column.
    */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("kind"), sha2(col("payload"), 256).as("h"))
      .groupBy(col("kind"), col("h"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("kind"))
      .agg(
        sum(col("cnt")).as("n_media"),
        count(lit(1)).as("n_unique"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("n_dup_media"))
      .orderBy(col("kind"))

  val mediaDedupOracle: String =
    """WITH m AS (
      |  SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |         text
      |  FROM documents),
      |g AS (SELECT kind, text, count(*) AS cnt FROM m GROUP BY kind, text)
      |SELECT kind, CAST(sum(cnt) AS BIGINT) AS n_media,
      |       count(*) AS n_unique,
      |       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
      |         AS n_dup_media
      |FROM g GROUP BY kind ORDER BY kind""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_media_features" -> (mediaFeaturesQuery _),
    "q51_media_meta" -> (mediaMetaQuery _),
    "q138_media_dedup" -> (mediaDedup _),
    // q161 probes the persisted signature store (ensurePhashStore) — the
    // deployment shape; the inline path stays spec-pinned result-identical.
    "q161_media_phash_neardups" ->
      ((s: SparkSession, d: String) => mediaPhashNearDupsIndexed(s, d)))

  val oracles: Map[String, String] = Map(
    "q51_media_meta" -> mediaMetaOracle,
    "q138_media_dedup" -> mediaDedupOracle)
}
