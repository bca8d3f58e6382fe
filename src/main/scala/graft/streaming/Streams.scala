package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface — the engine's analog of the reference's
  * Kafka pipeline (SURVEY.md §2.A A9: producer → feature extractor →
  * indexer). The reference moved vectors through Kafka topics with
  * at-least-once semantics and no event-time handling; here the same flows
  * are Structured Streaming queries with watermarks and event-time windows,
  * so late data and state are handled by the engine rather than the app.
  *
  * The batch gate queries in [[graft.operators.Events]] apply these exact
  * transformations to the static table — Structured Streaming's unified
  * Dataset API means the `groupBy(window(...))` code is shared, which
  * [[graft.StreamingSpec]] demonstrates by replaying the events fixture
  * through a file stream and comparing against the batch result.
  *
  * Scale notes: a production deployment swaps the file source for
  * `readStream.format("kafka")` and the memory sink for a parquet/Delta
  * sink with checkpointing; watermark state is per-key and bounded, so the
  * plan scales with key cardinality, not history.
  */
object Streams {

  /** Fallback schema of the events fixture as the current driver round
    * generates it (`timestamp[us]` without UTC adjustment → TIMESTAMP_NTZ).
    * [[readEvents]] prefers probing the directory's real footer schema so a
    * fixture-type change (e.g. back to ns-as-Long) can't silently misread;
    * this constant only covers the empty-directory bootstrap case.
    */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema of the embeddings fixture — one definition for every vector
    * sink (a sink reading a stale inline copy after a fixture schema change
    * would silently read nulls for the missing field).
    */
  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = true)),
    StructField("label", IntegerType)))

  /** Schema of the documents fixture — same one-definition rule as
    * [[vectorSchema]] for every document-stream sink.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def readVectors(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(vectorSchema).parquet(dir)

  /** File-based streaming read of an events directory (one file = one
    * micro-batch replay unit), ts normalized exactly like the batch reader
    * ([[graft.Tables.normalizeTs]] — handles ns-as-Long and TIMESTAMP_NTZ
    * fixture generations alike). Streaming sources require a declared
    * schema, so probe the directory's actual parquet footers first; an
    * empty bootstrap directory falls back to [[rawEventSchema]].
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // Narrow catch: only the empty-directory "unable to infer schema"
    // AnalysisException falls back to the guessed schema — a corrupt
    // footer or FS error must surface at definition time, not turn into a
    // silently wrong declared schema.
    val schema =
      try spark.read.parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.toLowerCase.contains("infer") ||
              e.getMessage.toLowerCase.contains("empty") =>
          rawEventSchema
      }
    graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(dir))
  }

  /** Watermarked tumbling hourly counts per event type — the streaming twin
    * of Events.tumbling.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"))

  /** Streaming dedup on (user_id, event_type) bounded by the watermark —
    * the streaming twin of Events.dedupFirstEvent's semantics.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Streaming vector ingest — the reference's Kafka → hash → index flow
    * (SURVEY §2.A A3/A9) as a Structured Streaming query: vectors arrive on
    * a stream, are hashed against the broadcast-style model (a plan
    * reference), and land with precomputed hashes ready for the collision
    * join. Swap source to Kafka and sink to partitioned parquet in
    * production; hashing remains a narrow executor-parallel map either way.
    */
  def hashedVectors(
      spark: SparkSession,
      dir: String,
      model: graft.operators.Lsh.LshModel): DataFrame = {
    val stream = readVectors(spark, dir)
    stream.withColumn("hashes",
      org.apache.spark.sql.graft.VectorExpressions.lshHash(col("embedding"), model))
  }

  /** Streaming index ingest END-TO-END (A3/A9 closed loop): vectors arrive
    * on a stream, get hashed, exploded to postings, and land in the SAME
    * pkey-partitioned layout [[graft.operators.Index.build]] writes — so a
    * [[graft.operators.Knn.searchIndex]] probe prunes streamed postings
    * exactly like batch-built ones. Durable file sink + checkpoint: exactly-
    * once per micro-batch, resumable. StreamingSpec proves the streamed
    * layout is row-identical to the batch build.
    */
  def postingsSink(
      spark: SparkSession,
      srcDir: String,
      model: graft.operators.Lsh.LshModel,
      numBuckets: Int,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    graft.operators.Lifecycle.assertNotAdopted(spark, outDir)
    // The dir is about to grow a _spark_metadata sink log: drop any
    // epoch-memoized "not sink-live" probe result so batch readers switch
    // to the log-aware read path immediately (Readers memoizes the probe
    // per epoch; an EXTERNALLY started sink has the same bump contract).
    graft.Readers.bump()
    // batch = 0 matches Index.build's stamp: the streamed layout is the
    // INITIAL build expressed as a stream; incremental streamed ingest into
    // a live index would thread Index.allocateBatch through here instead.
    val posts = graft.operators.Index.withPKey(
      graft.operators.Lsh.explodeHashes(hashedVectors(spark, srcDir, model))
        .select(col("vec_id"), lit(0L).as(graft.operators.Index.BatchCol),
          col("tbl"), col("hash")),
      numBuckets)
    posts.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(graft.operators.Index.PKeyCol)
      .outputMode("append")
      .start()
  }

  /** Streaming IVF ingest — the [[postingsSink]] twin for the cell-
    * partitioned layout: vectors arrive on a stream, are assigned to their
    * coarse cell with the STORED quantizer (the same narrow codegen map the
    * batch build uses — the centroid set rides the plan as a reference
    * object, so assignment is executor-parallel with no join and no
    * shuffle), and land in the SAME cell-partitioned layout
    * [[graft.operators.Vectors.buildIvfIndexWith]] writes. Searches prune
    * streamed cells exactly like batch-built ones. StreamingSpec proves the
    * streamed layout is row-identical to the batch build.
    */
  def cellsSink(
      spark: SparkSession,
      srcDir: String,
      cents: graft.operators.CentroidSet,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    graft.operators.Lifecycle.assertNotAdopted(spark, outDir)
    // The dir is about to grow a _spark_metadata sink log: drop any
    // epoch-memoized "not sink-live" probe result so batch readers switch
    // to the log-aware read path immediately (Readers memoizes the probe
    // per epoch; an EXTERNALLY started sink has the same bump contract).
    graft.Readers.bump()
    graft.operators.Vectors.assignCellsWith(readVectors(spark, srcDir), cents)
      .withColumn(graft.operators.Lifecycle.BatchCol, lit(0L))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("cell")
      .outputMode("append")
      .start()
  }

  /** Streaming quantized-code ingest — the [[postingsSink]]/[[cellsSink]]
    * twin for the flat code-table layouts (PQ q71 / SQ8 q91): vectors
    * arrive on a stream, are encoded with the STORED frozen codebooks/grid
    * (the same narrow codegen expression the batch build uses — the model
    * rides the plan as a reference object, executor-parallel, no shuffle),
    * and land in the SAME `codes/` layout the batch builders write.
    * StreamingSpec proves the streamed code table is row-identical to the
    * batch build for both encoders.
    */
  def codesSink(
      spark: SparkSession,
      srcDir: String,
      encoder: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    graft.operators.Lifecycle.assertNotAdopted(spark, outDir)
    // The dir is about to grow a _spark_metadata sink log: drop any
    // epoch-memoized "not sink-live" probe result so batch readers switch
    // to the log-aware read path immediately (Readers memoizes the probe
    // per epoch; an EXTERNALLY started sink has the same bump contract).
    graft.Readers.bump()
    readVectors(spark, srcDir)
      .select(col("vec_id"), encoder(col("embedding")).as("codes"))
      .withColumn(graft.operators.Lifecycle.BatchCol, lit(0L))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** INCREMENTAL streamed ingest into a LIVE index — the production loop
    * that the batch-0 bootstrap sinks above feed: each arriving micro-batch
    * of vectors is applied through [[graft.operators.Index.append]], so it
    * allocates a fresh append generation, supersedes any re-ingested id, and
    * resurfaces deleted ids — a concurrent [[graft.operators.Knn.searchIndex]]
    * sees each micro-batch as soon as its append lands. This is the daily
    * re-ingest story run continuously.
    *
    * Consistency contract: the file source + checkpoint give at-least-once
    * micro-batch delivery, and append is UPSERT-CONVERGENT — a replayed
    * micro-batch re-appends the same ids under a later generation, which
    * supersedes the original rows, leaving the live view row-identical
    * (spec-pinned). Replays can therefore duplicate storage rows but never
    * search results; the storage debt is retired by the standard
    * [[graft.operators.Index.vacuum]]. No transactional sink needed.
    */
  def liveAppendSink(
      spark: SparkSession,
      srcDir: String,
      indexDir: String,
      checkpointDir: String): StreamingQuery = {
    readVectors(spark, srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Empty triggers allocate nothing: append generations stay dense
        // under idle polling.
        if (!batch.isEmpty) graft.operators.Index.append(spark, indexDir, batch)
      }
      .start()
  }

  /** Stream-stream INTERVAL JOIN (attribution): each purchase joins the
    * same user's clicks from the preceding hour. Works unchanged on static
    * frames (the unified Dataset API) — StreamingSpec replays the fixture
    * through two file streams and asserts row parity with the batch run.
    *
    * Scale notes: both sides are watermarked, so the join state store
    * retains only rows inside `watermark + interval` — bounded by arrival
    * rate, not history. The equality key (user_id) makes it a shuffled
    * equi-join with a range residual, the same plan family as the batch
    * range join gate (q06); without the time bound Spark rightly refuses to
    * run it (unbounded state).
    */
  def purchaseClickJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(
        col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    p.join(c,
        col("p_user_id") === col("user_id") &&
          col("click_ts") < col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(
        col("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        unix_micros(col("click_ts")).as("click_us"))
  }

  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via `flatMapGroupsWithState` (SURVEY §2.B session/
    * state row): running per-user totals that survive across micro-batches.
    * State is one small record per key — bounded by key cardinality.
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val byUser = events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
    val out = byUser.flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
        val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0.0))
        var n = prev.n_events
        var tot = prev.total_value
        rows.foreach { case (_, v) => n += 1; tot += v }
        val next = UserAgg(user, n, tot)
        state.update(next)
        Iterator(next)
    }
    out.toDF()
  }

  /** Streaming twin of [[graft.operators.Text.cleanCorpus]] — the corpus-
    * cleaning pipeline applied to documents AS THEY ARRIVE: the one-pass
    * RepStats quality counters are a stateless narrow projection (identical
    * codegen expression as batch), and exact dedup keys state by the same
    * 40-byte digest pair the batch canon aggregate shuffles — the document
    * text itself is never held in state.
    *
    * Canon contract: FIRST-ARRIVAL wins — the only choice a streaming dedup
    * can make, since a later-arriving smaller id cannot retract an
    * append-mode emit. The surviving DIGEST set therefore always equals the
    * batch run's; the surviving *ids* equal the batch min-id canon only when
    * arrival is id-ordered (StreamingSpec's single-file replay — where it
    * proves full survivor equality). On a multi-partition source the
    * within-batch winner is shuffle-order-dependent, so downstream consumers
    * must key on content, not survivor id — the same contract as
    * `dropDuplicatesWithinWatermark`. Production bounds the dedup state with
    * `withWatermark` + that operator on ingest time, the [[dedupedEvents]]
    * pattern.
    */
  def cleanStream(
      spark: SparkSession,
      dir: String,
      minTokens: Int = 15,
      maxDupBigramFrac: Double = 0.1,
      maxTopTokFrac: Double = 0.2,
      maxStopRatio: Double = 0.2): DataFrame = {
    spark.readStream.schema(docSchema).parquet(dir)
      .withColumn("rs", org.apache.spark.sql.graft.TextExpressions.repStats(
        split(col("text"), " "), graft.operators.Text.stopwords))
      .withColumn("n_tokens", col("rs.n_tokens"))
      .withColumn("n_bigrams", col("rs.n_tokens") - 1)
      .filter(
        col("n_tokens") >= minTokens &&
          (col("n_bigrams") - col("rs.n_distinct_bigrams")) / col("n_bigrams") <= maxDupBigramFrac &&
          col("rs.top_tok") / col("n_tokens") <= maxTopTokFrac &&
          col("rs.n_stop") / col("n_tokens") <= maxStopRatio)
      .withColumn("h64", xxhash64(col("text")))
      .withColumn("h256", sha2(col("text"), 256))
      .dropDuplicates("h64", "h256")
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** Streaming twin of [[graft.operators.Text.dedupIncrementStored]] — the
    * per-delivery incremental dedup loop a production ingest actually runs:
    * each micro-batch probes the persisted digest store
    * ([[graft.operators.Text.dedupBatchAgainstStore]], the same broadcast
    * semi/anti plan as q107), emits its surviving documents to `outDir`,
    * and then appends the survivors' digests to the store so LATER
    * micro-batches (and every future batch increment) dedup against them.
    *
    * Crash-safety ordering: survivors are emitted BEFORE their digests are
    * committed to the store. A crash between the two writes makes the
    * replayed micro-batch re-emit the same survivors (duplicate OUTPUT
    * rows, deduped downstream by content — the at-least-once contract every
    * sink here delivers); the reverse order would let a replay find its own
    * digests already in the store and silently drop the delivery — data
    * loss, not duplication. Store-side duplicate rows from replayed appends
    * are harmless ([[graft.operators.Text.appendToDigestStore]]).
    *
    * Canon contract: first-arrival wins across micro-batches (a later
    * delivery cannot retract an emitted survivor); within a micro-batch the
    * min-id canonical, exactly the batch semantics.
    */
  def dedupIncrementSink(
      spark: SparkSession,
      srcDir: String,
      storeDir: String,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // one probe, two consumers (emit + digest append): pin it so the
          // store scan and the batch hash run once per micro-batch
          val survivors = graft.operators.Materialize.stable(
            graft.operators.Text.dedupBatchAgainstStore(spark, batch, storeDir),
            eager = true)
          try {
            batch.join(survivors.select(col("doc_id")), Seq("doc_id"))
              .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
            graft.operators.Text.appendToDigestStore(spark, storeDir, survivors)
          } finally graft.operators.Materialize.release(survivors)
        }
      }
      .start()
  }

  /** Streamed q113 — per-micro-batch decontamination of arriving train
    * deliveries against the persisted eval-gram store
    * ([[graft.operators.Text.decontaminateBatchAgainstStore]]): each batch
    * emits its contaminated docs' (doc_id, n_shared, n_eval_docs) rows to
    * `outDir` — the quarantine feed a pipeline joins against before
    * admitting a delivery.
    *
    * Delivery guarantee: the gram store is READ-ONLY to this sink (train
    * deliveries never modify the eval side), and per-doc counts are a
    * deterministic function of (batch content, store content) — so an
    * at-least-once replay can only re-emit IDENTICAL rows. Distinct-on-read
    * converges under any replay, the [[liveAppendSink]] guarantee with a
    * simpler proof: there is no store mutation to make convergent in the
    * first place. Storage debt from replayed rows is retired by rewriting
    * the output distinct (it is a plain parquet dir, not a store).
    */
  def decontaminateSink(
      spark: SparkSession,
      srcDir: String,
      storeDir: String,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Text
            .decontaminateBatchAgainstStore(spark, batch, storeDir)
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        }
      }
      .start()
  }

  /** Write the reference token-frequency table the [[driftSink]] monitors
    * against: (t, ref_n, ref_ppm) rows from ONE tokenize pass over the
    * reference corpus (the [[graft.operators.Curation.tokenDrift]]
    * pin-then-derive shape, via the SAME shared `tokenPpm` statistic).
    *
    * Refresh protocol: write the new snapshot's table to a NEW
    * (versioned) path and restart the sink pointing at it. Never
    * overwrite a live sink's reference in place — the overwrite deletes
    * part files out from under in-flight reads, and a post-crash WAL
    * replay would score the replayed delivery against DIFFERENT reference
    * content, breaking the replay-identity guarantee.
    */
  def buildRefFreqs(spark: SparkSession, docs: DataFrame, outDir: String): Unit = {
    val f = graft.operators.Materialize.stable(
      graft.operators.Curation.snapshotTokenCounts(docs, "ref"), eager = true)
    try graft.operators.Curation.tokenPpm(f, "ref")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(outDir)
    finally graft.operators.Materialize.release(f)
  }

  /** Streamed q127 — DISTRIBUTION-DRIFT MONITOR on the ingest path: each
    * arriving micro-batch's token distribution is compared against the
    * persisted reference corpus distribution ([[buildRefFreqs]]) and the
    * top-k drifted tokens are emitted as (token, batch_n, ref_n,
    * batch_ppm, ref_ppm, drift_ppm, batch_id) alarm rows — the "this
    * crawl drop doesn't look like our corpus" tripwire a curation loop
    * watches before admitting a delivery
    * (a spam wave, an encoding regression, or a language shift all surface
    * here before any quality gate fires doc-by-doc).
    *
    * Delivery guarantee: the reference table is READ-ONLY to this sink
    * (loaded ONCE at start — see [[buildRefFreqs]]'s versioned-refresh
    * protocol) and the drift rows are a deterministic function of
    * (delivery content, reference content), so an at-least-once replay —
    * which re-runs the SAME micro-batch file set under the SAME batch id,
    * both pinned by the checkpoint's WAL — re-emits only identical rows;
    * distinct-on-read converges. Every row carries `batch_id` (the
    * foreachBatch epoch), so alarms are ATTRIBUTABLE to the delivery they
    * should block, and a later delivery that happens to repeat an earlier
    * drift signature still raises its own distinct rows. NOTE the
    * guarantee is per-DELIVERY, unlike [[decontaminateSink]]'s
    * per-document rows: drift is a batch-aggregate statistic, so starting
    * over with a FRESH checkpoint may re-batch the backlog differently
    * and score merged deliveries as one — that is a new monitoring run,
    * not a replay. Per-batch cost: one tokenize pass over the delivery
    * (batch-sized, pinned) + one vocabulary-table join.
    */
  def driftSink(
      spark: SparkSession,
      srcDir: String,
      refFreqDir: String,
      outDir: String,
      checkpointDir: String,
      topK: Int = 20): StreamingQuery = {
    // the read-only reference is resolved once and CACHED for the sink's
    // lifetime (vocabulary-sized by the Zipf-bound argument) — without the
    // cache every micro-batch would re-read the reference parquet for its
    // join; blocks live as long as the sink, the documented lifetime
    val ref = spark.read.parquet(refFreqDir).cache()
    require(Seq("t", "ref_n", "ref_ppm").forall(ref.columns.contains),
      s"reference table at $refFreqDir must have (t, ref_n, ref_ppm) columns " +
        s"(got ${ref.columns.mkString(", ")}) — rebuild it with buildRefFreqs")
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val bf = graft.operators.Materialize.stable(
            graft.operators.Curation.snapshotTokenCounts(batch, "batch"), eager = true)
          try {
            graft.operators.Curation
              .driftJoin(graft.operators.Curation.tokenPpm(bf, "batch"), ref,
                "batch", "ref", topK)
              .withColumn("batch_id", lit(epochId))
              .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
          } finally graft.operators.Materialize.release(bf)
        }
      }
      .start()
  }

  /** Streamed q131 — EMBEDDING NORM GUARD on the vector-ingest path: every
    * arriving micro-batch is norm-audited ([[graft.operators.Audit
    * .embeddingNormsOf]]) BEFORE an index sink would consume it, and the
    * per-label audit rows land with `batch_id` attribution — so an
    * unnormalized model drop is caught at the delivery boundary it arrived
    * in (and can be quarantined by delivery), not discovered later as
    * silently skewed cosines across the whole index. The operational
    * pairing for [[liveAppendSink]]: run the guard on the same source
    * directory and admit a delivery to the live index only when its audit
    * rows show `n_off_unit = 0`.
    *
    * Delivery guarantee (the [[driftSink]] argument): audit rows are a
    * deterministic pure function of delivery content, and an
    * at-least-once replay re-runs the same WAL-pinned file set under the
    * same batch id — replays re-emit identical rows; distinct-on-read
    * converges. Per-batch cost: one narrow codegen pass over the delivery
    * (norms reduce to integer ppm inside the scan) + a label-cardinality
    * aggregate — no state store, no corpus-sized anything.
    */
  def normGuardSink(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      checkpointDir: String,
      tolPpm: Long = 5000L): StreamingQuery =
    readVectors(spark, srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Audit.embeddingNormsOf(batch, tolPpm)
            .withColumn("batch_id", lit(epochId))
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        }
      }
      .start()

  /** Schema of the [[graft.operators.Media.mediaTable]] rows — the declared
    * schema every media-stream sink reads with (one definition, like
    * [[vectorSchema]]).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("payload", BinaryType)))

  /** Streamed q50 — MEDIA FEATURE-EXTRACTION on the ingest path: each
    * arriving micro-batch of media rows runs the decode→feature stage
    * ([[graft.operators.Media.extractFeatures]] — codec stubbed, plumbing
    * real) and lands feature rows with `batch_id` attribution. This is the
    * reference's A9 pipeline shape with media in place of ready-made
    * vectors: payload bytes arrive → features extract batch-parallel →
    * the feature vectors feed an index sink ([[liveAppendSink]] /
    * [[cellsSink]]) downstream. Per-delivery guarantee as [[driftSink]]:
    * extraction is a deterministic pure function of the delivery, so
    * WAL-pinned replays re-emit identical rows. Per-batch cost: one
    * narrow decode pass over the delivery's payloads — no state store,
    * nothing corpus-sized.
    */
  def mediaFeaturesSink(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(mediaSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Media.extractFeatures(spark, batch).toDF()
            .withColumn("batch_id", lit(epochId))
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        }
      }
      .start()

  /** Streamed q153 — PERCOLATE on the document-ingest path: every arriving
    * micro-batch is matched against the stored-query registry and the
    * per-query match counts land with `batch_id` attribution — the actual
    * deployment shape of a percolator (saved searches / alert rules firing
    * on NEW documents as they arrive, not on the resting corpus). The
    * registry is resolved once from the caller and broadcast per batch;
    * matching is [[graft.operators.Retrieval.percolateCounts]] — the ONE
    * implementation the batch gate uses, so streamed alerts and corpus
    * percolation can never drift.
    *
    * Delivery guarantee (the [[driftSink]] argument): counts are a
    * deterministic pure function of delivery content, and an at-least-once
    * replay re-runs the same WAL-pinned file set under the same batch id —
    * replays re-emit identical rows; distinct-on-read converges. Per-batch
    * cost: one delivery scan × |registry| narrow predicates + a
    * query-cardinality aggregate.
    */
  def percolateSink(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      checkpointDir: String,
      queries: Seq[(Int, Seq[String])] =
        graft.operators.Retrieval.DefaultPercolators): StreamingQuery = {
    val registry = graft.operators.Retrieval.percolatorTable(spark, queries)
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Retrieval.percolateCounts(batch, registry)
            .withColumn("batch_id", lit(epochId))
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        }
      }
      .start()
  }

  // --------------------------------------------------------------------
  // A9: the Kafka transport (SURVEY §2.A — producer → extractor → indexer).
  //
  // The `kafka` data source resolves at RUNTIME (format("kafka") is a
  // string lookup against spark-sql-kafka-0-10), so this wiring compiles
  // and ships without the connector jar; [[kafkaAvailable]] reports whether
  // the provider is on the classpath, and every entry point fails fast with
  // a clear message when it is not. This sandbox has no Kafka jar and no
  // network — the parse/transform stages below are therefore factored
  // TRANSPORT-FREE (tested on static frames in StreamingSpec); only the
  // `.format("kafka")` edges themselves are env-gated.
  // --------------------------------------------------------------------

  /** True when the Kafka connector is on the classpath. Probed on the
    * context classloader (falling back to ours): Spark resolves
    * `format("kafka")` through its mutable context/session classloader, so
    * a connector shipped via `--jars` is visible there but NOT to this
    * class's own defining loader — a bare `Class.forName` would refuse a
    * correctly configured deployment.
    */
  def kafkaAvailable: Boolean = {
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider", false, loader)
      true
    } catch { case _: ClassNotFoundException => false }
  }

  private def requireKafka(): Unit =
    require(kafkaAvailable,
      "spark-sql-kafka-0-10 is not on the classpath; add the connector jar " +
        "to use the Kafka transport (the file-source twins cover every " +
        "pipeline stage without it)")

  /** Decode a Kafka-shaped frame (binary `value` column) of JSON vector
    * records into the [[vectorSchema]] rows every sink consumes. Transport-
    * free: the exact stage a Kafka source feeds, testable on any static
    * frame with a `value` column. Records that fail to parse yield null
    * vec_id and are dropped (poison-pill tolerance — a malformed record
    * must not kill the ingest stream).
    */
  def parseVectorRecords(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value").cast("string"), vectorSchema).as("v"))
      .select(col("v.vec_id"), col("v.embedding"), col("v.label"))
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)

  /** Encode result rows to Kafka-shaped (key, value) JSON — the inverse
    * edge, shared by the result sink and its tests.
    */
  def encodeResultRecords(results: DataFrame, keyCol: String): DataFrame =
    results.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(results.columns.map(col): _*)).as("value"))

  /** A9 source: subscribe to a topic of JSON vector records. */
  def kafkaVectorSource(
      spark: SparkSession,
      brokers: String,
      topic: String,
      startingOffsets: String = "earliest"): DataFrame = {
    requireKafka()
    parseVectorRecords(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())
  }

  /** A9 closed loop over Kafka: vectors arrive on a topic and are applied
    * through [[graft.operators.Index.append]] per micro-batch — the Kafka
    * twin of [[liveAppendSink]], with the same delivered guarantee
    * (effective exactly-once search results over at-least-once replay via
    * generation supersede; see README).
    */
  def kafkaLiveAppendSink(
      spark: SparkSession,
      brokers: String,
      topic: String,
      indexDir: String,
      checkpointDir: String): StreamingQuery = {
    kafkaVectorSource(spark, brokers, topic)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) graft.operators.Index.append(spark, indexDir, batch)
      }
      .start()
  }

  /** A9 result sink: publish a streaming result frame to a topic as JSON
    * (at-least-once; consumers dedupe on the key, the standard Kafka sink
    * contract).
    */
  def kafkaResultSink(
      results: DataFrame,
      brokers: String,
      topic: String,
      checkpointDir: String,
      keyCol: String): StreamingQuery = {
    requireKafka()
    encodeResultRecords(results, keyCol)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the collected result table (test/dev harness; production uses a
    * durable sink + checkpoint).
    */
  def runToMemory(
      spark: SparkSession,
      df: DataFrame,
      name: String,
      outputMode: String = "complete"): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
