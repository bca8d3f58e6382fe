package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators that manage a training corpus ACROSS versions
  * and calibration passes — the iterate-on-the-dataset loop (curate →
  * train → measure → re-curate) that sits above the single-snapshot
  * cleaning pipeline in [[Text]]:
  *
  *   - [[snapshotDelta]]: added/removed/changed/unchanged between two
  *     corpus snapshots by content digest — the "what actually changed"
  *     audit before re-spending training compute on a new crawl drop.
  *   - [[lengthAnomalies]]: distributed least-squares fit of chars-on-
  *     tokens, then the largest |residual| documents — the cheap
  *     formatting-anomaly screen (minified code, base64 blobs, tables)
  *     whose chars-per-token ratio breaks from corpus prose.
  *
  * Both follow SURVEY §2's LLM-pipeline mandate (dedup/quality families)
  * and the repo determinism discipline: exact integer sums, IEEE-identical
  * double expressions on both engines, id tie-breaks.
  */
object Curation {

  // ---------------------------------------------------------------- q116

  /** q116 — LENGTH-ANOMALY DETECTION (quality screen). Fit the corpus-wide
    * ordinary-least-squares line `n_chars ≈ icept + slope · n_tokens` and
    * return the k documents with the largest |residual| — documents whose
    * character count is most unexplained by their token count (unusually
    * long "words": minified/binary/base64 payloads; unusually short:
    * single-char token streams).
    *
    * Scale shape (100 TB): pass 1 is ONE hash-aggregate producing five
    * integer sums (n, Σx, Σy, Σx², Σxy) — partial-aggregated map-side, a
    * 40-byte final row; the closed-form slope/intercept derive from it in a
    * 1-row projection that BROADCASTS into pass 2, a narrow per-doc
    * residual map feeding TakeOrderedAndProject top-k. No corpus-sized
    * shuffle anywhere; the only wide exchange is the 1-row broadcast.
    *
    * Determinism: the sums are exact BIGINTs (token and char counts are
    * integers — no scaling needed), so slope/intercept are doubles derived
    * from identical integer operands by the identical expression tree on
    * both engines, and the per-doc residual `y - (icept + slope·x)` is the
    * same IEEE sequence both sides. `+ 0.0` canonicalizes -0.0. At 100 TB
    * the BIGINT products `n·Σxy` overflow ~2^63 — swap the sums to
    * DECIMAL(38,0) there; the gate keeps BIGINT to match DuckDB's exact
    * HUGEINT-free plan.
    */
  def lengthAnomalies(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    lengthAnomaliesOf(Tables.documents(spark, sfDir), k)

  /** The OLS-residual core over ANY (doc_id, text, n_chars) frame — the
    * gate wrapper binds it to the fixture table; specs drive it with
    * synthetic frames (incl. the zero-variance corpus the nullif guards).
    */
  def lengthAnomaliesOf(documents: DataFrame, k: Int): DataFrame = {
    val docs = documents
      .select(
        col("doc_id"),
        col("n_chars").cast("long").as("y"),
        size(Text.tokens(col("text"))).cast("long").as("x"))
    val sums = docs.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val fit = sums
      .select(
        col("n"), col("sx"), col("sy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            lit(0.0))).as("slope"))
      .select(
        col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n").cast("double")).as("icept"))
    docs
      .crossJoin(broadcast(fit))
      .select(
        col("doc_id"),
        col("x").as("n_tokens"),
        (Det.display(col("y").cast("double") -
          (col("icept") + col("slope") * col("x").cast("double")), 4) + lit(0.0))
          .as("resid"))
      .orderBy(abs(col("resid")).desc, col("doc_id").asc)
      .limit(k)
  }

  def lengthAnomaliesOracle(k: Int = 20): String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS y,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS x
       |  FROM documents),
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
       |  FROM t),
       |f0 AS (
       |  SELECT n, sx, sy,
       |         CAST(n*sxy - sx*sy AS DOUBLE)
       |           / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0) AS slope
       |  FROM s),
       |f AS (
       |  SELECT slope,
       |         (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
       |           / CAST(n AS DOUBLE) AS icept
       |  FROM f0),
       |r AS (
       |  SELECT doc_id, x AS n_tokens,
       |         floor((CAST(y AS DOUBLE)
       |                - (icept + slope * CAST(x AS DOUBLE))) * 10000.0 + 0.5)
       |           / 10000.0 + 0.0 AS resid
       |  FROM t, f)
       |SELECT doc_id, n_tokens, resid
       |FROM r
       |ORDER BY abs(resid) DESC, doc_id ASC
       |LIMIT $k""".stripMargin

  // ---------------------------------------------------------------- q117

  /** Snapshot diff by content digest: classify every doc_id present in
    * either snapshot as added / removed / changed / unchanged. Texts hash
    * to 8-byte xxhash64 digests AT THE SCAN, so the full-outer join
    * shuffles only (doc_id, digest, n_chars) — the corpus text itself
    * never crosses an exchange (PlanSpec-locked), which is what makes the
    * diff affordable when each snapshot is tens of TB. Digest equality
    * stands in for text equality (collision odds 2^-64 per pair, same
    * contract as the q106/q107 incremental-dedup gates).
    */
  def snapshotDelta(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    // Presence comes from per-side markers, NOT digest nullness: a NULL
    // text hashes to NULL, and testing the digest would misclassify a
    // present-but-null-text doc as added/removed (the SQL oracle's
    // presence test is on the join side's doc_id). A null digest on
    // either side of the equality makes the comparison null -> the
    // `otherwise` branch fires -> "changed", matching SQL's
    // `o.text = n.text` three-valued fall-through to ELSE.
    val o = oldSnap.select(
      col("doc_id"), xxhash64(col("text")).as("old_digest"),
      col("n_chars").cast("long").as("old_chars"), lit(1).as("in_old"))
    val n = newSnap.select(
      col("doc_id"), xxhash64(col("text")).as("new_digest"),
      col("n_chars").cast("long").as("new_chars"), lit(1).as("in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(col("old_digest") === col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("new_chars"), col("old_chars")).as("chars"))
  }

  /** q117 — CORPUS SNAPSHOT DELTA (gate wrapper). The two snapshots derive
    * deterministically from the one fixture table so DuckDB can replay the
    * identical construction: the OLD snapshot lacks doc_id ≡ 3 (mod 13)
    * (those are "added" in the new drop) and carries reversed text for
    * doc_id ≡ 2 (mod 7) ("changed"); the NEW snapshot lacks doc_id ≡ 5
    * (mod 17) ("removed"). Output is the per-status audit row: doc count,
    * total chars, id range.
    */
  /** The deterministic two-snapshot derivation shared by q117 (doc-level
    * delta) and q127 (token-level drift) — ONE definition, so the
    * documented "q127 uses exactly q117's snapshots" complement relation
    * cannot silently diverge: the OLD snapshot lacks doc_id ≡ 3 (mod 13)
    * and reverses text for doc_id ≡ 2 (mod 7); the NEW lacks ≡ 5 (mod 17).
    */
  private def fixtureSnapshots(docs: DataFrame): (DataFrame, DataFrame) = {
    val oldSnap = docs
      .filter(col("doc_id") % 13 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 7 === 2, reverse(col("text"))).otherwise(col("text")))
    val newSnap = docs.filter(col("doc_id") % 17 =!= 5)
    (oldSnap, newSnap)
  }

  def corpusDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val (oldSnap, newSnap) = fixtureSnapshots(Tables.documents(spark, sfDir))
    snapshotDelta(oldSnap, newSnap)
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("chars")).cast("long").as("n_chars"),
        min(col("doc_id")).cast("long").as("first_doc"),
        max(col("doc_id")).cast("long").as("last_doc"))
      .orderBy(col("status"))
  }

  val corpusDeltaOracle: String =
    """WITH o AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 2 THEN reverse(text) ELSE text END AS text,
      |         CAST(n_chars AS BIGINT) AS n_chars
      |  FROM documents WHERE doc_id % 13 <> 3),
      |n AS (
      |  SELECT doc_id, text, CAST(n_chars AS BIGINT) AS n_chars
      |  FROM documents WHERE doc_id % 17 <> 5),
      |d AS (
      |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |         CASE WHEN o.doc_id IS NULL THEN 'added'
      |              WHEN n.doc_id IS NULL THEN 'removed'
      |              WHEN o.text = n.text THEN 'unchanged'
      |              ELSE 'changed' END AS status,
      |         coalesce(n.n_chars, o.n_chars) AS chars
      |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(chars) AS BIGINT) AS n_chars,
      |       CAST(min(doc_id) AS BIGINT) AS first_doc,
      |       CAST(max(doc_id) AS BIGINT) AS last_doc
      |FROM d GROUP BY status ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q121

  /** q121 — IMPORTANCE-WEIGHTED DATA SELECTION (DSIR-style). Given a TARGET
    * slice of the corpus (the distribution you want more of — here the
    * fixture's `lang = 'en'` docs stand in for "high-quality reference
    * text"), score every NON-target document by how much its vocabulary
    * resembles the target distribution relative to the raw-corpus
    * distribution, and keep the top `budget`. This is the deterministic
    * top-k analog of Data Selection via Importance Resampling (DSIR — Xie
    * et al. 2023, NeurIPS, public paper): DSIR samples with Gumbel noise
    * proportional to the importance weight p_target(x)/p_raw(x); a batch
    * curation gate wants the reproducible argmax instead, so we rank by the
    * weight and cut.
    *
    * Per-token score with add-one smoothing (a target-unseen token must not
    * zero a whole document): r(t) = (tc+1)(rtot+V) / ((rc+1)(ttot+V)),
    * scaled by 1e6 and rounded to an integer BEFORE the per-doc sum — the
    * q82/q89 discipline: the aggregate is an order-independent BIGINT sum,
    * the only double ops are one correctly-rounded multiply+divide over
    * exact BIGINT operands (identical on both engines), never a
    * transcendental. DSIR's log-importance sum ranks identically to any
    * monotone transform per token only in aggregate spirit; we define the
    * operator's contract as the MEAN RATIO score, which is what the oracle
    * pins.
    *
    * Scale shape (100 TB): the frequency table is Zipf-bounded (distinct
    * tokens, far below corpus size) and aggregates map-side; the score
    * table broadcasts into the corpus-side scoring join, so the corpus work
    * is two narrow token generates + one broadcast join + one per-doc
    * integer-sum aggregate — nothing wider than (doc_id, token) ever
    * shuffles, and the final cut is a TakeOrderedAndProject, never a global
    * sort. DSIR's hashed-n-gram buckets (fixed 2^k feature space) are the
    * escape valve if the vocabulary itself outgrows executor memory: swap
    * the join key for `pmod(xxhash64(t), buckets)` and every shape above is
    * unchanged — the gate keeps exact tokens so DuckDB can replay it.
    *
    * BIGINT overflow guard: (tc+1)·(rtot+V) ≤ (ttot+V)·(rtot+V); the gate
    * corpus keeps both ≲ 1e6 so the product is ≪ 2^63. At real scale the
    * counts are ≤ ~1e13 tokens — move the two products to DECIMAL(38,0)
    * there (same note as [[lengthAnomalies]]).
    */
  def importanceSelect(spark: SparkSession, sfDir: String, budget: Int = 50): DataFrame =
    importanceSelectOf(Tables.documents(spark, sfDir), col("lang") === "en", budget)

  /** The scoring core over ANY (doc_id, text) frame + target predicate —
    * the gate wrapper binds the fixture table and the lang target; specs
    * drive it with planted distribution shifts.
    */
  def importanceSelectOf(documents: DataFrame, isTarget: Column, budget: Int): DataFrame = {
    val tok = documents.select(
      col("doc_id"), isTarget.as("is_target"),
      explode(Text.tokens(col("text"))).as("t"))
    val freq = tok.groupBy(col("t")).agg(
      count(lit(1)).as("rc"),
      sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("tc"))
    val tot = freq.agg(
      sum(col("rc")).as("rtot"), sum(col("tc")).as("ttot"),
      count(lit(1)).as("v"))
    val scores = freq
      .crossJoin(broadcast(tot))
      .select(col("t"),
        Det.quant((col("tc") + 1) * (col("rtot") + col("v")) * lit(1e6) /
          ((col("rc") + 1) * (col("ttot") + col("v"))), 0).as("r"))
    tok.filter(!col("is_target"))
      .join(broadcast(scores), "t")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("imp_sum"))
      .select(col("doc_id"), col("n_tokens"), col("imp_sum"),
        // half-up integer display derivation — bm25Scores scaladoc rationale;
        // doubly load-bearing here: avg_imp is also the SELECTION sort key,
        // so a cross-engine boundary flip would change which docs make the
        // budget, not just a display digit.
        (floor(col("imp_sum") / (lit(100.0) * col("n_tokens")) + lit(0.5)) /
          lit(1e4)).as("avg_imp"))
      .orderBy(col("avg_imp").desc, col("doc_id").asc)
      .limit(budget)
  }

  def importanceSelectOracle(budget: Int = 50): String =
    s"""WITH tok AS (
       |  SELECT doc_id, (lang = 'en') AS is_target,
       |         unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |freq AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS rc,
       |         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tc
       |  FROM tok GROUP BY t),
       |tot AS (
       |  SELECT CAST(sum(rc) AS BIGINT) AS rtot, CAST(sum(tc) AS BIGINT) AS ttot,
       |         CAST(count(*) AS BIGINT) AS v
       |  FROM freq),
       |sc AS (
       |  SELECT t, CAST(floor((tc + 1) * (rtot + v) * 1000000.0
       |                        / ((rc + 1) * (ttot + v)) + 0.5) AS BIGINT) AS r
       |  FROM freq CROSS JOIN tot)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(r) AS BIGINT) AS imp_sum,
       |       floor(CAST(sum(r) AS BIGINT) / (100.0 * count(*)) + 0.5) / 10000.0 AS avg_imp
       |FROM tok JOIN sc USING (t)
       |WHERE NOT is_target
       |GROUP BY doc_id
       |ORDER BY avg_imp DESC, doc_id ASC
       |LIMIT $budget""".stripMargin

  // ---------------------------------------------------------------- q126

  /** q126 — CLUSTER KEYWORD LABELING (c-TF-IDF style, the BERTopic recipe in
    * public form): for each k-means cluster of the embedding space, the
    * tokens most DISTINCTIVE of that cluster's documents — per-cluster
    * relative frequency divided by corpus relative frequency (lift), top-n
    * per cluster. This is the "what is this cluster about" readout that
    * turns q84's anonymous cell ids into an inspectable corpus map; the
    * embeddings↔documents id join is the q88 fixture convention.
    *
    * Determinism: counts are exact BIGINTs and lift is ONE integer division
    * `cnt·ctot·1e6 div (clustTot·corpusCnt)` — no doubles anywhere; rank
    * ties break on token. Rows-only gate (cluster assignment is
    * model-dependent); pinned by CurationSpec's driver recompute against
    * the operator's own assignments.
    *
    * Scale shape (100 TB): corpus work is one narrow token generate into a
    * (cluster, token) aggregate — Zipf-bounded per cluster — plus a
    * broadcast join of the Zipf-bounded corpus frequency table; the top-n
    * rank windows run over the aggregated table only (WindowGroupLimit,
    * rank literal). Document text never crosses an exchange. The BIGINT
    * product `cnt·ctot·1e6` needs DECIMAL(38,0) once corpora pass ~10^9
    * tokens (the [[lengthAnomalies]] note).
    */
  /** The corpus-side (cluster, token) count aggregate of [[clusterKeywords]]
    * UN-pinned — exposed so PlanSpec can assert the text-never-shuffles
    * contract on the real subtree (the gate wrapper localCheckpoints it,
    * which truncates lineage and would blind a plan assertion on the outer
    * query). Tokens explode BEFORE the cluster join, so the join and every
    * exchange under it carry (doc_id, token) rows only.
    */
  /** Broadcast ceiling (rows) for the cluster-ASSIGNMENT table — a
    * corpus-derived frame (one row per embedded document), not a dimension:
    * at 100 TB the embedded subset is plausibly billions of rows, so an
    * unconditional broadcast is a driver/executor-OOM class. Two longs a
    * row ≈ 32 B hashed: the default ceiling is ~1.6 GB of broadcast
    * relation — heavy but comfortably inside a big executor; past it the
    * size gate swaps to the explode-first order below.
    */
  val AssignBroadcastMaxRows: Long = 50000000L

  private[graft] def clusterTokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    clusterTokenCountsOf(
      Tables.documents(spark, sfDir),
      Vectors.assignCellsWith(
        Tables.embeddings(spark, sfDir), Vectors.kmeansModel(spark, sfDir))
        .select(col("vec_id").as("doc_id"), col("cell").as("cluster")))

  /** The counts core over ANY (doc_id, text) × (doc_id, cluster) pair —
    * specs drive it with planted frames and a forced ceiling.
    *
    * Assignment join BEFORE the token explode: only the embedded subset of
    * the corpus is clustered (the assignment table is vector-store-sized,
    * the smaller store by construction), so joining first prunes every
    * unembedded document before its tokens are generated — measured 3× on
    * the counts stage at sf0.1, where 90% of documents have no vector.
    * The BROADCAST keeps text out of every exchange (PlanSpec-locked) and
    * is size-gated at [[AssignBroadcastMaxRows]] ([[Materialize.pinnedFits]]
    * — corpus-derived frames must prove they fit); past the ceiling the
    * order swaps to explode-first so only (doc_id, token) rows meet the
    * equi-join exchange — text still never shuffles, at 60×-row cost,
    * spec-pinned result-identical (inner equi-join commutes with the
    * child-side explode).
    */
  private[graft] def clusterTokenCountsOf(
      documents: DataFrame, assigned: DataFrame,
      broadcastMaxRows: Long = AssignBroadcastMaxRows): DataFrame = {
    val (pinned, fits) = Materialize.pinnedFits(assigned, broadcastMaxRows)
    val joined =
      if (fits)
        documents.join(broadcast(pinned), "doc_id")
          .select(col("cluster"), explode(Text.tokens(col("text"))).as("t"))
      else
        documents
          .select(col("doc_id"), explode(Text.tokens(col("text"))).as("t"))
          .join(pinned, "doc_id")
          .select(col("cluster"), col("t"))
    joined.groupBy(col("cluster"), col("t")).agg(count(lit(1)).as("cnt"))
  }

  def clusterKeywords(
      spark: SparkSession, sfDir: String, topN: Int = 5, minCount: Int = 3): DataFrame = {
    // ONE corpus pass: the (cluster, token) aggregate is pinned
    // (Zipf-bounded × clusters rows), and the corpus frequency table, the
    // corpus total, and the per-cluster totals all DERIVE from it — naively
    // reusing the token frame would re-run the corpus explode+join subtree
    // three times.
    val clustered = Materialize.stable(clusterTokenCounts(spark, sfDir))
    val corpus = clustered.groupBy(col("t")).agg(sum(col("cnt")).as("ccnt"))
      .crossJoin(broadcast(clustered.agg(sum(col("cnt")).as("ctot"))))
    clustered
      .withColumn("clust_tot",
        sum(col("cnt")).over(Window.partitionBy(col("cluster"))))
      .join(broadcast(corpus), "t")
      .filter(col("cnt") >= minCount)
      .withColumn("lift_ppm",
        expr("cnt * ctot * 1000000L div (clust_tot * ccnt)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("lift_ppm").desc, col("t").asc)))
      .filter(col("rn") <= topN)
      .select(col("cluster"), col("rn"), col("t").as("token"),
        col("cnt"), col("lift_ppm"))
      .orderBy(col("cluster"), col("rn"))
  }

  // ---------------------------------------------------------------- q127

  /** q127 — TOKEN-DISTRIBUTION DRIFT between two corpus snapshots: the
    * token-level complement of [[snapshotDelta]] (q117 says WHICH documents
    * changed; this says what the change DID to the language distribution —
    * the monitoring statistic a curate→train→re-curate loop alerts on
    * before re-spending training compute). Per token: counts and relative
    * frequencies (integer ppm) in each snapshot, ranked by absolute ppm
    * drift. The two snapshots derive from the fixture exactly as in q117
    * so DuckDB replays the identical construction.
    *
    * Determinism: relative frequencies are integer divisions
    * (`cnt·1e6 div tot`), drift is an exact BIGINT difference, ties break
    * on token. Scale shape: two corpus-sized token generates feeding
    * Zipf-bounded per-token aggregates; the full-outer drift join runs on
    * the vocabulary table, never the corpus; the cut is a
    * TakeOrderedAndProject. Text never shuffles.
    */
  /** One snapshot's per-token count aggregate UN-pinned — exposed for the
    * PlanSpec text-never-shuffles assertion (the gate pins it, truncating
    * lineage; see [[clusterTokenCounts]]).
    */
  private[graft] def snapshotTokenCounts(snap: DataFrame, pfx: String): DataFrame =
    snap.select(explode(Text.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as(s"${pfx}_n"))

  /** ppm-normalize a (t, <pfx>_n) count table, deriving the total from the
    * table itself (pass a PINNED frame, or the count subtree runs twice).
    * ONE definition of the statistic, shared by [[tokenDrift]] and the
    * streamed monitor ([[graft.streaming.Streams.driftSink]] /
    * `buildRefFreqs`) — a rounding or scaling change lands once or the
    * streamed monitor silently diverges from the oracle-checked q127.
    */
  private[graft] def tokenPpm(f: DataFrame, pfx: String): DataFrame =
    f.crossJoin(broadcast(f.agg(sum(col(s"${pfx}_n")).as(s"${pfx}_tot"))))
      .withColumn(s"${pfx}_ppm", expr(s"${pfx}_n * 1000000L div ${pfx}_tot"))
      .select(col("t"), col(s"${pfx}_n"), col(s"${pfx}_ppm"))

  /** The full-outer drift join over two [[tokenPpm]] tables: absent tokens
    * coalesce to 0, drift = |b − a| ppm, top-k movers with token
    * tie-breaks. Shared with the streamed monitor (same reason as
    * [[tokenPpm]]).
    */
  private[graft] def driftJoin(
      aF: DataFrame, bF: DataFrame, aPfx: String, bPfx: String, k: Int): DataFrame =
    aF.join(bF, Seq("t"), "full_outer")
      .select(col("t").as("token"),
        coalesce(col(s"${aPfx}_n"), lit(0L)).as(s"${aPfx}_n"),
        coalesce(col(s"${bPfx}_n"), lit(0L)).as(s"${bPfx}_n"),
        coalesce(col(s"${aPfx}_ppm"), lit(0L)).as(s"${aPfx}_ppm"),
        coalesce(col(s"${bPfx}_ppm"), lit(0L)).as(s"${bPfx}_ppm"))
      .withColumn("drift_ppm", abs(col(s"${bPfx}_ppm") - col(s"${aPfx}_ppm")))
      .orderBy(col("drift_ppm").desc, col("token").asc)
      .limit(k)

  def tokenDrift(spark: SparkSession, sfDir: String, k: Int = 30): DataFrame = {
    val (oldSnap, newSnap) = fixtureSnapshots(Tables.documents(spark, sfDir))
    // ONE tokenize pass per snapshot: the Zipf-bounded per-token aggregate
    // is pinned and the snapshot total DERIVES from it (a separate
    // corpus-level count subtree would re-scan and re-tokenize every
    // document a second time per snapshot).
    def freqs(snap: DataFrame, pfx: String): DataFrame =
      tokenPpm(Materialize.stable(snapshotTokenCounts(snap, pfx)), pfx)
    driftJoin(freqs(oldSnap, "old"), freqs(newSnap, "new"), "old", "new", k)
  }

  def tokenDriftOracle(k: Int = 30): String =
    s"""WITH o AS (
       |  SELECT CASE WHEN doc_id % 7 = 2 THEN reverse(text) ELSE text END AS text
       |  FROM documents WHERE doc_id % 13 <> 3),
       |n AS (SELECT text FROM documents WHERE doc_id % 17 <> 5),
       |ot AS (SELECT unnest(string_split(text, ' ')) AS t FROM o),
       |nt AS (SELECT unnest(string_split(text, ' ')) AS t FROM n),
       |oc AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS old_n FROM ot GROUP BY t),
       |nc AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS new_n FROM nt GROUP BY t),
       |osum AS (SELECT CAST(count(*) AS BIGINT) AS old_tot FROM ot),
       |nsum AS (SELECT CAST(count(*) AS BIGINT) AS new_tot FROM nt),
       |of2 AS (
       |  SELECT t, old_n, (old_n * 1000000) // old_tot AS old_ppm
       |  FROM oc CROSS JOIN osum),
       |nf2 AS (
       |  SELECT t, new_n, (new_n * 1000000) // new_tot AS new_ppm
       |  FROM nc CROSS JOIN nsum),
       |j AS (
       |  SELECT coalesce(of2.t, nf2.t) AS token,
       |         coalesce(old_n, 0) AS old_n, coalesce(new_n, 0) AS new_n,
       |         coalesce(old_ppm, 0) AS old_ppm, coalesce(new_ppm, 0) AS new_ppm
       |  FROM of2 FULL OUTER JOIN nf2 ON of2.t = nf2.t)
       |SELECT token, old_n, new_n, old_ppm, new_ppm,
       |       abs(new_ppm - old_ppm) AS drift_ppm
       |FROM j
       |ORDER BY drift_ppm DESC, token ASC
       |LIMIT $k""".stripMargin

  // ------------------------------------------------------------ registry

  // ---------------------------------------------------------------- q132

  /** q132 — PER-SOURCE QUALITY DECILES: bucket each source's documents into
    * `buckets` equal-depth quality tiers (quality = the integer-ppm
    * type-token ratio shared with q122's budget fill) and report each
    * tier's document count and quality bounds. This is the calibration
    * table BEHIND every percentile-style quality cut (the FineWeb/DCLM
    * recipe filters each dump at a quality percentile, not an absolute
    * threshold, because score distributions drift across sources and
    * crawls): before committing to "drop the bottom 30% of src5", a
    * curator reads this table to see what the bottom 30% of src5 IS.
    *
    * Determinism: quality is pure BIGINT arithmetic (`n_distinct·1e6 div
    * n_tokens`); `ntile` over the (q_ppm desc, doc_id asc) total order is
    * the SQL-standard equal-depth split (larger buckets first), identical
    * on both engines given the identical total order; counts/bounds are
    * exact integers.
    *
    * Scale shape: the quality score is a narrow per-doc map (no text
    * leaves the scan); the one corpus exchange is the hash partition by
    * source feeding per-source rank windows — all sources rank in
    * parallel, same shape as q99/q122 (a skewed single source serializes
    * its own shard only; salt by a doc_id range block and merge deciles if
    * one source dominates the corpus). Output is sources×buckets rows.
    */
  def qualityDeciles(
      spark: SparkSession,
      sfDir: String,
      buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val toks = Text.tokens(col("text"))
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        (size(array_distinct(toks)).cast("long") * 1000000L).as("qn"),
        size(toks).cast("long").as("qd"))
      .select(col("source"), col("doc_id"), expr("qn div qd").as("q_ppm"))
      .withColumn("decile", ntile(buckets).over(
        Window.partitionBy(col("source"))
          .orderBy(col("q_ppm").desc, col("doc_id").asc)).cast("long"))
      .groupBy(col("source"), col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("q_ppm")).as("min_q_ppm"),
        max(col("q_ppm")).as("max_q_ppm"))
      .orderBy(col("source"), col("decile"))
  }

  def qualityDecilesOracle(buckets: Int = 10): String =
    s"""WITH sc AS (
       |  SELECT source, doc_id,
       |         (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |            * 1000000)
       |           // CAST(len(string_split(text, ' ')) AS BIGINT) AS q_ppm
       |  FROM documents),
       |d AS (
       |  SELECT source, q_ppm,
       |         CAST(ntile($buckets) OVER (
       |           PARTITION BY source ORDER BY q_ppm DESC, doc_id)
       |           AS BIGINT) AS decile
       |  FROM sc)
       |SELECT source, decile, count(*) AS n_docs,
       |       min(q_ppm) AS min_q_ppm, max(q_ppm) AS max_q_ppm
       |FROM d GROUP BY source, decile ORDER BY source, decile""".stripMargin

  // ---------------------------------------------------------------- q136

  /** q136 — MULTI-SIGNAL QUALITY FUSION: combine several one-dimensional
    * quality signals into one per-source ranking by Borda count (sum of
    * per-signal ranks) and keep each source's top `n` — the ensemble
    * filtering practice of modern corpus recipes (no single heuristic
    * survives contact with a web crawl; DataComp/Dolma-class pipelines
    * gate on a PANEL of signals). Signals here: type-token ratio (the
    * shared q122/q132 diversity score), chars-per-token (formatting
    * richness, the q116 axis as a ratio), and token count (content mass) —
    * each already integer-ppm/exact.
    *
    * Rank fusion rather than score fusion ON PURPOSE: ranks are
    * scale-free (no cross-signal normalization constants to tune or
    * drift), integer (engine-exact), and robust to a signal's outliers.
    * Ties: every rank breaks on doc_id; the fused rank breaks on
    * (fused asc, doc_id asc) — total order, engine-independent.
    *
    * Scale shape: signals are a narrow per-doc map (text never leaves the
    * scan); ONE hash exchange by source feeds all four windows (three
    * signal ranks + the fused cut share the same partitioning, so
    * Catalyst plans them over a single Exchange); the final filter is a
    * per-source top-n. Same parallel-by-source argument as q99/q122/q132.
    */
  def qualityFusion(
      spark: SparkSession, sfDir: String, n: Int = 10): DataFrame = {
    val toks = Text.tokens(col("text"))
    val base = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        (size(array_distinct(toks)).cast("long") * 1000000L).as("dn"),
        size(toks).cast("long").as("nt"))
      .select(col("source"), col("doc_id"),
        expr("dn div nt").as("ttr_ppm"),
        expr("n_chars * 1000000L div nt").as("cpt_ppm"),
        col("nt").as("n_tokens"))
    def rk(c: String) = row_number().over(
      Window.partitionBy(col("source")).orderBy(col(c).desc, col("doc_id").asc))
    base
      .withColumn("r1", rk("ttr_ppm"))
      .withColumn("r2", rk("cpt_ppm"))
      .withColumn("r3", rk("n_tokens"))
      .withColumn("fused_rank", (col("r1") + col("r2") + col("r3")).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("fused_rank").asc, col("doc_id").asc)))
      .filter(col("rn") <= n)
      .select(col("source"), col("rn"), col("doc_id"), col("fused_rank"))
      .orderBy(col("source"), col("rn"))
  }

  def qualityFusionOracle(n: Int = 10): String =
    s"""WITH sc AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |           * 1000000 AS dn,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |  FROM documents),
       |s AS (
       |  SELECT source, doc_id, dn // nt AS ttr_ppm,
       |         (n_chars * 1000000) // nt AS cpt_ppm, nt AS n_tokens
       |  FROM sc),
       |r AS (
       |  SELECT source, doc_id,
       |         row_number() OVER (
       |           PARTITION BY source ORDER BY ttr_ppm DESC, doc_id) AS r1,
       |         row_number() OVER (
       |           PARTITION BY source ORDER BY cpt_ppm DESC, doc_id) AS r2,
       |         row_number() OVER (
       |           PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS r3
       |  FROM s),
       |f AS (
       |  SELECT source, doc_id, CAST(r1 + r2 + r3 AS BIGINT) AS fused_rank,
       |         CAST(row_number() OVER (
       |           PARTITION BY source ORDER BY r1 + r2 + r3, doc_id)
       |           AS INTEGER) AS rn
       |  FROM r)
       |SELECT source, rn, doc_id, fused_rank
       |FROM f WHERE rn <= $n ORDER BY source, rn""".stripMargin

  // ---------------------------------------------------------------- q149

  /** q149 — FILTER-FUNNEL ATTRIBUTION: run the cleaning rule chain in
    * priority order and report, per rule, how many documents it killed
    * FIRST plus the running survivor count — the rejection-accounting
    * report every production filtering pipeline publishes beside its
    * output (q83 removes documents; this says WHY each removal happened
    * and which rule dominates, the number a curator tunes thresholds
    * against). First-kill attribution on purpose: a doc failing three
    * rules charges the highest-priority one, so the stage counts sum to
    * exactly the kill total and the funnel is monotone.
    *
    * Determinism: rules are integer/set predicates over exact per-doc
    * stats; the stage table is a literal 5-row frame joined in so a rule
    * that kills nothing still reports 0 (a vanished row reads as "rule
    * not run"). Scale shape: ONE corpus scan computing stats + stage in
    * the projection, a 5-group aggregate, and windows over the 5-row
    * stage table. Nothing corpus-sized past the scan.
    */
  def filterFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Text.tokens(col("text"))
    val tagged = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars"),
        size(toks).cast("long").as("nt"),
        (size(array_distinct(toks)).cast("long") * 1000000L).as("dn"))
      .select(col("lang"), col("n_chars"), col("nt"),
        expr("dn div nt").as("ttr"))
      .select(
        when(col("nt") < 20L, 1)
          .when(col("n_chars") > 500L, 2)
          .when(col("ttr") < 350000L, 3)
          .when(!col("lang").isin("en", "de", "es", "zh"), 4)
          .otherwise(5).as("stage_no"))
    val counts = tagged.groupBy(col("stage_no"))
      .agg(count(lit(1)).as("n"))
    val stages = Seq(
      (1, "too_short"), (2, "too_long"), (3, "low_diversity"),
      (4, "lang_excluded"), (5, "survived")).toDF("stage_no", "stage")
    val total = tagged.agg(count(lit(1)).as("n_total"))
    val wCum = Window.orderBy(col("stage_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stages
      .join(counts, Seq("stage_no"), "left")
      .withColumn("n_docs", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("n_remaining",
        col("n_total") -
          sum(when(col("stage_no") <= 4, col("n_docs")).otherwise(0L))
            .over(wCum))
      .select(col("stage_no"), col("stage"), col("n_docs"), col("n_remaining"))
      .orderBy(col("stage_no"))
  }

  val filterFunnelOracle: String =
    """WITH base AS (
      |  SELECT lang, n_chars,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           * 1000000
      |           // CAST(len(string_split(text, ' ')) AS BIGINT) AS ttr
      |  FROM documents),
      |tagged AS (
      |  SELECT CASE WHEN nt < 20 THEN 1
      |              WHEN n_chars > 500 THEN 2
      |              WHEN ttr < 350000 THEN 3
      |              WHEN lang NOT IN ('en','de','es','zh') THEN 4
      |              ELSE 5 END AS stage_no
      |  FROM base),
      |counts AS (SELECT stage_no, count(*) AS n FROM tagged GROUP BY stage_no),
      |stages AS (
      |  SELECT * FROM (VALUES (1,'too_short'), (2,'too_long'),
      |    (3,'low_diversity'), (4,'lang_excluded'), (5,'survived'))
      |    AS t(stage_no, stage)),
      |f AS (
      |  SELECT s.stage_no, s.stage,
      |         CAST(COALESCE(n, 0) AS BIGINT) AS n_docs
      |  FROM stages s LEFT JOIN counts USING (stage_no))
      |SELECT stage_no, stage, n_docs,
      |       CAST((SELECT count(*) FROM documents)
      |         - sum(CASE WHEN stage_no <= 4 THEN n_docs ELSE 0 END)
      |             OVER (ORDER BY stage_no ROWS UNBOUNDED PRECEDING)
      |         AS BIGINT) AS n_remaining
      |FROM f ORDER BY stage_no""".stripMargin

  // ---------------------------------------------------------------- q201

  /** q201 — GOPHER QUALITY RULES (Rae et al. 2021, appendix A1.1): the
    * published per-document heuristic battery as named 0/1 flags plus the
    * conjunctive keep bit — word count in [50, 100k], mean word length in
    * [3, 10], ≥80% of words containing an alphabetic character,
    * symbol-to-word ratio (# and ...) below 0.1, and presence of the
    * listed English stop words. Every threshold is evaluated in INTEGER
    * arithmetic (3·n ≤ Σlen ≤ 10·n, 5·alpha ≥ 4·n, 10·sym < n) — no
    * ratio ever becomes a float, so the flags are bitwise identical on
    * any engine and any partitioning. Line-based rules (bullet/ellipsis
    * line starts) are omitted: the corpus contract is single-space
    * tokenized text with no newlines (the q178/q192 line model).
    *
    * `minStopHits = 1` is calibrated to the fixture vocabulary (only
    * "the" from Gopher's list occurs); the paper's default is 2 distinct
    * hits from {the, be, to, of, and, that, have, with}.
    *
    * Scale shape: ONE projection pass — every rule reads the scan's
    * token array; no shuffle at all before the presentation sort.
    */
  def gopherRules(
      spark: SparkSession, sfDir: String, minStopHits: Int = 1): DataFrame = {
    val toks = Text.tokens(col("text"))
    val stoplist = array(Seq("the", "be", "to", "of", "and", "that",
      "have", "with").map(lit): _*)
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("nt"),
        (length(col("text")) - (size(toks) - 1)).cast("long").as("sum_len"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
        size(array_intersect(array_distinct(toks), stoplist))
          .cast("long").as("n_stop_distinct"),
        ((length(col("text")) - length(translate(col("text"), "#", ""))) +
          (length(col("text")) -
            length(expr("replace(text, '...', '')"))) / 3)
          .cast("long").as("n_sym"))
      .select(
        col("doc_id"), col("nt").as("n_words"), col("n_stop_distinct"),
        (col("nt") >= 50L && col("nt") <= 100000L).cast("long").as("ok_words"),
        (col("sum_len") >= lit(3L) * col("nt") &&
          col("sum_len") <= lit(10L) * col("nt")).cast("long").as("ok_mean_len"),
        (lit(5L) * col("n_alpha") >= lit(4L) * col("nt")).cast("long").as("ok_alpha"),
        (col("n_stop_distinct") >= minStopHits.toLong).cast("long").as("ok_stop"),
        (lit(10L) * col("n_sym") < col("nt")).cast("long").as("ok_symbol"))
      .withColumn("keep",
        (col("ok_words") * col("ok_mean_len") * col("ok_alpha") *
          col("ok_stop") * col("ok_symbol")).cast("long"))
      .orderBy(col("doc_id"))
  }

  def gopherRulesOracle(minStopHits: Int = 1): String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
       |         CAST(length(text) - (len(string_split(text, ' ')) - 1)
       |           AS BIGINT) AS sum_len,
       |         CAST(len(list_filter(string_split(text, ' '),
       |           t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |         CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
       |           ['the','be','to','of','and','that','have','with']))
       |           AS BIGINT) AS n_stop_distinct,
       |         CAST((length(text) - length(replace(text, '#', '')))
       |           + (length(text) - length(replace(text, '...', ''))) // 3
       |           AS BIGINT) AS n_sym
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, nt AS n_words, n_stop_distinct,
       |         CAST(nt >= 50 AND nt <= 100000 AS BIGINT) AS ok_words,
       |         CAST(sum_len >= 3 * nt AND sum_len <= 10 * nt AS BIGINT)
       |           AS ok_mean_len,
       |         CAST(5 * n_alpha >= 4 * nt AS BIGINT) AS ok_alpha,
       |         CAST(n_stop_distinct >= $minStopHits AS BIGINT) AS ok_stop,
       |         CAST(10 * n_sym < nt AS BIGINT) AS ok_symbol
       |  FROM s)
       |SELECT *, CAST(ok_words * ok_mean_len * ok_alpha * ok_stop * ok_symbol
       |  AS BIGINT) AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q116_length_anomalies" -> ((s: SparkSession, d: String) => lengthAnomalies(s, d)),
    "q117_corpus_delta" -> ((s: SparkSession, d: String) => corpusDelta(s, d)),
    "q121_importance_select" -> ((s: SparkSession, d: String) => importanceSelect(s, d)),
    // rows-only: cluster assignment is k-means-model-dependent (like q84)
    "q126_cluster_keywords" -> ((s: SparkSession, d: String) => clusterKeywords(s, d)),
    "q127_token_drift" -> ((s: SparkSession, d: String) => tokenDrift(s, d)),
    "q132_quality_deciles" -> ((s: SparkSession, d: String) => qualityDeciles(s, d)),
    "q136_quality_fusion" -> ((s: SparkSession, d: String) => qualityFusion(s, d)),
    "q149_filter_funnel" -> (filterFunnel _),
    "q201_gopher_rules" -> ((s: SparkSession, d: String) => gopherRules(s, d)))

  val oracles: Map[String, String] = Map(
    "q201_gopher_rules" -> gopherRulesOracle(),
    "q116_length_anomalies" -> lengthAnomaliesOracle(),
    "q117_corpus_delta" -> corpusDeltaOracle,
    "q121_importance_select" -> importanceSelectOracle(),
    "q127_token_drift" -> tokenDriftOracle(),
    "q132_quality_deciles" -> qualityDecilesOracle(),
    "q136_quality_fusion" -> qualityFusionOracle(),
    "q149_filter_funnel" -> filterFunnelOracle)
}
