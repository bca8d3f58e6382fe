package graft

import graft.operators.Text

class NearDedupSpec extends SparkSpec {

  test("compiled minhash kernels are bit-identical to the SQL formulation") {
    // The banding family's signature stage runs through the MinHashMinima /
    // MinHashSig codegen kernels; every producer (detector, band store,
    // increment probe) relies on their minima matching the exploded
    // `min(xxhash64(seed, t))` aggregate BIT FOR BIT — a drift would make
    // probes silently miss instead of failing a test. Checked for both unit
    // encodings and for the fused text kernel, on the full sf0.001 corpus.
    import org.apache.spark.sql.functions._
    val k = 12
    val doc = Tables.documents(spark, sf0001)
    def minimaVia(unitsCol: org.apache.spark.sql.Column) = {
      val du = doc.select(col("doc_id"), unitsCol.as("units"))
      val viaExpr = du.select(col("doc_id"),
          org.apache.spark.sql.graft.TextExpressions.minhashMinima(col("units"), k).as("mh"))
        .filter(col("mh").isNotNull)
        .select(col("doc_id"), posexplode(col("mh")).as(Seq("s", "m")))
      val tok = du.select(col("doc_id"), explode(col("units")).as("t"))
      val hashCols = (0 until k).map(s => xxhash64(lit(s), col("t")).as(s"h$s"))
      val viaAgg = tok.select(col("doc_id") +: hashCols: _*)
        .groupBy(col("doc_id"))
        .agg(min(col("h0")).as("m0"),
          (1 until k).map(s => min(col(s"h$s")).as(s"m$s")): _*)
        .select(col("doc_id"),
          posexplode(array((0 until k).map(s => col(s"m$s")): _*)).as(Seq("s", "m")))
      (viaExpr, viaAgg)
    }
    for (units <- Seq(
        graft.operators.Text.shingleSet(8, 3), // array<long> digests
        array_distinct(split(col("text"), " ")))) { // array<string> tokens
      val (e, a) = minimaVia(units)
      assert(e.except(a).count() + a.except(e).count() == 0)
    }
    // fused text kernel ≡ shingleSet → minhashMinima (minima AND sizes)
    val fused = doc.select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.minhashSig(col("text"), 8, 3, k).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig.mh").as("mh"), col("sig.sz").as("sz"))
    val viaArr = doc.select(col("doc_id"),
        graft.operators.Text.shingleSet(8, 3).as("units"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.minhashMinima(col("units"), k).as("mh"),
        size(col("units")).cast("long").as("sz"))
      .filter(col("mh").isNotNull)
    assert(fused.except(viaArr).count() + viaArr.except(fused).count() == 0)
  }

  test("minhash kernel null semantics: nulls skipped, no-unit arrays sign as null") {
    // The engine's unit producers never emit null elements, but the kernel
    // accepts external containsNull=true arrays: nulls must contribute
    // nothing (mixed array ≡ its non-null subset), and an array with NO
    // contributing elements must sign as null exactly like the empty array
    // — never as the Long.MaxValue sentinel fill, which would band-collide
    // every all-null doc as a perfect near-duplicate.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val k = 6
    def sig(elems: Array[Any]) =
      Option(Text.minhashMinimaArrayData(new GenericArrayData(elems), k, stringUnits = true))
        .map(_.toLongArray().toSeq)
    val a: Any = UTF8String.fromString("alpha")
    val b: Any = UTF8String.fromString("beta")
    assert(sig(Array(a, null, b)) == sig(Array(a, b)), "null element changed the signature")
    assert(sig(Array(null, null)).isEmpty, "all-null array must sign as null")
    assert(sig(Array.empty[Any]).isEmpty, "empty array must sign as null")
    // same contract on the long-unit path
    def sigL(elems: Array[Any]) =
      Option(Text.minhashMinimaArrayData(new GenericArrayData(elems), k, stringUnits = false))
        .map(_.toLongArray().toSeq)
    assert(sigL(Array(7L, null, 9L)) == sigL(Array(7L, 9L)))
    assert(sigL(Array[Any](null)).isEmpty)
  }

  test("fused minhash kernel: non-ASCII char path matches the SQL formulation") {
    // The fixtures are pure ASCII, so only the byte fast path is exercised
    // by the gates; pin the multibyte char path (substringSQL positions ≠
    // byte offsets) against the SQL HOF formulation on constructed texts —
    // accents, CJK, emoji (surrogate pairs), mixed, shorter-than-shingle,
    // and empty.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 8
    val texts = Seq(
      "héllo wörld résumé café naïve",
      "日本語のテキストです データ処理",
      "emoji 😀😁 mixed ascii and 中文 text here",
      "shørt", "ab", "",
      "repeat ääääääää repeat ääääääää tail")
    val doc = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = doc.select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.minhashSig(col("text"), 8, 3, k).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig.mh").as("mh"), col("sig.sz").as("sz"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).sortBy(_._1)
    val tok = doc.select(col("doc_id"),
      explode(graft.operators.Text.shingleSet(8, 3)).as("t"))
    val hashCols = (0 until k).map(s => xxhash64(lit(s), col("t")).as(s"h$s"))
    val viaAgg = tok.select(col("doc_id") +: hashCols: _*)
      .groupBy(col("doc_id"))
      .agg(min(col("h0")).as("m0"),
        (1 until k).map(s => min(col(s"h$s")).as(s"m$s")) :+ count(lit(1)).as("sz"): _*)
      .collect()
      .map(r => (r.getLong(0), (0 until k).map(s => r.getLong(s + 1)), r.getLong(k + 1)))
      .sortBy(_._1)
    assert(fused.map(_._1).toSeq == viaAgg.map(_._1).toSeq, "doc coverage differs")
    fused.zip(viaAgg).foreach { case ((id, mh, sz), (_, am, asz)) =>
      assert(mh.toSeq == am.toSeq, s"doc $id minima drift")
      assert(sz == asz, s"doc $id size drift")
    }
  }

  test("near-dedup corpus: planted sequence dups collapse, everything else survives") {
    val all = Tables.documents(spark, sf0001).count()
    val pairs = Text.shingleNearDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should plant shingle-level near-dups")
    val kept = Text.nearDedupCorpus(spark, sf0001).collect()
      .map(_.getLong(0)).toSet

    // every pair collapsed: at most one member survives
    pairs.foreach { case (i, j) =>
      assert(!(kept(i) && kept(j)), s"pair ($i,$j) both survived")
    }
    // survivors are the union-find canonical (min id) of each cluster
    val parent = scala.collection.mutable.Map((0L until all).map(v => v -> v): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0L until all).filter(v => find(v) == v).toSet
    assert(kept == expected)
  }

  test("reliable-materialize mode returns identical results") {
    // spark.graft.reliableMaterialize=true swaps every pinned intermediate
    // (shingle unit table, CC rounds) from executor-local checkpoint to
    // recomputable DISK_ONLY persistence — same rows, different durability.
    val default = Text.nearDedupCorpus(spark, sf0001).collect().map(_.toSeq).toSeq
    spark.conf.set(graft.operators.Materialize.ConfKey, "true")
    try {
      val durable = Text.nearDedupCorpus(spark, sf0001).collect().map(_.toSeq).toSeq
      assert(durable == default)
    } finally spark.conf.unset(graft.operators.Materialize.ConfKey)
  }
}
