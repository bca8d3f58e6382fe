package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  test("bpe learns the textbook merge order on a known toy vocabulary") {
    import spark.implicits._
    // Classic Sennrich-style example: "ab" is the most frequent adjacent
    // pair (weight 7+3), then the merged "ab" pairs with "c" (weight 7).
    val vocab = Seq(("abc", 7L), ("abd", 3L), ("xy", 2L))
      .toDF("word", "count")
    val merges = Bpe.train(spark, vocab, numMerges = 2)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) ==
      Seq(("a", "b", 10L), ("ab", "c", 7L)))
  }

  test("bpe ties break lexicographically; training stops when fully merged") {
    import spark.implicits._
    val vocab = Seq(("ba", 1L), ("ab", 1L)).toDF("word", "count")
    val merges = Bpe.train(spark, vocab, numMerges = 10)
    // (a,b) and (b,a) both score 1: (a,b) wins the tie. After both words
    // are single symbols no pair remains — early stop, not 10 ranks.
    assert(merges.head.left == "a" && merges.head.right == "b")
    assert(merges.length < 10)
  }

  test("segmentation with learned merges round-trips every corpus word") {
    val merges = Bpe.train(spark, Bpe.vocabulary(spark, sf0001), numMerges = 12)
    val words = Bpe.vocabulary(spark, sf0001).collect().map(_.getString(0))
    words.foreach { w =>
      val syms = Bpe.segment(w, merges)
      assert(syms.mkString == w, s"segmentation of '$w' lost content: $syms")
      assert(syms.forall(_.nonEmpty), s"empty symbol segmenting '$w'")
    }
  }

  test("tokenize-pack: bin totals equal the encoder's subword totals; width-independent") {
    import org.apache.spark.sql.functions.sum
    // packed columns: source, bin, n_docs, n_tokens, n_straddle
    val packed = Bpe.tokenizePack(spark, sf0001).collect()
    assert(packed.nonEmpty)
    val packTotal = packed.map(_.getLong(3)).sum
    val encTotal = Bpe.encodeCorpus(spark, sf0001)
      .agg(sum("n_subwords")).collect()(0).getLong(0)
    assert(packTotal == encTotal,
      s"packer lost tokens: packed=$packTotal encoded=$encTotal")
    // the shared two-level prefix sum must be bitwise blockWidth-independent
    // on model-token counts exactly as on whitespace counts (MiscSpec)
    val serial = Bpe.tokenizePackAt(spark, sf0001, Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    assert(packed.map(_.toSeq).toSeq == serial, "default width diverges from serial")
    assert(Bpe.tokenizePackAt(spark, sf0001, 64L).collect().map(_.toSeq).toSeq == serial,
      "blockWidth=64 diverges from serial definition")
  }

  test("tokenizer eval: source totals reconcile with the per-doc encode; fertility >= 1") {
    import org.apache.spark.sql.functions.sum
    val eval = Bpe.tokenizerEval(spark, sf0001).collect()
    assert(eval.nonEmpty)
    val Seq(words, subs) = Seq("n_words", "n_subwords").map(c =>
      eval.map(_.getAs[Long](c)).sum)
    val enc = Bpe.encodeCorpus(spark, sf0001)
      .agg(sum("n_words"), sum("n_subwords")).collect()(0)
    assert(words == enc.getLong(0) && subs == enc.getLong(1),
      "per-source totals must reconcile with the per-doc encode")
    eval.foreach { r =>
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L,
        s"a word segments into at least one subword: $r")
      assert(r.getAs[Long]("chars_per_subword_ppm") > 0L)
    }
  }

  test("encodeCorpus matches driver-side segmentation for every document") {
    import org.apache.spark.sql.functions.col
    val merges = Bpe.trainCached(spark, sf0001)
    val got = Bpe.encodeCorpus(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      // mirror Text.tokens = split(text, " ") exactly: -1 keeps trailing empties
      val words = text.split(" ", -1).toSeq
      val subs = words.map(w => Bpe.segment(w, merges).length.toLong).sum
      val (gw, gs, gppm) = got(id)
      assert(gw == words.length && gs == subs, s"doc $id: got ($gw,$gs) want (${words.length},$subs)")
      assert(gppm == subs * 1000000L / words.length, s"doc $id fertility mismatch")
      // merges must actually compress: strictly fewer subwords than chars
      assert(subs < words.map(_.length.toLong).sum, s"doc $id: no merge ever applied")
      assert(subs >= words.length, s"doc $id: fewer subwords than words")
    }
  }

  test("base segmentation is one symbol per code point, never per code unit") {
    // "😀" is U+1F600 — two UTF-16 code units, ONE symbol. A code-unit
    // splitter (String.split("") / word.map(_.toString)) would shear it
    // into two lone surrogates that can never re-merge into valid text.
    assert(Bpe.symbols("a😀b") == Seq("a", "😀", "b"))
    assert(Bpe.symbols("😀😀") == Seq("😀", "😀"))
    assert(Bpe.symbols("") == Seq.empty)
    // segment() with no merges is exactly the base segmentation
    assert(Bpe.segment("a😀b", Seq.empty).mkString == "a😀b")
  }

  test("driver and distributed trainers learn identical merge tables") {
    import spark.implicits._
    // train() takes the driver path at these sizes; trainGated(maxRows=0)
    // forces the distributed loop on the same input.
    val toy = Seq(("abc", 7L), ("abd", 3L), ("xy", 2L)).toDF("word", "count")
    assert(Bpe.train(spark, toy, 4) == Bpe.trainGated(spark, toy, 4, 0))
    val fixture = Bpe.vocabulary(spark, sf0001)
    assert(Bpe.train(spark, fixture, 12) == Bpe.trainGated(spark, fixture, 12, 0))
  }

  test("the byte gate routes a row-fitting vocabulary to the distributed path") {
    import spark.implicits._
    // r12 (advisor finding): the driver fit's working set is per-CODE-POINT
    // (one String per symbol plus the pair HashMap), so a vocabulary can
    // pass the row probe yet blow the heap. maxBytes=0 forces the byte
    // branch on a toy that easily fits the row gate — parity must hold.
    val toy = Seq(("abc", 7L), ("abd", 3L), ("xy", 2L)).toDF("word", "count")
    assert(Bpe.trainGated(spark, toy, 4, Bpe.DriverVocabMaxRows, maxBytes = 0L) ==
      Bpe.train(spark, toy, 4))
    // the estimate model: rows·96 + codePoints·160 (surrogate pairs count
    // as ONE code point — the symbol unit the trainer actually allocates)
    assert(Bpe.estimateFitBytes(Array(("abc", 1L), ("😀", 1L))) ==
      2L * 96 + 4L * 160)
    // the fixture vocabulary sits far under the real budget: the gate keeps
    // taking the driver path there (the bench ingest term depends on it)
    val rows = Bpe.vocabulary(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(Bpe.estimateFitBytes(rows) < Bpe.DriverFitMaxBytes / 100,
      s"fixture vocab estimate unexpectedly large: ${Bpe.estimateFitBytes(rows)}")
    // r13: the gate's in-plan estimate (Spark `length` = code points) must
    // agree with estimateFitBytes on supplementary-plane symbols — a
    // 4-byte UTF-8 emoji is ONE unit in both (surrogate-pair divergence
    // here would shift the decision boundary between the two probes)
    val planCp = Seq(("abc", 1L), ("😀", 1L)).toDF("word", "count")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length($"word").cast("long")))
      .collect()(0).getLong(0)
    assert(2L * 96 + planCp * 160 == Bpe.estimateFitBytes(Array(("abc", 1L), ("😀", 1L))))
  }

  test("trainer parity holds on randomized vocabularies with multi-byte tie-breaks") {
    import spark.implicits._
    // Alphabet chosen so UTF-8 byte order and UTF-16 code-unit order
    // DISAGREE: U+1F600 (surrogate pair, UTF-8 F0 9F 98 80) sorts after
    // U+FF01 (UTF-8 EF BC 81) in UTF-8 bytes but before it in UTF-16 —
    // a driver argmax tie-breaking via String.compareTo would diverge
    // from Spark's UTF8String order exactly here.
    val alphabet = Vector("a", "b", "！", "😀", "z")
    (1 to 3).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val vocab = Seq.fill(40) {
        val w = Seq.fill(2 + rng.nextInt(4))(alphabet(rng.nextInt(alphabet.size))).mkString
        (w, 1L + rng.nextInt(3))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq.toDF("word", "count")
      val driver = Bpe.train(spark, vocab, 6)
      val dist = Bpe.trainGated(spark, vocab, 6, 0)
      assert(driver == dist, s"seed=$seed: driver $driver != distributed $dist")
    }
  }

  test("bpe training is deterministic across runs") {
    val a = Bpe.train(spark, Bpe.vocabulary(spark, sf0001), numMerges = 8)
    val b = Bpe.train(spark, Bpe.vocabulary(spark, sf0001), numMerges = 8)
    assert(a == b)
    assert(a.length == 8, "fixture vocabulary supports 8 merges")
  }
}
