package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {

  test("tfidf: scores match a scala-side recomputation from raw token counts") {
    val terms = Retrieval.DefaultTerms
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.length.toDouble
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, toks) =>
      terms.map(t => (id, t) -> toks.count(_ == t).toLong)
    }.filter(_._2 > 0).toMap
    val df: Map[String, Int] = terms.map(t => t -> tf.keys.count(_._2 == t)).toMap
    val idf4: Map[String, Long] = df.collect { case (t, d) if d > 0 =>
      t -> math.floor(math.log(n / d) * 10000 + 0.5).toLong
    }.toMap
    // keep every doc that MATCHED a term (a zero score from an idf-0 term is
    // still a hit in both the query and the oracle)
    val matched = tf.keys.map(_._1).toSet
    val expected = docs.map { case (id, _) =>
      id -> terms.map(t => tf.getOrElse((id, t), 0L) * idf4.getOrElse(t, 0L)).sum
    }.filter { case (id, _) => matched(id) }
      .sortBy { case (id, s) => (-s, id) }
      .take(20).toSeq

    val got = Retrieval.tfidfTopDocs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("tfidf: rare term dominates — top doc contains 'dup'") {
    val top = Retrieval.tfidfTopDocs(spark, sf0001, k = 5).collect().map(_.getLong(0))
    val dupDocs = Tables.documents(spark, sf0001)
      .filter(col("text").contains("dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(top.forall(dupDocs), "every top-5 tfidf doc should contain the rare term")
  }

  test("mmr: lambda=1 reduces to pure relevance ranking of the pool") {
    import graft.operators.KnnExact
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = emb.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = emb.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val got = KnnExact.mmrRerank(spark, sf0001, lambdaPpm = 1000000L)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(got == expect)
  }

  test("mmr: planted duplicate of the top hit is evicted in favor of a diverse pick") {
    import spark.implicits._
    import graft.operators.KnnExact
    // query id 0 = e1; ids 10/11 identical near-duplicates of the top hit;
    // id 12 diverse but still relevant. Plain top-2 = (10, 11); MMR at
    // λ=0.3 must pick 10 then 12.
    val frame = Seq(
      (0L, Array(1f, 0f)),
      (10L, Array(0.999f, 0.0447f)),
      (11L, Array(0.999f, 0.0447f)),
      (12L, Array(0.5f, 0.866f)))
      .toDF("vec_id", "embedding")
    val got = KnnExact.mmrRerankOf(spark, frame, queryId = 0L,
        pool = 10, k = 2, lambdaPpm = 300000L)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(got == Seq(10L, 12L), got.toString)
    val pure = KnnExact.mmrRerankOf(spark, frame, queryId = 0L,
        pool = 10, k = 2, lambdaPpm = 1000000L)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(pure == Seq(10L, 11L), pure.toString)
  }

  test("mmr: selection is a subset of the relevance pool and deterministic") {
    import graft.operators.KnnExact
    val a = KnnExact.mmrRerank(spark, sf0001).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val b = KnnExact.mmrRerank(spark, sf0001).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(a == b, "repeated invocations must agree bitwise")
    assert(a.size == 10)
    val poolIds = KnnExact.mmrRerank(spark, sf0001, lambdaPpm = 1000000L, k = 50)
      .collect().map(_.getLong(1)).toSet
    assert(a.map(_._2).forall(poolIds), "every MMR pick must come from the pool")
    // rank 1 is always the pure-relevance argmax (empty selected set)
    assert(a.head._3 == a.map(_._3).max, "first pick must be the relevance max")
  }

  test("bm25: positive scores, one row per matching doc, ranking favors rare term") {
    val rows = Retrieval.bm25Scores(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 0))
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val byScore = rows.sortBy(-_.getDouble(1)).map(_.getLong(0))
    val dupDocs = Tables.documents(spark, sf0001)
      .filter(col("text").contains("dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(byScore.take(3).forall(dupDocs),
      "bm25 top hits should be the rare-term docs")
  }

  test("mlt: scores match a scala-side recomputation of ES's two-stage algorithm") {
    val exampleId = 7L
    val maxTerms = 12
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.length.toDouble
    val exToks = docs.find(_._1 == exampleId).get._2
    val exTf: Map[String, Long] =
      exToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df: Map[String, Long] = exTf.keys.map { t =>
      t -> docs.count(_._2.contains(t)).toLong
    }.toMap
    val idf4: Map[String, Long] = df.map { case (t, d) =>
      t -> math.floor(math.log(n / d) * 10000 + 0.5).toLong
    }
    val selected = exTf.keys.toSeq
      .sortBy(t => (-(exTf(t) * idf4(t)), t)).take(maxTerms)
    val expected = docs.filter(_._1 != exampleId).map { case (id, toks) =>
      id -> selected.map(t => toks.count(_ == t).toLong * idf4(t)).sum
    }.filter { case (id, _) =>
      selected.exists(t => docs.find(_._1 == id).get._2.contains(t))
    }.sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    val got = Retrieval.moreLikeThis(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("mlt: the example document never retrieves itself") {
    val ids = Retrieval.moreLikeThis(spark, sf0001, exampleId = 7L)
      .collect().map(_.getLong(0))
    assert(!ids.contains(7L))
    assert(ids.nonEmpty)
  }

  test("function score: fscore is exactly score × ln1p-factor for every row") {
    val base = Retrieval.tfidfTopDocs(spark, sf0001, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Retrieval.functionScore(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, fscore) = (r.getLong(0), r.getLong(1))
      val fvf4 = math.floor(math.log(1.0 + chars(id)) * 10000 + 0.5).toLong
      assert(fscore == base(id) * fvf4, s"doc $id")
    }
  }

  test("percolate: conjunction counts are monotone and zero-match queries stay visible") {
    val counts = Retrieval.percolate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1L, 2L, 3L, 4L, 5L),
      "every registered query gets a row")
    assert(counts(5L) == 0L, "the no-match query reports zero, not absence")
    assert(counts(4L) <= counts(3L),
      "adding a conjunct can only shrink the match set")
    assert(counts(1L) > 0 && counts(2L) > 0 && counts(3L) > 0)
  }

  test("significant terms: the query term maxes the lift and scores match a recompute") {
    val rows = Retrieval.significantTerms(spark, sf0001, term = "dup")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.head._1 == "dup",
      "the foreground-defining term must be its own most significant term")
    // driver recompute of the integer lift on the raw token stream
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1).split(" ").toSeq)
    val fgToks = docs.filter(_.contains("dup")).flatten
    val bgToks = docs.flatten
    val fTot = fgToks.length.toLong
    val bTot = bgToks.length.toLong
    rows.foreach { case (t, nFg, nBg, lift) =>
      assert(nFg == fgToks.count(_ == t).toLong, s"$t fg count")
      assert(nBg == bgToks.count(_ == t).toLong, s"$t bg count")
      assert(lift == nFg * bTot * 1000000L / (nBg * fTot), s"$t lift")
    }
    // lift ranking is non-increasing
    assert(rows.map(_._4).sliding(2).forall(p => p.head >= p.last))
  }

  test("vocab store: counts cross-foot with the raw corpus token stream") {
    val v = Retrieval.vocab(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val hits = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(v.map(_._1).toSet == hits.keySet, "vocabulary term set")
    v.foreach { case (t, nHits, nDocs) =>
      assert(nHits == hits(t), s"$t hits")
      assert(nDocs == docs.count(_._2.contains(t)).toLong, s"$t docs")
    }
  }

  test("indexed phrase search equals the containment-scan formulation") {
    val scan = Retrieval.phraseSearch(spark, sf0001).collect().map(_.toSeq).toSeq
    val indexed = Retrieval.phraseSearchIndexed(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(indexed == scan)
    assert(indexed.nonEmpty, "fixture phrase must match something")
    // a 3-term phrase intersects three posting lists; parity must hold for
    // longer chains too (and for a phrase with no matches)
    val p3 = "big join order"
    assert(Retrieval.phraseSearchIndexed(spark, sf0001, p3).collect().map(_.toSeq).toSeq
      == Retrieval.phraseSearch(spark, sf0001, p3).collect().map(_.toSeq).toSeq)
    assert(Retrieval.phraseSearchIndexed(spark, sf0001, "zebra unicorn").count() == 0L)
  }

  test("minimum_should_match: counts recompute and the knob interpolates AND..OR") {
    val terms = Seq("dup", "vector", "hash")
    val rows = Retrieval.minimumShouldMatch(spark, sf0001, terms, minMatch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSet))
    val expect = docs.map { case (id, toks) =>
      (id, terms.count(toks.contains).toLong)
    }.filter(_._2 >= 2).sortBy(_._1).toSeq
    assert(rows.toSeq == expect)
    // monotone: the match set shrinks as minMatch rises, OR ⊇ m=2 ⊇ AND
    val or1 = Retrieval.minimumShouldMatch(spark, sf0001, terms, 1).collect().map(_.getLong(0)).toSet
    val and3 = Retrieval.minimumShouldMatch(spark, sf0001, terms, 3).collect().map(_.getLong(0)).toSet
    val m2 = rows.map(_._1).toSet
    assert(and3.subsetOf(m2) && m2.subsetOf(or1))
  }

  test("span near: slop=0 reduces to the adjacent phrase; spans recompute") {
    val phraseDocs = Retrieval.phraseSearch(spark, sf0001, "join order")
      .collect().map(_.getLong(0)).toSet
    val slop0 = Retrieval.spanNear(spark, sf0001, "join", "order", slop = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(slop0.map(_._1).toSet == phraseDocs,
      "slop=0 must match exactly the adjacent-phrase documents")
    // widening the window only adds matches
    val slop3 = Retrieval.spanNear(spark, sf0001, "join", "order", slop = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(slop0.forall { case (id, n) => slop3(id) >= n })
    // driver recompute of the pair count at slop=3
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    docs.foreach { case (id, toks) =>
      val pairs = (for {
        (t1, p1) <- toks.zipWithIndex if t1 == "join"
        (t2, p2) <- toks.zipWithIndex if t2 == "order"
        if p2 - p1 >= 1 && p2 - p1 <= 4
      } yield 1).length.toLong
      assert(slop3.getOrElse(id, 0L) == pairs, s"doc $id")
    }
  }

  test("explain score: per-term contributions cross-foot to the q61 score") {
    val docId = 7L
    val rows = Retrieval.explainScore(spark, sf0001, docId).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, tf, _, idf4, contrib) =>
      assert(contrib == tf * idf4, "contribution must be the exact product")
    }
    val total = rows.map(_._5).sum
    val q61 = Retrieval.tfidfTopDocs(spark, sf0001, k = Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q61(docId) == total,
      s"explain rows must sum to the ranked score: $total vs ${q61(docId)}")
  }

  test("rescore: zero bonus reduces to the base ranking; bonus promotes span docs") {
    val base = Retrieval.tfidfTopDocs(spark, sf0001, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val zero = Retrieval.rescore(spark, sf0001, bonus = 0L, window = 20, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(zero == base, "bonus=0 must preserve the first-pass top-k")
    // with the default bonus, rescored = score + n_spans·bonus exactly
    val spans = Retrieval.spanNear(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Retrieval.rescore(spark, sf0001).collect().foreach { r =>
      val (id, s, rs) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(rs == s + spans.getOrElse(id, 0L) * 5000L, s"doc $id")
    }
  }

  test("collapse: exactly one row per source, each the source's score maximum") {
    val rows = Retrieval.collapseBySource(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == rows.length, "one row per source")
    val all = Retrieval.tfidfTopDocs(spark, sf0001, k = Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val src = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (s, id, score) =>
      assert(all(id) == score)
      val best = all.filter(kv => src(kv._1) == s).values.max
      assert(score == best, s"source $s: $score is not the max $best")
    }
  }

  test("dis_max: tie_breaker=0 is the pure max; =1000 recovers the sum") {
    val base = Retrieval.tfidfTopDocs(spark, sf0001, k = Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val asSum = Retrieval.disMax(spark, sf0001, tbPermille = 1000L, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asSum == base, "tie_breaker=1000 must equal the summed TF-IDF scores")
    // tb=0 is bounded above by the sum and below by sum/|terms|
    Retrieval.disMax(spark, sf0001, tbPermille = 0L, k = Int.MaxValue)
      .collect().foreach { r =>
        val (id, mx) = (r.getLong(0), r.getLong(1))
        assert(mx <= base(id) && mx * 3 >= base(id), s"doc $id")
      }
  }

  test("boosting: negative docs demoted by exactly the permille factor") {
    val base = Retrieval.tfidfTopDocs(spark, sf0001, k = Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val negDocs = Tables.documents(spark, sf0001)
      .filter(array_contains(split(col("text"), " "), "slow"))
      .collect().map(_.getLong(0)).toSet
    val rows = Retrieval.boostingQuery(spark, sf0001, k = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, s) =>
      val expect = if (negDocs(id)) base(id) * 500L / 1000L else base(id)
      assert(s == expect, s"doc $id")
    }
    assert(rows.exists(r => negDocs(r._1)) && rows.exists(r => !negDocs(r._1)),
      "fixture must exercise both branches")
  }

  test("suggest: every completion carries the prefix and counts are exact") {
    val rows = Retrieval.suggest(spark, sf0001, prefix = "s").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).startsWith("s")))
    val vocab = Tables.documents(spark, sf0001)
      .select(col("text")).collect().flatMap(_.getString(0).split(" "))
    val hits = vocab.count(_.startsWith("s")).toLong
    assert(rows.map(_.getLong(1)).sum == hits,
      "suggest hit counts must cross-foot with a raw token count")
  }
  test("rare terms: matches the corpus-explode formulation; planted rare term surfaces") {
    import org.apache.spark.sql.functions._
    val brute = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_hits"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") <= 300)
      .orderBy(col("n_docs").asc, col("t").asc)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Retrieval.rareTerms(spark, sf0001, maxDocs = 300)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == brute, s"got ${got.size} brute ${brute.size}")
    // the fixture's planted rare term is in the bucket; the frequent
    // vocabulary is not (the separation the threshold is calibrated to)
    assert(got.exists(_._1 == "dup"))
    assert(got.forall(_._3 <= 300))
    val vocabSize = Retrieval.vocab(spark, sf0001).count()
    assert(got.size < vocabSize, "rare bucket must be a strict subset")
  }

  test("adjacency matrix: buckets cross-foot with per-filter counts; intersections bounded") {
    import org.apache.spark.sql.functions._
    val got = Retrieval.adjacencyMatrix(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0) == "en",
        r.getLong(2) >= 300, r.getString(1).startsWith("src1")))
    def n(p: ((Boolean, Boolean, Boolean)) => Boolean) = docs.count(p).toLong
    val want = Map(
      "en" -> n(_._1), "long" -> n(_._2), "srcA" -> n(_._3),
      "en&long" -> n(d => d._1 && d._2), "en&srcA" -> n(d => d._1 && d._3),
      "long&srcA" -> n(d => d._2 && d._3)).filter(_._2 > 0)
    assert(got == want, s"got $got want $want")
    // keyed-bucket contract: every intersection <= both of its halves
    got.get("en&long").foreach(c => assert(c <= got("en") && c <= got("long")))
    got.get("long&srcA").foreach(c => assert(c <= got("long") && c <= got("srcA")))
  }

  test("multi terms: composite top-k ordered by count with key tie-break") {
    import org.apache.spark.sql.functions._
    val got = Retrieval.multiTerms(spark, sf0001, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val want = Tables.documents(spark, sf0001)
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case ((l, s), rs) => (l, s, rs.size.toLong, rs.map(_._2).sum) }
      .sortBy { case (l, s, c, _) => (-c, l, s) }
      .take(10)
    assert(got == want, s"got $got want $want")
  }

  test("wildcard pattern translation: * ? map to LIKE, metacharacters escape") {
    assert(Retrieval.wildcardToLike("s?a*") == "s_a%")
    assert(Retrieval.wildcardToLike("a%b_c*") == "a\\%b\\_c%")
    // Lucene escapes: \* is a literal asterisk (not a LIKE metachar, so it
    // needs no LIKE escape), \\ a literal backslash (which does), and a
    // trailing lone backslash is itself a literal
    assert(Retrieval.wildcardToLike("foo\\*") == "foo*")
    assert(Retrieval.wildcardToLike("a\\\\b?") == "a\\\\b_")
    assert(Retrieval.wildcardToLike("x\\") == "x\\\\")
  }

  test("wildcard search matches the corpus-explode formulation") {
    import org.apache.spark.sql.functions._
    val brute = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").like("s_a%"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), countDistinct(col("t")).as("n_terms"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Retrieval.wildcardSearch(spark, sf0001, "s?a*")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == brute,
      s"got ${got.size} rows, brute ${brute.size}")
  }
  test("composite agg: page-walking covers every bucket exactly once, in key order") {
    import org.apache.spark.sql.functions._
    val full = Tables.documents(spark, sf0001)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // walk pages of 7 from the floor cursor until exhausted
    var after = ("", "")
    var pages = Seq.empty[(String, String, Long)]
    var n = 0
    while (n < 100) {
      val page = Retrieval.compositeAgg(spark, sf0001, after._1, after._2, 7)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (page.isEmpty) n = 100
      else { pages ++= page; after = (page.last._1, page.last._2); n += 1 }
    }
    assert(pages == full, s"walked ${pages.size} buckets, full ${full.size}")
  }

  test("span first matches the corpus-explode formulation and respects the boundary") {
    import org.apache.spark.sql.functions._
    val brute = Tables.documents(spark, sf0001)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "t")))
      .filter(col("t") === "join" && col("p") < 8)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Retrieval.spanFirst(spark, sf0001, "join", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got == brute, s"got ${got.size} brute ${brute.size}")
    // a hit beyond the boundary must not qualify a doc that lacks an early one
    val all = Retrieval.spanFirst(spark, sf0001, "join", Int.MaxValue).collect().length
    assert(all >= got.length)
  }
  test("match phrase prefix matches the corpus adjacency formulation") {
    import org.apache.spark.sql.functions._
    val pe = Tables.documents(spark, sf0001)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    val brute = pe.as("a").join(pe.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.p") === col("a.p") + 1)
      .filter(col("a.t") === "join" && col("b.t").startsWith("or"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_hits"), countDistinct(col("b.t")).as("n_completions"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Retrieval.matchPhrasePrefix(spark, sf0001, "join", "or")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == brute, s"got ${got.size} brute ${brute.size}")
  }
}
