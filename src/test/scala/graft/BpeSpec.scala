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

  test("bpe training is deterministic across runs") {
    val a = Bpe.train(spark, Bpe.vocabulary(spark, sf0001), numMerges = 8)
    val b = Bpe.train(spark, Bpe.vocabulary(spark, sf0001), numMerges = 8)
    assert(a == b)
    assert(a.length == 8, "fixture vocabulary supports 8 merges")
  }
}
