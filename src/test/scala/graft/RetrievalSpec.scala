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
      t -> BigDecimal(math.log(n / d) * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
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
}
