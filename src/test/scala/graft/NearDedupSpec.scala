package graft

import graft.operators.Text

class NearDedupSpec extends SparkSpec {

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
