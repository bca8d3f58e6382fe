package graft

import graft.operators.{Components, Text}

class ComponentsSpec extends SparkSpec {

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(v => v -> find(v)).toMap
  }

  test("connected components match a union-find over the same edges") {
    val edges = Text.jaccardPairs(spark, sf0001, 100, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty, "threshold 0.8 should yield edges on the fixture")
    val vertices = (0L until 100L).toSeq
    val want = unionFind(vertices, edges)
    val got = Components.dedupClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("property: random graphs match union-find (seeded, 6 shapes)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 10 + rng.nextInt(30)
      val nEdges = rng.nextInt(2 * n)
      val vertices = (0L until n.toLong).toSeq
      val edges = Seq.fill(nEdges) {
        val a = rng.nextInt(n).toLong
        val b = rng.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val want = unionFind(vertices, edges)
      val got = Components.connectedComponents(
          vertices.toDF("v"),
          edges.toDF("i", "j"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial: n=$n edges=${edges.size}")
    }
  }

  test("empty vertex set terminates with an empty result, not an NPE") {
    val out = Components.dedupClusters(spark, sf0001, maxDocId = 0)
    assert(out.collect().isEmpty)
  }

  test("transitivity: clusters merge through shared members; canonicals are minima") {
    val rows = Components.dedupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // cluster id is a member of its own cluster and is its minimum
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid)
      assert(members.count(_._3) == 1, s"exactly one canonical per cluster $cid")
    }
    // there is at least one non-trivial cluster (size > 2 means a transitive
    // merge happened beyond a single pair, or several pairs chained)
    assert(byCluster.values.exists(_.length > 2),
      "fixture should produce a chained cluster; threshold may be off")
  }
}
